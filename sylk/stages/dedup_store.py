"""Incremental exact dedup across ingest increments: a persistent
hash-key store partitioned by key-hash prefix, so each new increment
anti-joins only against the matching store partitions and appends its
novel keys — "have I seen this content before?" across a growing corpus
WITHOUT recomputing past increments or holding a global key set
anywhere.

Store layout::

    store_dir/p=<bucket>/inc<id>.parquet    # one uint64 column 'h'

``bucket = h >> (64 - bits)`` — a contiguous hash range per partition,
so an increment's probe reads ONLY its buckets' files (at corpus scale
the store is large but each increment touches every bucket with a tiny
slice; the per-bucket file count is bounded by the increment count and
compactable with stages/compact.py).

Semantics: the FIRST increment containing a key accepts it; within an
increment, the row with the smallest ``order_col`` wins (a total order
per key makes the result deterministic — the requirement every carry
operator in this engine shares).  Increments must be ingested with
monotonically increasing ``inc_id``.

Idempotence / crash safety (the compact.py discipline):
* all files (accepted output + store append) are written ``.tmp`` then
  atomically renamed, with DETERMINISTIC names keyed by (inc_id,
  bucket) — a rerun overwrites its own partial work instead of
  duplicating it;
* the store append carries ``inc<id>`` in its name and the probe
  IGNORES the current increment's own store files, so a crash after the
  store append but before the output rename re-accepts the same rows on
  rerun (same files, same contents).

Distribution: one hash-shuffle of the increment by bucket
(``groupby(bucket).map_groups``), then each bucket task is independent:
in-bucket first-per-key reduction (vectorized lexsort), store-partition
read, anti-filter, two file writes.  No driver state at any size.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _bucket_of(h: np.ndarray, bits: int) -> np.ndarray:
    return (h >> np.uint64(64 - bits)).astype(np.int64)


def dedup_ingest(ds, store_dir: str, out_dir: str, key_col: str,
                 order_col: str, inc_id: int, bits: int = 6):
    """Ingest one increment.  Returns a small per-bucket stats Dataset
    (bucket, accepted, rejected); accepted rows land under
    ``out_dir/inc=<inc_id>/`` as parquet (read back with read_parquet).

    ``key_col`` (string) is the content identity — hashed with the
    md5-parity ``content_hash64`` kernel; ``order_col`` (int64) breaks
    in-increment ties (smallest wins)."""
    from .sample import content_hash64

    os.makedirs(store_dir, exist_ok=True)
    acc_dir = os.path.join(out_dir, f"inc={inc_id}")
    os.makedirs(acc_dir, exist_ok=True)

    def _tag(b: pa.Table) -> pa.Table:
        h = content_hash64(b.column(key_col))
        b = b.append_column("_h", pa.array(h.view(np.int64), pa.int64()))
        return b.append_column(
            "_bkt", pa.array(_bucket_of(h, bits), pa.int64()))

    def _one_bucket(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "accepted": pa.array([], pa.int64()),
                             "rejected": pa.array([], pa.int64())})
        bkt = int(g.column("_bkt")[0].as_py())
        h = g.column("_h").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = g.column(order_col).to_numpy(zero_copy_only=False)
        # in-increment first-per-key: smallest order_col per hash
        sel = np.lexsort((order, h))
        first = np.ones(len(sel), dtype=bool)
        first[1:] = h[sel][1:] != h[sel][:-1]
        keep_idx = sel[first]
        n_in_dupes = len(h) - len(keep_idx)
        kh = h[keep_idx]
        # probe: every PRIOR increment's file in this bucket (skip our
        # own — a rerun after a crashed output rename must re-accept)
        pdir = os.path.join(store_dir, f"p={bkt}")
        seen_parts = [
            pq.read_table(f, columns=["h"]).column("h")
            .to_numpy(zero_copy_only=False).astype(np.uint64)
            for f in sorted(glob.glob(os.path.join(pdir, "inc*.parquet")))
            if not f.endswith(f"inc{inc_id}.parquet")
        ]
        if seen_parts:
            seen = np.sort(np.concatenate(seen_parts))
            novel = ~np.isin(kh, seen)
        else:
            novel = np.ones(len(kh), dtype=bool)
        acc = g.take(pa.array(keep_idx[novel])) \
            .drop_columns(["_h", "_bkt"])
        # deterministic names + tmp/rename: reruns overwrite, never append
        os.makedirs(pdir, exist_ok=True)
        store_f = os.path.join(pdir, f"inc{inc_id}.parquet")
        pq.write_table(pa.table({"h": pa.array(kh[novel].view(np.int64),
                                               pa.int64())}),
                       store_f + ".tmp")
        out_f = os.path.join(acc_dir, f"bucket_{bkt:04d}.parquet")
        pq.write_table(acc, out_f + ".tmp")
        os.replace(store_f + ".tmp", store_f)
        os.replace(out_f + ".tmp", out_f)
        return pa.table({
            "bucket": pa.array([bkt], pa.int64()),
            "accepted": pa.array([int(novel.sum())], pa.int64()),
            "rejected": pa.array([int((~novel).sum()) + n_in_dupes],
                                 pa.int64())})

    tagged = ds.map_batches(_tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_bkt").map_groups(_one_bucket,
                                             batch_format="pyarrow")


def read_accepted(out_dir: str, inc_id: int | None = None):
    """Dataset of accepted rows — one increment or the whole history."""
    import ray.data

    pat = (os.path.join(out_dir, f"inc={inc_id}", "*.parquet")
           if inc_id is not None
           else os.path.join(out_dir, "inc=*", "*.parquet"))
    return ray.data.read_parquet(sorted(glob.glob(pat)))

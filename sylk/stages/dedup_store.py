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
    files = sorted(glob.glob(pat))
    if not files:  # no (or a visibly-incomplete) increment yet
        return ray.data.from_items([])
    return ray.data.read_parquet(files)


# --- incremental near-dup (MinHash-LSH) store --------------------------------

def neardup_ingest(ds, store_dir: str, out_dir: str, inc_id: int,
                   threshold: float = 0.8, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Incremental NEAR-dup dedup across increments: the MinHash sibling
    of :func:`dedup_ingest`.  Semantics (deterministic given the LSH
    recall argument documented at ``dedup.minhash_dup_pairs``):

    1. in-increment: exact-verified LSH pairs -> connected components ->
       keep the min-id representative per cluster;
    2. cross-increment: a kept doc is REJECTED iff one of its 16 band
       buckets collides with a PRIOR ACCEPTED doc AND exact 3-gram
       Jaccard against that doc's stored text >= ``threshold``;
    3. survivors' rows land under ``out_dir/inc=<id>/`` and their
       (band, band_hash, doc_id) rows under ``store_dir/inc=<id>/`` —
       both written into scratch dirs atomically renamed into place, so
       a rerun rebuilds its own increment instead of appending.

    Doc ids must be globally unique across increments (they key the
    text lookup for verification).  At 100-TB scale the band store
    would additionally partition by band-hash prefix so a probe reads
    only colliding ranges; the probe here streams the whole (reduced:
    16 rows/accepted doc) store through one hash join, which is the
    same exchange shape.

    Returns ``{"accepted": n, "rejected_in_inc": n, "rejected_cross": n}``.
    """
    import shutil

    import ray
    import ray.data

    from .aggregate import grouped_counts
    from .dedup import (connected_components, minhash_bands_batch,
                        minhash_dup_pairs, ngram_jaccard, _verify_pairs)
    from .join import hash_join

    n_inc = ds.count()
    pairs = minhash_dup_pairs(ds, threshold=threshold, text_col=text_col)
    nodes = ds.map_batches(lambda b: b.select([id_col]),
                           batch_format="pyarrow", batch_size=None)
    cc = connected_components(nodes, pairs, node_col=id_col)

    def _reps(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_columns == 0:
            return pa.table({"_rep": pa.array([], pa.int64())})
        keep = pc.equal(b.column(id_col), b.column("cluster_id"))
        return pa.table({"_rep": b.column(id_col).filter(keep)})

    reps = cc.map_batches(_reps, batch_format="pyarrow", batch_size=None)
    kept = hash_join(ds, reps, on=id_col, right_on="_rep").materialize()
    n_kept = kept.count()

    # ---- cross-increment probe ----
    prior = sorted(
        d for d in glob.glob(os.path.join(store_dir, "inc=*"))
        if os.path.basename(d) != f"inc={inc_id}")
    rejected_ids: set = set()
    if prior:
        new_bands = kept.map_batches(
            lambda b: _bands_i64(b, text_col, id_col),
            batch_format="pyarrow", batch_size=None)
        store_bands = ray.data.read_parquet(
            [f for d in prior
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))])

        def _ren(b: pa.Table) -> pa.Table:
            # by name: the Hive reader adds the inc=<id> dir as a column
            if b.num_columns == 0:
                return pa.table({"_old": pa.array([], pa.int64()),
                                 "_sband": pa.array([], pa.int32()),
                                 "_sbh": pa.array([], pa.int64())})
            return pa.table({"_old": b.column("doc_id"),
                             "_sband": b.column("band"),
                             "_sbh": b.column("band_hash")})

        cand = hash_join(new_bands,
                         store_bands.map_batches(_ren,
                                                 batch_format="pyarrow",
                                                 batch_size=None),
                         on=("band", "band_hash"),
                         right_on=("_sband", "_sbh"))

        def _ab(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            return pa.table({"a": b.column("doc_id"),
                             "b": b.column("_old")})

        cand = grouped_counts(
            cand.map_batches(_ab, batch_format="pyarrow",
                             batch_size=None), ["a", "b"]) \
            .drop_columns(["n"])

        def _sel_texts(b: pa.Table) -> pa.Table:
            # upstream joins/map_groups can emit schemaless empty
            # blocks (dedup.py:78 pattern) — rebuild the schema so the
            # union's block schemas agree
            if b.num_columns == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 text_col: pa.array([], pa.string())})
            return b.select([id_col, text_col])

        texts = kept.map_batches(
            _sel_texts, batch_format="pyarrow", batch_size=None) \
            .union(read_accepted(out_dir).map_batches(
                _sel_texts, batch_format="pyarrow", batch_size=None))

        def _jac(ta, tb):
            j = ngram_jaccard(ta or "", tb or "")
            return j if j >= threshold else None

        verified = _verify_pairs(cand, texts, id_col, text_col, _jac,
                                 "jaccard")
        def _sel_a(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.table({"a": pa.array([], pa.int64())})
            return b.select(["a"])

        vdf = verified.map_batches(_sel_a, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
        # an all-empty Dataset's to_pandas loses the schema entirely
        rejected_ids = set(vdf["a"].tolist()) if "a" in vdf.columns else set()
        # driver holds REJECTED ids only — bounded by the cross-dup
        # volume, not the increment (the funnel-frontier bound argument)
        if rejected_ids:
            ref = ray.put(np.array(sorted(rejected_ids), dtype=np.int64))

            def _drop(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                rej = ray.get(ref)
                ids = b.column(id_col).to_numpy(zero_copy_only=False)
                return b.filter(pa.array(~np.isin(ids, rej)))

            kept = kept.map_batches(_drop, batch_format="pyarrow",
                                    batch_size=None)

    # ---- atomic writes (scratch dir + rename; reruns overwrite) ----
    # ORDER MATTERS: band store FIRST, accepted output second.  A crash
    # between the two swaps then leaves the increment VISIBLY
    # incomplete (read_accepted(inc) empty -> caller reruns, both dirs
    # overwritten); the reverse order would leave accepted docs whose
    # bands never reached the store — silent recall loss for every
    # later increment.  Probes already ignore the current inc's store
    # files, so the early store swap never poisons its own rerun.
    accepted = kept.materialize()
    n_acc = accepted.count()
    for root, build in ((store_dir,
                         lambda d: accepted.map_batches(
                             lambda b: _bands_i64(b, text_col, id_col),
                             batch_format="pyarrow",
                             batch_size=None).write_parquet(d)),
                        (out_dir, lambda d: accepted.write_parquet(d))):
        os.makedirs(root, exist_ok=True)
        final = os.path.join(root, f"inc={inc_id}")
        tmp = os.path.join(root, f".build-inc{inc_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        build(tmp)
        # a fully-rejected increment writes no files; the (empty) final
        # dir must still exist so reruns and probes see the increment
        os.makedirs(tmp, exist_ok=True)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
    return {"accepted": int(n_acc),
            "rejected_in_inc": int(n_inc - n_kept),
            "rejected_cross": len(rejected_ids)}


def _bands_i64(b: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, band, band_hash) rows with the hash bit-reinterpreted as
    int64 — Ray's keyed shuffle overflows uint64 > 2^63 (CLAUDE.md)."""
    from .dedup import minhash_bands_batch

    if b.num_columns == 0:  # schemaless empty block (dedup.py:78 pattern)
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64())})
    t = minhash_bands_batch(b, text_col, id_col)
    bh = t.column("band_hash").to_numpy(zero_copy_only=False) \
        .astype(np.uint64).view(np.int64)
    return pa.table({"doc_id": t.column("doc_id"),
                     "band": t.column("band").cast(pa.int32()),
                     "band_hash": pa.array(bh, pa.int64())})

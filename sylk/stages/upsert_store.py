"""LSM-style upsert (CDC merge) store: insert-or-replace with delete
tombstones across ingest increments — the MERGE INTO / mutable-table
semantics a log-structured data lake provides, built from immutable
per-increment sorted runs.

Store layout::

    store_dir/p=<bucket>/run_inc<id>.parquet   # winners of one increment

``bucket = key_hash >> (64 - bits)`` co-locates every version of a key
in one partition, so reads and compaction never shuffle across buckets.
Each write reduces its increment to one LAST row per key (by
``order_col`` — a total order within the increment), stamps ``_inc``,
and lands the run with a deterministic name via tmp+rename (reruns
overwrite; the compact.py / dedup_store discipline).

Read semantics: for each key, the row from the HIGHEST ``(_inc,
order_col)`` wins; if the winner's ``tombstone_col`` is true the key is
absent from the live view.  Increments must be written with
monotonically increasing ``inc_id`` (arrival order IS the CDC order).

Compaction (:func:`compact_store`): per bucket, merge all runs into one
``run_compact<max>.parquet`` holding only the winners — tombstone rows
are DROPPED (a full-bucket compaction leaves nothing older for them to
mask).  The bucket directory is rebuilt in scratch and atomically
swapped, so a crashed compaction leaves the old runs intact.  The
``run_compact`` prefix is RESERVED: no increment can ever write it, so
a crash-recovery rerun of increment ``<max>`` (which os.replace's its
own deterministic ``run_inc<max>.parquet``) can never clobber the
compacted history of other keys — per-row ``_inc`` still carries merge
order, so the rerun's rows win ties exactly as the original did.

Scale shape: writes are one hash exchange of the increment; reads and
compaction stream per-bucket (embarrassingly parallel, bounded by
bucket size not store size); the per-bucket run count grows with the
increment count and is exactly what compaction bounds.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _key_hash(col: pa.Array) -> np.ndarray:
    from ..functions.hashing import mix64

    k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return mix64(k)


def _last_per_key(tbl: pa.Table, key_col: str, order_keys) -> pa.Table:
    """Vectorized last-wins: one row per key, the max ``order_keys``
    tuple wins (lexsort + run-end pick)."""
    if tbl.num_rows == 0:
        return tbl
    keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
    order_arrs = [tbl.column(c).to_numpy(zero_copy_only=False)
                  for c in order_keys]
    sel = np.lexsort(tuple(reversed(order_arrs)) + (keys,))
    last = np.ones(len(sel), dtype=bool)
    last[:-1] = keys[sel][1:] != keys[sel][:-1]
    return tbl.take(pa.array(sel[last]))


def upsert_write(ds, store_dir: str, key_col: str, order_col: str,
                 inc_id: int, bits: int = 4):
    """Write one CDC increment.  Returns a per-bucket stats Dataset
    (bucket, rows)."""

    def _tag(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return b
        h = _key_hash(b.column(key_col))
        return b.append_column(
            "_bkt", pa.array((h >> np.uint64(64 - bits)).astype(np.int64),
                             pa.int64()))

    def _one_bucket(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        bkt = int(g.column("_bkt")[0].as_py())
        win = _last_per_key(g.drop_columns(["_bkt"]), key_col, [order_col])
        win = win.append_column(
            "_inc", pa.array(np.full(win.num_rows, inc_id), pa.int64()))
        pdir = os.path.join(store_dir, f"p={bkt}")
        os.makedirs(pdir, exist_ok=True)
        f = os.path.join(pdir, f"run_inc{inc_id}.parquet")
        pq.write_table(win, f + ".tmp")
        os.replace(f + ".tmp", f)
        return pa.table({"bucket": pa.array([bkt], pa.int64()),
                         "rows": pa.array([win.num_rows], pa.int64())})

    os.makedirs(store_dir, exist_ok=True)
    tagged = ds.map_batches(_tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_bkt").map_groups(_one_bucket,
                                             batch_format="pyarrow")


def _bucket_dirs(store_dir: str) -> list[str]:
    out = {d for d in glob.glob(os.path.join(store_dir, "p=*"))
           if not d.endswith((".old", ".compact"))}
    # a compaction that crashed between its two renames leaves only
    # .old/.compact — surface the bucket so _recover_bucket converges it
    for d in glob.glob(os.path.join(store_dir, "p=*.old")):
        out.add(d[: -len(".old")])
    return sorted(out)


def _recover_bucket(pdir: str) -> None:
    """Converge a bucket left by a crashed compaction: once the live
    dir was renamed to ``.old`` the scratch ``.compact`` dir is known
    complete, so roll FORWARD (.compact -> live); pre-rename crashes
    only leave a stale scratch dir to delete."""
    old, tmp = pdir + ".old", pdir + ".compact"
    if os.path.isdir(old):
        if not os.path.isdir(pdir):
            if os.path.isdir(tmp):
                os.rename(tmp, pdir)
            else:  # unreachable by the protocol order; keep data anyway
                os.rename(old, pdir)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def _bucket_runs(pdir: str) -> list[str]:
    # "run_compact*" sorts before "run_inc*" (c < i), so on an _inc tie
    # (a rerun of the increment a compaction already absorbed) the
    # rerun's row concatenates later and wins via lexsort stability —
    # same data either way, but the order is deterministic.
    return sorted(glob.glob(os.path.join(pdir, "run_inc*.parquet"))
                  + glob.glob(os.path.join(pdir, "run_compact*.parquet")))


def _merge_bucket(pdir: str, key_col: str, order_col: str) -> pa.Table:
    runs = [pq.read_table(f) for f in _bucket_runs(pdir)]
    if not runs:
        return None
    return _last_per_key(pa.concat_tables(runs), key_col,
                         ["_inc", order_col])


def read_current(store_dir: str, key_col: str, order_col: str,
                 tombstone_col: str | None = None):
    """Dataset of the store's LIVE rows: per-bucket run merge, highest
    (_inc, order) wins, tombstone winners dropped.  Buckets stream as
    independent tasks whose outputs stay in the OBJECT STORE — the
    driver never holds a row (the task refs feed from_arrow_refs
    directly; empty buckets contribute empty blocks)."""
    import ray
    import ray.data

    for d in _bucket_dirs(store_dir):
        _recover_bucket(d)
    # only buckets with at least one run (always true post-write; a
    # fully-tombstoned compacted bucket holds a 0-row run with schema)
    dirs = [d for d in _bucket_dirs(store_dir) if _bucket_runs(d)]
    if not dirs:
        return ray.data.from_items([])

    @ray.remote
    def _one(pdir: str) -> pa.Table:
        tbl = _merge_bucket(pdir, key_col, order_col)
        if tombstone_col is not None:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.invert(pc.fill_null(
                tbl.column(tombstone_col).cast(pa.bool_()), False)))
        return tbl.drop_columns(["_inc"])

    return ray.data.from_arrow_refs([_one.remote(d) for d in dirs])


def compact_store(store_dir: str, key_col: str, order_col: str,
                  tombstone_col: str | None = None) -> dict:
    """Merge every bucket's runs into one (winners only; tombstones
    dropped — full-bucket compaction leaves nothing for them to mask).
    Atomic per bucket via scratch-dir swap; crash leaves old runs."""
    import ray

    @ray.remote
    def _one(pdir: str) -> tuple:
        _recover_bucket(pdir)
        tbl = _merge_bucket(pdir, key_col, order_col)
        if tbl is None:
            return (0, 0)
        n_in = len(_bucket_runs(pdir))
        if tombstone_col is not None:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.invert(pc.fill_null(
                tbl.column(tombstone_col).cast(pa.bool_()), False)))
        top = int(tbl.column("_inc").to_numpy(zero_copy_only=False).max()) \
            if tbl.num_rows else 0
        tmp = pdir + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        # RESERVED name — upsert_write only ever writes run_inc<id>, so
        # a rerun of increment `top` can never os.replace this file and
        # silently drop every other key's compacted history
        pq.write_table(tbl, os.path.join(tmp, f"run_compact{top}.parquet"))
        old = pdir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old, ignore_errors=True)
        return (n_in, 1)

    res = ray.get([_one.remote(d) for d in _bucket_dirs(store_dir)])
    return {"runs_in": sum(r[0] for r in res),
            "runs_out": sum(r[1] for r in res)}

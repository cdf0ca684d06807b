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
bounded by :func:`compact_ingest_store` / ``sylk compact``).

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


def _bucket_probe_files(pdir: str, inc_id: int) -> list[str]:
    """A probe's read set for one bucket: every prior increment's file
    plus any reserved-name compact file (never "own increment"), minus
    the current increment's own file (a rerun after a crashed output
    rename must re-accept its rows)."""
    own = f"inc{inc_id}.parquet"
    return sorted(
        f for f in (glob.glob(os.path.join(pdir, "inc*.parquet"))
                    + glob.glob(os.path.join(pdir, "compact*.parquet")))
        if os.path.basename(f) != own)


def _compact_watermark(store_dir: str) -> int:
    """Highest increment id folded into compact files (-1 = none)."""
    import json

    p = os.path.join(store_dir, "_compact.json")
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(json.load(f)["upto"])


def _write_watermark(store_dir: str, upto: int) -> None:
    import json

    p = os.path.join(store_dir, "_compact.json")
    with open(p + ".tmp", "w") as f:
        json.dump({"upto": upto}, f)
    os.replace(p + ".tmp", p)


def _check_watermark(store_dir: str, inc_id: int) -> None:
    wm = _compact_watermark(store_dir)
    if inc_id <= wm:
        raise ValueError(
            f"inc_id {inc_id} <= compaction watermark {wm}: increments "
            "at or below the horizon are merged into reserved compact "
            "files; a rerun would see its own hashes in the store and "
            "silently reject every row (the upsert-store run-name "
            "lesson).  Rerun-able increments are never compacted — "
            "compact_ingest_store only folds increments whose accepted "
            "output is visible.")


def compact_ingest_store(store_dir: str, out_dir: str) -> dict:
    """Bound an ingest store's per-bucket file count (VERDICT r4 #7).
    Works on both p=<bucket>/inc<id>.parquet stores — the exact
    dedup_ingest hash store and the near-dup band store: per bucket,
    merge every COMPLETE increment's file (completeness = the
    increment's ``out_dir/inc=<id>`` dir is visible; the store protocol
    reruns an increment only while its output dir is MISSING, so a
    visible increment can never rerun) plus any earlier compact file
    into one reserved-name ``compact<upto>.parquet``.

    ``upto`` (the highest folded inc id) persists as a watermark that
    makes *_ingest refuse ``inc_id <= upto``: a rerun below the horizon
    would find its own hashes in the compact file — which no per-file
    name exclusion can hide — and silently reject all of its rows.

    Crash safety (the compact.py discipline): write compact tmp ->
    rename, THEN delete sources.  A crash between the rename and the
    deletes leaves duplicate membership rows, which probes tolerate
    (membership is a set test; band candidates dedupe in
    grouped_counts) and the next compaction folds away.  Single-writer:
    run between increments, like upsert_store.compact_store."""
    import ray

    incs = sorted(
        int(os.path.basename(d).split("=", 1)[1])
        for d in glob.glob(os.path.join(out_dir, "inc=*")))
    if not incs:
        return {"files_in": 0, "files_out": 0,
                "upto": _compact_watermark(store_dir)}
    upto = max(incs)
    complete = {f"inc{i}.parquet" for i in incs}

    @ray.remote
    def _one(pdir: str) -> tuple:
        files = sorted(
            f for f in glob.glob(os.path.join(pdir, "inc*.parquet"))
            if os.path.basename(f) in complete)
        files += sorted(glob.glob(os.path.join(pdir, "compact*.parquet")))
        cf = os.path.join(pdir, f"compact{upto}.parquet")
        if not files or files == [cf]:
            return (len(files), len(files))
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        if tbl.schema.names == ["h"]:  # exact store: shrink to the set
            tbl = pa.table({"h": pa.array(np.unique(
                tbl.column("h").to_numpy(zero_copy_only=False)),
                pa.int64())})
        pq.write_table(tbl, cf + ".tmp")
        os.replace(cf + ".tmp", cf)
        for f in files:
            if os.path.abspath(f) != os.path.abspath(cf):
                os.remove(f)
        return (len(files), 1)

    res = ray.get([_one.remote(d) for d in
                   sorted(glob.glob(os.path.join(store_dir, "p=*")))])
    _write_watermark(store_dir, upto)
    return {"files_in": sum(r[0] for r in res),
            "files_out": sum(r[1] for r in res), "upto": upto}


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
    _check_watermark(store_dir, inc_id)
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
        # probe: every PRIOR increment's file in this bucket plus any
        # compact file (skip our own — a rerun after a crashed output
        # rename must re-accept)
        pdir = os.path.join(store_dir, f"p={bkt}")
        seen_parts = [
            pq.read_table(f, columns=["h"]).column("h")
            .to_numpy(zero_copy_only=False).astype(np.uint64)
            for f in _bucket_probe_files(pdir, inc_id)
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

def _neardup_probe_files(store_dir: str, inc_id: int,
                         buckets) -> list[str]:
    """Prior-increment band files for the given band-hash buckets ONLY
    — the probe's read set.  Factored out so the pruning contract is
    directly testable (tests assert only colliding ``p=`` dirs open)."""
    out = []
    for bkt in sorted(buckets):
        out.extend(_bucket_probe_files(
            os.path.join(store_dir, f"p={bkt}"), inc_id))
    return out


def neardup_ingest(ds, store_dir: str, out_dir: str, inc_id: int,
                   threshold: float = 0.8, text_col: str = "text",
                   id_col: str = "doc_id", bits: int = 6):
    """Incremental NEAR-dup dedup across increments: the MinHash sibling
    of :func:`dedup_ingest`.  Semantics (deterministic given the LSH
    recall argument documented at ``dedup.minhash_dup_pairs``):

    1. in-increment: exact-verified LSH pairs -> connected components ->
       keep the min-id representative per cluster;
    2. cross-increment: a kept doc is REJECTED iff one of its 16 band
       buckets collides with a PRIOR ACCEPTED doc AND exact 3-gram
       Jaccard against that doc's stored text >= ``threshold``;
    3. survivors' rows land under ``out_dir/inc=<id>/`` (scratch dir
       atomically renamed into place) and their (doc_id, band,
       band_hash) rows under ``store_dir/p=<bucket>/inc<id>.parquet``
       with ``bucket = band_hash >> (64 - bits)`` — the same hash-prefix
       partitioning :func:`dedup_ingest` uses, written with
       deterministic names + tmp/rename so reruns overwrite.

    The probe is PRUNED: an increment collects its distinct band-hash
    buckets (<= 2**bits values of metadata, never rows) and reads only
    those ``p=`` partitions' prior files — at corpus scale the store is
    large but the probe IO is bounded by the increment's colliding hash
    ranges, not the store (raise ``bits`` as the corpus grows).
    Verification texts are semi-joined down to candidate doc ids before
    the pair join, and cross-rejected ids are removed with an anti-join
    (bounded broadcast tier with a distributed fallback) — no driver-held
    id set at any size.

    Doc ids must be globally unique across increments (they key the
    text lookup for verification).

    Returns ``{"accepted": n, "rejected_in_inc": n, "rejected_cross": n}``.
    """
    import shutil

    import ray
    import ray.data

    from .aggregate import grouped_counts
    from .dedup import (connected_components, minhash_bands_batch,
                        minhash_dup_pairs, ngram_jaccard,
                        _verify_broadcast, _verify_pairs)
    from .join import anti_join, hash_join, semi_join

    os.makedirs(store_dir, exist_ok=True)
    _check_watermark(store_dir, inc_id)
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

    def _bands_bkt(b: pa.Table) -> pa.Table:
        t = _bands_i64(b, text_col, id_col)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        return t.append_column(
            "_bkt", pa.array((bh >> np.uint64(64 - bits)).astype(np.int64),
                             pa.int64()))

    # ---- cross-increment probe (bucket-pruned) ----
    # materialize: consumed by the bucket collection AND the candidate
    # join — shared lineage would otherwise recompute the bands
    # (CLAUDE.md's two-consumer rule); size is 16 rows per kept doc.
    new_bands = kept.map_batches(_bands_bkt, batch_format="pyarrow",
                                 batch_size=None).materialize()
    # distinct buckets hit by THIS increment: per-block unique first, so
    # the driver receives <= blocks x 2**bits bucket ids — metadata,
    # never band rows
    import pyarrow.compute as pc

    hit: set = set()
    for blk in ray.get(new_bands.map_batches(
            lambda b: (pa.table({"_bkt": pc.unique(b.column("_bkt"))})
                       if b.num_columns else
                       pa.table({"_bkt": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None).to_arrow_refs()):
        # empty blocks can surface schemaless (dedup.py:78 pattern)
        if isinstance(blk, pa.Table) and "_bkt" in blk.schema.names:
            hit.update(blk.column("_bkt").to_pylist())
    prior_files = _neardup_probe_files(store_dir, inc_id, hit)
    n_rej_cross = 0
    if prior_files:
        store_bands = ray.data.read_parquet(prior_files)

        def _ren(b: pa.Table) -> pa.Table:
            # by name: the reader adds the p=<bucket> dir as a column
            if b.num_columns == 0:
                return pa.table({"_old": pa.array([], pa.int64()),
                                 "_sband": pa.array([], pa.int32()),
                                 "_sbh": pa.array([], pa.int64())})
            return pa.table({"_old": b.column("doc_id"),
                             "_sband": b.column("band"),
                             "_sbh": b.column("band_hash")})

        cand = hash_join(new_bands.drop_columns(["_bkt"]),
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
            .drop_columns(["n"]).materialize()

        def _sel_texts(b: pa.Table) -> pa.Table:
            # upstream joins/map_groups can emit schemaless empty
            # blocks (dedup.py:78 pattern) — rebuild the schema so the
            # union's block schemas agree
            if b.num_columns == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 text_col: pa.array([], pa.string())})
            return b.select([id_col, text_col])

        def _cand_ids(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.table({"_cid": pa.array([], pa.int64())})
            return pa.table({"_cid": pa.array(np.concatenate(
                [b.column("a").to_numpy(zero_copy_only=False),
                 b.column("b").to_numpy(zero_copy_only=False)]),
                pa.int64())})

        texts = kept.map_batches(
            _sel_texts, batch_format="pyarrow", batch_size=None) \
            .union(read_accepted(out_dir).map_batches(
                _sel_texts, batch_format="pyarrow", batch_size=None))

        def _jac(ta, tb):
            j = ngram_jaccard(ta or "", tb or "")
            return j if j >= threshold else None

        # tiered verify (each distributed exchange costs seconds of
        # fixed overhead — CLAUDE.md): a bounded candidate collect
        # routes small pair sets through the broadcast verifier (texts
        # arrive via a worker-side is-in filter, never a full stream);
        # above the limit, semi-join-pruned texts + the edge-join path.
        from .dedup import _DRIVER_PAIR_LIMIT, _bounded_collect

        cand, ctbl = _bounded_collect(cand, _DRIVER_PAIR_LIMIT)
        verified = None
        if ctbl is not None:
            if ctbl.num_rows:
                verified = _verify_broadcast(
                    ctbl.to_pandas()[["a", "b"]], texts, id_col,
                    text_col, _jac, "jaccard")
        else:
            # prune the verification corpus to candidate docs BEFORE
            # the pair join: only colliding texts enter the exchange
            texts = semi_join(texts, cand.map_batches(
                _cand_ids, batch_format="pyarrow", batch_size=None),
                on=id_col, right_key="_cid")
            verified = _verify_pairs(cand, texts, id_col, text_col,
                                     _jac, "jaccard")

        def _sel_a(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.table({"a": pa.array([], pa.int64())})
            return b.select(["a"])

        if verified is not None:
            # cross-rejected ids leave via an ANTI-JOIN (bounded
            # broadcast tier, distributed left_anti fallback) — the
            # driver never holds an unbounded id set
            kept = anti_join(kept, verified.map_batches(
                _sel_a, batch_format="pyarrow", batch_size=None),
                on=id_col, right_key="a")

    # ---- writes ----
    # ORDER MATTERS: band store FIRST, accepted output second.  A crash
    # between the two leaves the increment VISIBLY incomplete
    # (read_accepted(inc) empty -> caller reruns, deterministic names
    # overwrite); the reverse order would leave accepted docs whose
    # bands never reached the store — silent recall loss for every
    # later increment.  Probes ignore the current inc's store files, so
    # early store writes never poison their own rerun.
    accepted = kept.materialize()
    n_acc = accepted.count()
    n_rej_cross = n_kept - n_acc
    os.makedirs(store_dir, exist_ok=True)

    def _write_bucket(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        bkt = int(g.column("_bkt")[0].as_py())
        pdir = os.path.join(store_dir, f"p={bkt}")
        os.makedirs(pdir, exist_ok=True)
        f = os.path.join(pdir, f"inc{inc_id}.parquet")
        pq.write_table(g.drop_columns(["_bkt"]), f + ".tmp")
        os.replace(f + ".tmp", f)
        return pa.table({"bucket": pa.array([bkt], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    accepted.map_batches(_bands_bkt, batch_format="pyarrow",
                         batch_size=None) \
        .groupby("_bkt").map_groups(_write_bucket,
                                    batch_format="pyarrow").materialize()

    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, f"inc={inc_id}")
    tmp = os.path.join(out_dir, f".build-inc{inc_id}")
    shutil.rmtree(tmp, ignore_errors=True)
    accepted.write_parquet(tmp)
    # a fully-rejected increment writes no files; the (empty) final dir
    # must still exist so reruns and readers see the increment
    os.makedirs(tmp, exist_ok=True)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    return {"accepted": int(n_acc),
            "rejected_in_inc": int(n_inc - n_kept),
            "rejected_cross": int(n_rej_cross)}


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

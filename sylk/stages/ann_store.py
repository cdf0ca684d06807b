"""Incremental ANN vector store: embedding increments appended to an
IVF-cell-partitioned store, probed with scan-level pruning — the vector
side of the ingest-store family (dedup_store / upsert_store), for the
"index the corpus as it arrives" workflow a streaming training-data
pipeline needs.

Store layout::

    store_dir/_index.json            # {n_cells, dim, seed} metadata
    store_dir/centroids.npy          # float64 (n_cells, dim), unit rows
    store_dir/cell=<c>/inc<id>.parquet      # vec_id, embedding
    store_dir/cell=<c>/compact<upto>.parquet # folded increments
    store_dir/_deletes/del<id>.parquet      # tombstoned vec_ids
    store_dir/_deletes/_done_del<id>.json   # delete marker
    store_dir/_done_inc<id>.json     # increment completeness marker
    store_dir/_compact.json          # compaction watermark

The FIRST increment trains the centroids (the deterministic
order-statistics sample of :meth:`similarity.IVFIndex.train`) and
persists them; every later increment loads and reuses them, so cell
identity is stable across the store's lifetime and a query's probe set
prunes the SCAN — only the probed ``cell=`` directories' files are
opened (``probe_files`` is the testable contract).  Centroids are NOT
retrained as the corpus drifts; that is the standard IVF trade —
rebuild the store to rebalance.

Idempotence / crash safety (the compact.py discipline shared by the
other stores):

* centroids + metadata are written tmp -> atomic rename; retraining on
  a rerun of increment 1 is deterministic (same sample, same seed), so
  an overwrite is bit-identical;
* cell files carry DETERMINISTIC names keyed by (cell, inc_id) and are
  written tmp -> rename — a rerun overwrites its own partial work;
* a ``_done_inc<id>.json`` marker is written only after every cell
  file of the increment is visible; reruns happen only while the
  marker is missing;
* :func:`compact_ann_store` folds ONLY marker-complete increments into
  reserved-name ``compact<upto>.parquet`` files (a name no increment
  can produce) and persists a watermark that makes :func:`ann_ingest`
  refuse ``inc_id <= upto`` — the upsert-store run-name lesson.

Distribution: one hash-shuffle of the increment by cell
(``groupby(cell).map_groups``), then each cell task writes its file
independently; no driver state scales with the data (the stats table
is n_cells rows).  The query is the existing pruned brute-force:
``read_parquet`` over probed cells only -> per-block matmul top-k.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .similarity import IVFIndex, ann_topk_bruteforce, _normalize
from .store_fold import (atomic_json, atomic_write, check_watermark,
                         fold_marker_complete)


def _load_index(store_dir: str) -> IVFIndex:
    cents = np.load(os.path.join(store_dir, "centroids.npy"))
    idx = IVFIndex.__new__(IVFIndex)
    idx.centroids = cents  # persisted already normalized
    return idx


def _atomic_npy(path: str, arr: np.ndarray) -> None:
    with open(path + ".tmp", "wb") as f:
        np.save(f, arr)
    os.replace(path + ".tmp", path)


def ann_ingest(emb_ds, store_dir: str, inc_id: int, n_cells: int = 16,
               seed: int = 42, sample: int = 2048) -> pa.Table:
    """Ingest one embedding increment (``vec_id``, ``embedding``).
    Eager (files + completeness marker are on disk on return); returns
    the per-cell stats table (cell, n_rows)."""
    os.makedirs(store_dir, exist_ok=True)
    check_watermark(store_dir, inc_id)

    cpath = os.path.join(store_dir, "centroids.npy")
    if not os.path.exists(cpath):
        index = IVFIndex.train(emb_ds, n_cells=n_cells, sample=sample,
                               seed=seed)
        _atomic_npy(cpath, index.centroids)
        atomic_json(os.path.join(store_dir, "_index.json"),
                    {"n_cells": int(len(index.centroids)),
                     "dim": int(index.centroids.shape[1]), "seed": seed})
    else:
        index = _load_index(store_dir)

    def _one_cell(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        cell = int(g.column("cell")[0].as_py())
        cdir = os.path.join(store_dir, f"cell={cell}")
        os.makedirs(cdir, exist_ok=True)
        out = g.drop_columns(["cell"])
        atomic_write(os.path.join(cdir, f"inc{inc_id}.parquet"),
                      lambda p: pq.write_table(out, p))
        return pa.table({"cell": pa.array([cell], pa.int64()),
                         "n_rows": pa.array([g.num_rows], pa.int64())})

    stats = (emb_ds
             .map_batches(index.assign_batch, batch_format="pyarrow",
                          batch_size=None)
             .groupby("cell")
             .map_groups(_one_cell, batch_format="pyarrow")
             .to_pandas())
    # marker LAST: reruns trigger only while it is missing, and every
    # cell file above is already atomically visible
    atomic_json(os.path.join(store_dir, f"_done_inc{inc_id}.json"),
                 {"cells": int(len(stats)),
                  "rows": int(stats["n_rows"].sum()) if len(stats) else 0})
    return pa.Table.from_pandas(stats, preserve_index=False)


def probe_files(store_dir: str, cells,
                as_of: int | None = None) -> list[str]:
    """A query's read set: every increment + compact file of the probed
    cells ONLY.  Factored out so the scan-pruning contract is directly
    testable (tests assert non-probed ``cell=`` dirs never open).
    ``as_of`` drops inc files above the snapshot horizon (the caller
    has already refused an as_of below the compaction watermark)."""
    from .store_fold import filter_inc_files

    out = []
    for c in sorted(cells):
        cdir = os.path.join(store_dir, f"cell={c}")
        incs = filter_inc_files(
            glob.glob(os.path.join(cdir, "inc*.parquet")), as_of)
        out.extend(sorted(incs + glob.glob(os.path.join(
            cdir, "compact*.parquet"))))
    return out


def _delete_files(store_dir: str) -> list[str]:
    """Marker-COMPLETE tombstone files (an unmarked del file from a
    crash window is invisible, like an unmarked ingest)."""
    ddir = os.path.join(store_dir, "_deletes")
    out = []
    for f in glob.glob(os.path.join(ddir, "_done_del*.json")):
        did = int(os.path.basename(f)[len("_done_del"):-len(".json")])
        p = os.path.join(ddir, f"del{did}.parquet")
        if os.path.exists(p):
            out.append(p)
    return sorted(out)


def ann_delete(store_dir: str, vec_ids, del_id: int) -> dict:
    """Tombstone a batch of vec_ids (right-to-be-forgotten for the
    vector store — the text_index.index_delete pattern without the
    stats machinery, because ANN has no corpus-level statistics to
    correct: deleting a vector only removes it from candidate sets).
    Logical effect is immediate (probes anti-filter the tombstones);
    the physical purge rides the next :func:`compact_ann_store`.
    Never-ingested and double-deleted ids are harmless no-ops, so no
    resolution pass is needed.  Deterministic name + marker-last gives
    the usual rerun idempotence; a deleted vec_id must not be
    re-ingested (the probe would mask it forever)."""
    ddir = os.path.join(store_dir, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    ids = sorted(set(int(i) for i in vec_ids))
    out = pa.table({"vec_id": pa.array(ids, pa.int64())})
    atomic_write(os.path.join(ddir, f"del{del_id}.parquet"),
                 lambda p: pq.write_table(out, p))
    atomic_json(os.path.join(ddir, f"_done_del{del_id}.json"),
                {"n_ids": len(ids)})
    return {"tombstoned": len(ids)}


def ann_store_query(store_dir: str, queries: np.ndarray, k: int = 10,
                    nprobe: int = 4, round_to: int | None = 6,
                    as_of: int | None = None):
    """Cosine top-k over the accumulated store: route each query to its
    ``nprobe`` nearest cells, open ONLY those cells' files (union over
    queries), brute-force inside.  ``nprobe == n_cells`` degrades to an
    exact full scan of the union of all increments — the oracle mode.
    Tombstoned vec_ids are masked from the candidate set with the
    tiered anti-join (cost scales with the PROBED cells, not the
    store).

    ``as_of`` = snapshot read at an ingest horizon: only increments <=
    as_of are scanned (refused below the compaction watermark).  No
    corpus stats exist here, so the horizon is purely a scan cut —
    centroids are trained by increment 1 and never move, so routing is
    identical at every horizon.  Tombstones still apply in full
    (right-to-be-forgotten wins over time travel)."""
    import ray.data

    from .store_fold import check_as_of

    check_as_of(store_dir, as_of)
    index = _load_index(store_dir)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]
    files = probe_files(store_dir,
                        {int(c) for row in probe for c in row},
                        as_of=as_of)
    if not files:
        return ray.data.from_items([])
    pruned = ray.data.read_parquet(files, columns=["vec_id", "embedding"])
    del_files = _delete_files(store_dir)
    if del_files:
        from .join import anti_join

        pruned = anti_join(
            pruned, ray.data.read_parquet(del_files, columns=["vec_id"]),
            on="vec_id")
    return ann_topk_bruteforce(pruned, np.asarray(queries), k=k,
                               round_to=round_to)


def compact_ann_store(store_dir: str, purge_deletes: bool = True) -> dict:
    """Bound the per-cell file count — the shared marker-gated fold
    (:func:`store_fold.fold_marker_complete`) over the ``cell=`` dirs;
    duplicate vectors from a crash window tie and rank adjacently by
    vec_id until the next compaction folds them away.  With
    ``purge_deletes`` (default), tombstoned vec_ids are dropped from
    every rewritten cell file — the physical purge, free because the
    fold rewrites every surviving row anyway (tombstone files are
    retained; re-masking purged ids is a no-op)."""
    drop_fn = None
    if purge_deletes:
        del_files = _delete_files(store_dir)
        if del_files:
            def drop_fn(tbl: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                ids = pa.concat_tables(
                    [pq.read_table(f, columns=["vec_id"])
                     for f in del_files]).column("vec_id").combine_chunks()
                return tbl.filter(
                    pc.invert(pc.is_in(tbl.column("vec_id"),
                                       value_set=ids)))
    return fold_marker_complete(store_dir, "cell=*", drop_fn=drop_fn)

"""Per-increment cost flatness for the marker-gated stores (the
BASELINE.md 'store-trio scale signature' protocol, extended to the
round-5 ANN vector store and inverted text index).

Synthesizes N_INC increments by tiling the sf0.1 tables with shifted
ids (deterministic — no RNG), ingests them sequentially, and prints
per-increment ingest wall + rows/s plus a post-ingest probe latency.
A store whose per-increment cost grows with accumulated size fails the
100-TB shape; flat rows/s is the pass signal.

Usage: python scripts/store_scale_check.py [sf_dir] [n_inc] [tile]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data  # noqa: F401 — registers the data submodule


def _tiled(tbl: pa.Table, id_col: str, tile: int, inc: int) -> pa.Table:
    """Increment ``inc`` = ``tile`` shifted copies of the base table
    (ids offset so every increment's ids are globally unique)."""
    n = tbl.num_rows
    parts = []
    for t in range(tile):
        k = inc * tile + t
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False) \
            + np.int64(k * n)
        parts.append(tbl.set_column(tbl.schema.get_field_index(id_col),
                                    id_col, pa.array(ids, pa.int64())))
    return pa.concat_tables(parts)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from sylk.stages.ann_store import ann_ingest, ann_store_query
    from sylk.stages.text_index import index_ingest, index_query_bm25

    out = {"sf": sf, "n_inc": n_inc, "tile": tile, "stores": {}}

    docs = pq.read_table(os.path.join(sf, "documents.parquet"),
                         columns=["doc_id", "text"])
    store = tempfile.mkdtemp(prefix="sylk_scale_idx_", dir="/tmp")
    try:
        rows, probes = [], []
        for i in range(n_inc):
            part = _tiled(docs, "doc_id", tile, i)
            t0 = time.perf_counter()
            index_ingest(ray.data.from_arrow(part), store, inc_id=i + 1,
                         n_buckets=64)
            dt = time.perf_counter() - t0
            rows.append({"inc": i + 1, "rows": part.num_rows,
                         "wall_s": round(dt, 2),
                         "rows_per_s": int(part.num_rows / dt)})
            t0 = time.perf_counter()
            n = index_query_bm25(store, ["hash", "join", "filter"]).count()
            probes.append({"after_inc": i + 1, "hits": n,
                           "wall_s": round(time.perf_counter() - t0, 2)})
        out["stores"]["text_index"] = {"ingest": rows, "probe": probes}
    finally:
        shutil.rmtree(store, ignore_errors=True)

    emb = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    store = tempfile.mkdtemp(prefix="sylk_scale_ann_", dir="/tmp")
    try:
        q = np.vstack([np.asarray(emb.column("embedding")[i].as_py())
                       for i in range(8)])
        rows, probes = [], []
        for i in range(n_inc):
            part = _tiled(emb, "vec_id", tile, i)
            t0 = time.perf_counter()
            ann_ingest(ray.data.from_arrow(part), store, inc_id=i + 1,
                       n_cells=16)
            dt = time.perf_counter() - t0
            rows.append({"inc": i + 1, "rows": part.num_rows,
                         "wall_s": round(dt, 2),
                         "rows_per_s": int(part.num_rows / dt)})
            t0 = time.perf_counter()
            n = ann_store_query(store, q, k=10, nprobe=4).count()
            probes.append({"after_inc": i + 1, "hits": n,
                           "wall_s": round(time.perf_counter() - t0, 2)})
        out["stores"]["ann_store"] = {"ingest": rows, "probe": probes}
    finally:
        shutil.rmtree(store, ignore_errors=True)

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

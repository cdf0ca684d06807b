"""graph.pagerank, asof.transitions, text.chunk_documents_batch."""

import numpy as np
import pyarrow as pa
import pytest

from sylk.stages.text import chunk_documents_batch


def _ranks(ds):
    return {r["node"]: r["rank_fp"] for r in ds.take_all()}


def test_pagerank_tiers_bit_identical(ray_session):
    import ray.data

    from sylk.stages.graph import pagerank

    edges = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 1),
             ("d", "a", 5)]
    ds = ray.data.from_items(
        [{"src": s, "dst": d, "w": w} for s, d, w in edges])
    drv = _ranks(pagerank(ds, weight_col="w", distributed=False))
    dist = _ranks(pagerank(ds, weight_col="w", distributed=True))
    assert drv == dist
    assert set(drv) == {"a", "b", "c", "d"}
    # sink-heavy node 'a' (two in-edges incl. the weight-5 one) should
    # outrank the pure source 'd' (no in-edges -> base mass only)
    assert drv["a"] > drv["d"]
    n = 4
    base = (15 * (10**12 // n)) // 100
    assert drv["d"] == base


def test_pagerank_unweighted_default(ray_session):
    import ray.data

    from sylk.stages.graph import pagerank

    ds = ray.data.from_items([{"src": "x", "dst": "y"},
                              {"src": "y", "dst": "x"}])
    r = _ranks(pagerank(ds))
    # symmetric 2-cycle: both nodes identical by symmetry
    assert r["x"] == r["y"] > 0


def test_transitions_across_block_seams(ray_session):
    import ray.data

    from sylk.stages.asof import transitions

    rows = [{"k": 1, "t": i, "v": chr(ord("a") + i)} for i in range(6)]
    rows += [{"k": 2, "t": i, "v": "zz"} for i in range(3)]
    ds = ray.data.from_items(rows).repartition(4)
    out = transitions(ds, key="k", order_cols=["t"], value_col="v")
    got = sorted((r["src"], r["dst"]) for r in out.take_all())
    want = sorted([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                   ("e", "f"), ("zz", "zz"), ("zz", "zz")])
    assert got == want


def test_chunk_documents_windows():
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [" ".join(f"t{i}" for i in range(100)),
                           "a b c",
                           ""]})
    out = chunk_documents_batch(b, chunk_size=64, stride=48)
    rows = out.to_pylist()
    d1 = [r for r in rows if r["doc_id"] == 1]
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert not [r for r in rows if r["doc_id"] == 3]  # empty doc: nothing
    # doc1: starts 0, 48, 96 -> lengths 64, 52, 4
    assert [(r["chunk_idx"], r["n_tokens"]) for r in d1] == \
        [(0, 64), (1, 52), (2, 4)]
    assert d1[0]["chunk_text"].split()[0] == "t0"
    assert d1[1]["chunk_text"].split()[0] == "t48"
    assert d1[2]["chunk_text"] == "t96 t97 t98 t99"
    # overlap region: chunk 0 tokens 48..63 == chunk 1 tokens 0..15
    assert d1[0]["chunk_text"].split()[48:] == d1[1]["chunk_text"].split()[:16]
    assert d2 == [{"doc_id": 2, "chunk_idx": 0, "n_tokens": 3,
                   "chunk_text": "a b c"}]


def test_chunk_documents_empty_batch():
    b = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = chunk_documents_batch(b)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "chunk_idx", "n_tokens",
                                "chunk_text"]


def test_pack_greedy_planted(ray_session):
    import ray.data

    from sylk.stages.text import pack_greedy

    rows = [
        # key g: 100+300 fit (400<=512), 200 overflows -> new bin;
        # 600 oversized -> own bin; 50 follows
        {"k": "g", "i": 1, "nt": 100}, {"k": "g", "i": 2, "nt": 300},
        {"k": "g", "i": 3, "nt": 200}, {"k": "g", "i": 4, "nt": 600},
        {"k": "g", "i": 5, "nt": 50},
        # key h: exact fit boundary
        {"k": "h", "i": 1, "nt": 512}, {"k": "h", "i": 2, "nt": 1},
    ]
    ds = ray.data.from_items(rows)
    out = pack_greedy(ds, key_cols=["k"], order_cols=["i"],
                      token_col="nt", capacity=512)
    got = {(r["k"], r["i"]): r["bin_idx"] for r in out.take_all()}
    assert got == {("g", 1): 0, ("g", 2): 0, ("g", 3): 1, ("g", 4): 2,
                   ("g", 5): 3, ("h", 1): 0, ("h", 2): 1}

"""HyperLogLog sketch: accuracy vs exact, and merge associativity."""

import numpy as np
import pyarrow as pa

from sylk.stages.sketch import (
    approx_distinct,
    hll_estimate,
    hll_merge,
    hll_partial,
)


def test_small_range_is_near_exact():
    vals = np.array([f"host{i:02d}" for i in range(50)] * 100, dtype=object)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 50) < 2  # linear-counting regime


def test_large_range_within_relative_error():
    rng = np.random.default_rng(7)
    n = 120_000
    vals = np.array([f"v{i}" for i in rng.integers(0, 10**12, n)], dtype=object)
    exact = len(set(vals))
    est = hll_estimate(hll_partial(vals))
    assert abs(est - exact) / exact < 0.05  # ~1.04/sqrt(1024) = 3.25% expected


def test_merge_equals_single_pass():
    vals = np.array([f"x{i}" for i in range(30_000)], dtype=object)
    whole = hll_partial(vals)
    parts = [hll_partial(vals[i::7]) for i in range(7)]
    merged = hll_merge(parts)
    assert np.array_equal(whole, merged)
    # idempotent + order-insensitive
    assert np.array_equal(hll_merge([merged, parts[0]]), merged)
    assert np.array_equal(hll_merge(reversed(parts)), merged)


def test_approx_distinct_dataset(ray_session):
    import ray.data

    n = 40_000
    tbl = pa.table({"k": pa.array([f"key{i % 9000}" for i in range(n)])})
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = approx_distinct(ds, "k")
    assert abs(out["estimate"] - 9000) / 9000 < 0.05


def test_count_min_bounds(ray_session):
    """CM estimates never undercount; overcount bounded by eps*N; top
    zipf keys recovered in order."""
    import numpy as np
    import ray.data

    from sylk.stages.sketch import _CM_W, cm_estimate, cm_partial, heavy_hitters

    rng = np.random.default_rng(5)
    zipf = np.clip(rng.zipf(1.5, 30_000), 1, 5000)
    vals = np.array([f"key{z}" for z in zipf], dtype=object)
    uniq, true = np.unique(vals, return_counts=True)
    cm = cm_partial(vals)
    est = cm_estimate(cm, uniq)
    assert (est >= true.astype(np.uint64)).all()
    eps_n = np.e / _CM_W * len(vals)
    assert (est.astype(np.int64) - true <= max(3 * eps_n, 10)).all()

    ds = ray.data.from_items([{"h": v} for v in vals],
                             override_num_blocks=8)
    hh = heavy_hitters(ds, "h", k=5)
    true_top = uniq[np.argsort(-true, kind="stable")[:5]].tolist()
    assert [h["key"] for h in hh][:3] == true_top[:3]
    by_key = dict(zip(uniq, true))
    for h in hh:
        assert h["est"] >= by_key[h["key"]]

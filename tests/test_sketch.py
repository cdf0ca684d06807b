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

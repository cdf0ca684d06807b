"""quantile_sketch and grouped_centroid_sums: error-bound and
exactness tests."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def test_quantile_sketch_rank_bound(ray_session):
    import ray.data

    from sylk.stages.sketch import quantile_sketch

    rng = np.random.default_rng(23)
    n = 50_000
    vals = rng.lognormal(0, 1.0, n)
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(8)
    qs = [0.1, 0.5, 0.95]
    sk = quantile_sketch(ds, "v", "id", qs)
    assert sk["n"] == n and sk["sample_size"] <= 4096
    for q in qs:
        eps = 3.0 * math.sqrt(q * (1 - q) / sk["sample_size"]) + 2.0 / sk["sample_size"]
        assert abs(sk["ranks"][q] / n - q) <= eps, (q, sk["ranks"][q] / n)
        # and the estimate is near the true quantile in VALUE space too
        true = np.quantile(vals, q)
        assert abs(sk["estimates"][q] - true) / true < 0.25


def test_quantile_sketch_small_input_is_exact(ray_session):
    import ray.data

    from sylk.stages.sketch import quantile_sketch

    vals = [float(i) for i in range(100)]
    t = pa.table({"id": pa.array(range(100), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    sk = quantile_sketch(ray.data.from_arrow(t).repartition(4), "v", "id",
                         [0.5])
    # n <= sample: the sketch IS quantile_disc of the full data
    # (rank max(1, ceil(0.5*100)) = 50 -> value 49.0)
    assert sk["estimates"][0.5] == 49.0
    assert sk["sample_size"] == 100


def test_grouped_centroid_sums_partition_invariant(ray_session):
    import ray.data

    from sylk.stages.similarity import grouped_centroid_sums

    rng = np.random.default_rng(31)
    n, d = 500, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, 4, n)
    t = pa.table({"label": pa.array(labels, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    out1 = grouped_centroid_sums(
        ray.data.from_arrow(t).repartition(2)).to_pandas()
    out2 = grouped_centroid_sums(
        ray.data.from_arrow(t).repartition(13)).to_pandas()
    k = ["label", "dim"]
    pd.testing.assert_frame_equal(
        out1.sort_values(k).reset_index(drop=True),
        out2.sort_values(k).reset_index(drop=True), check_dtype=False)
    # integer-exact vs a single-frame reference
    q = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    for lab in range(4):
        m = labels == lab
        ref = q[m].sum(axis=0)
        got = out1[out1.label == lab].sort_values("dim")
        assert got.sum_q.tolist() == ref.tolist()
        assert (got.n == m.sum()).all()

"""topk_per_group / grouped_quantiles / exact_distinct_count edge cases."""

import duckdb
import pandas as pd
import pytest

from sylk.stages.aggregate import (exact_distinct_count, grouped_quantiles,
                                   topk_per_group)


def test_topk_tie_break_deterministic(ray_session):
    import ray.data

    counts = ray.data.from_items([
        {"g": "h1", "app": "zz", "n": 5},
        {"g": "h1", "app": "aa", "n": 5},   # tie with zz -> aa ranks first
        {"g": "h1", "app": "mm", "n": 9},
        {"g": "h1", "app": "qq", "n": 1},
        {"g": "h2", "app": "solo", "n": 2},  # group smaller than k
    ])
    out = topk_per_group(counts, ["g"], "n", 3, tie_cols=["app"]).to_pandas()
    h1 = out[out.g == "h1"].sort_values("rank")
    assert list(h1.app) == ["mm", "aa", "zz"]
    assert list(h1["rank"]) == [1, 2, 3]
    h2 = out[out.g == "h2"]
    assert list(h2.app) == ["solo"] and list(h2["rank"]) == [1]


@pytest.mark.parametrize("qs", [[0.5, 0.9, 0.99], [0.0, 1.0], [0.75]])
def test_grouped_quantiles_match_duckdb(ray_session, qs):
    import ray.data

    rows = []
    # heavily duplicated values, a singleton group, an all-equal group
    for i in range(137):
        rows.append({"k": "a", "v": (i * 7) % 13})
    rows.append({"k": "single", "v": 42})
    for i in range(50):
        rows.append({"k": "const", "v": 5})
    ds = ray.data.from_items(rows, override_num_blocks=4)
    names = [f"q{int(q*100)}" for q in qs]
    got = grouped_quantiles(ds, "k", "v", qs, names).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    df = pd.DataFrame(rows)
    sel = ", ".join(f"quantile_disc(v, {q}) AS q{int(q*100)}" for q in qs)
    want = duckdb.sql(f"SELECT k, {sel} FROM df GROUP BY 1 ORDER BY k").df()
    pd.testing.assert_frame_equal(got[["k"] + names], want[["k"] + names],
                                  check_dtype=False)


def test_exact_distinct_count(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"h": f"host{i % 17}"} for i in range(400)], override_num_blocks=8)
    assert exact_distinct_count(ds, "h") == 17

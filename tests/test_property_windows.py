"""Seeded randomized differentials for the cross-block carry operators:
fill_forward / running_total / gap_sessions vs single-frame pandas
references, across random key skew, null patterns, and block layouts."""

import numpy as np
import pandas as pd
import pytest

SEEDS = [3, 17, 88, 2026]


def _random_frame(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    df = pd.DataFrame({
        "k": rng.integers(0, int(rng.integers(1, 8)) + 1, n),
        "o": rng.permutation(n),  # unique order -> total order per key
        "v": rng.integers(0, 50, n).astype("float64"),
    })
    # null out a random subset of v (for ffill) — keep ints elsewhere
    mask = rng.random(n) < 0.6
    df.loc[mask, "v"] = np.nan
    return df, int(rng.integers(1, 9))


@pytest.mark.parametrize("seed", SEEDS)
def test_fill_forward_random(ray_session, seed):
    import ray.data

    from sylk.stages.asof import fill_forward

    df, blocks = _random_frame(seed)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = fill_forward(ds, "k", ["o"], "v", "ff").to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    ref["ff"] = ref.groupby("k")["v"].ffill()
    pd.testing.assert_series_equal(got["ff"], ref["ff"], check_names=False)


@pytest.mark.parametrize("seed", SEEDS)
def test_running_total_random(ray_session, seed):
    import ray.data

    from sylk.stages.asof import running_total

    df, blocks = _random_frame(seed)
    df["v"] = df["v"].fillna(0.0)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = running_total(ds, "k", ["o"], "v", "rt").to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    ref["rt"] = ref.groupby("k")["v"].cumsum()
    pd.testing.assert_series_equal(got["rt"], ref["rt"], check_names=False)


@pytest.mark.parametrize("seed", SEEDS)
def test_gap_sessions_random(ray_session, seed):
    import ray.data

    from sylk.stages.sessionize import gap_sessions

    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 300))
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n).astype("int64"),
        "t": rng.integers(0, 5000, n).astype("int64"),
    })
    gap = int(rng.integers(10, 400))
    ds = ray.data.from_pandas(df).repartition(int(rng.integers(1, 7)))
    got = gap_sessions(ds, "k", "t", gap=gap).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    def _ref(g):
        t = np.sort(g["t"].to_numpy())
        breaks = int((np.diff(t) > gap).sum())
        return pd.Series({"n_sessions": breaks + 1, "n_events": len(t)})

    ref = df.groupby("k").apply(_ref, include_groups=False).reset_index() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "n_sessions", "n_events"]].astype("int64"),
        ref[["k", "n_sessions", "n_events"]].astype("int64"))

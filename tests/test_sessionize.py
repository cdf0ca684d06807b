"""Skew-safe sessionize: a deliberately hot conversation (60% of rows)
is processed in bounded per-task chunks, and the chunk-merge output is
identical to the naive whole-group computation."""

import numpy as np
import pandas as pd

from sylk.stages.sessionize import session_chunks, sessionize


def _hot_corpus(n=20000, hot_frac=0.6):
    rng = np.random.default_rng(5)
    conv = np.where(
        rng.random(n) < hot_frac,
        "conv-hot",
        np.char.add("conv-", rng.integers(0, 50, n).astype(str)),
    )
    return pd.DataFrame({
        "conv_id": conv,
        "turn_idx": np.arange(n, dtype=np.int64),
        "text": np.char.add("line-", np.arange(n).astype(str)),
    })


def _naive(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")
        .agg(
            n_turns=("turn_idx", "size"),
            first_turn=("turn_idx", "min"),
            last_turn=("turn_idx", "max"),
            transcript=("text", lambda s: "\n".join(s)),
        )
        .sort_index()
    )


def test_sessionize_hot_conv_split_and_correct(ray_session):
    import ray.data

    df = _hot_corpus()
    ds = ray.data.from_pandas(df).repartition(16)
    # phase-1 proof: no single task saw all of the hot conversation's
    # rows — it arrives as multiple per-block chunks
    chunks = session_chunks(ds.sort(["conv_id", "turn_idx"])).to_pandas()
    assert (chunks.conv_id == "conv-hot").sum() > 1
    # sum of chunk sizes = total rows (nothing lost at block boundaries)
    assert chunks.n_turns.sum() == len(df)

    out = (
        sessionize(ds)
        .to_pandas()
        .astype({"n_turns": "int64", "first_turn": "int64", "last_turn": "int64"})
        .set_index("conv_id")
        .sort_index()
    )
    want = _naive(df)
    pd.testing.assert_frame_equal(out, want)


def test_sessionize_single_block(ray_session):
    """Degenerate layout (everything in one block) still works."""
    import ray.data

    df = _hot_corpus(n=500)
    out = (
        sessionize(ray.data.from_pandas(df))
        .to_pandas()
        .astype({"n_turns": "int64", "first_turn": "int64", "last_turn": "int64"})
        .set_index("conv_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, _naive(df))

"""Skew-safe sessionization: reconstruct per-conversation transcripts in
turn order without ever holding one conversation's ROWS in one task.

The r1 shape (``groupby(conv_id).map_groups`` over raw turns) put an
entire conversation in a single task's heap — the transcript corpus is
deliberately skewed (8 hot conversations carry ~15% of rows,
sylk/sources/transcripts.py), and at 10^12 turns a hot conversation is
an OOM.  The streaming shape here:

1. ``sort((conv_id, turn_idx))`` — one range-partitioned exchange; each
   output block is globally ordered, so a conversation occupies a run of
   consecutive rows spanning one or more adjacent blocks.
2. per-BLOCK segmented reduce (``map_batches``): collapse each
   conversation run inside the block to ONE chunk row
   (n_turns / first_turn / last_turn / joined text).  Task memory is
   bounded by the block size regardless of conversation size.
3. ``groupby(conv_id).map_groups`` over the CHUNK rows: a conversation
   contributes at most #blocks-it-spans chunks; re-join them in
   first_turn order.  Final task memory = O(output transcript), which is
   the size of the result row itself — the inherent floor.

The order-sensitive ``string_agg(ORDER BY turn_idx)`` oracle
(``conversations`` in the driver contract) pins the end-to-end ordering
through both exchanges.
"""

from __future__ import annotations

import pandas as pd


def _empty_chunks(key: str) -> pd.DataFrame:
    return pd.DataFrame({
        key: pd.Series([], dtype="object"),
        "n_turns": pd.Series([], dtype="int64"),
        "first_turn": pd.Series([], dtype="int64"),
        "last_turn": pd.Series([], dtype="int64"),
        "chunk": pd.Series([], dtype="object"),
    })


def session_chunks(sorted_ds, key: str = "conv_id", order: str = "turn_idx",
                   text_col: str = "text"):
    """Phase 2: per-block chunk rows over a dataset already sorted by
    (key, order).  Exposed separately so tests can assert a hot
    conversation really is split across chunks."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty_chunks(key)
        grp = df.groupby(key, sort=False)
        out = grp.agg(
            n_turns=(order, "size"),
            first_turn=(order, "min"),
            last_turn=(order, "max"),
            chunk=(text_col, lambda s: "\n".join(s)),
        ).reset_index()
        return out.astype({"n_turns": "int64", "first_turn": "int64",
                           "last_turn": "int64"})

    return sorted_ds.map_batches(_partial, batch_format="pandas",
                                 batch_size=None)


def sessionize(ds, key: str = "conv_id", order: str = "turn_idx",
               text_col: str = "text"):
    """Dataset[(key, order, text)] -> Dataset[(key, n_turns, first_turn,
    last_turn, transcript)] with transcript = texts joined by newline in
    ``order``."""
    chunks = session_chunks(ds.sort([key, order]), key, order, text_col)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("first_turn", kind="mergesort")
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_turns": [int(g["n_turns"].sum())],
            "first_turn": [int(g["first_turn"].min())],
            "last_turn": [int(g["last_turn"].max())],
            "transcript": ["\n".join(g["chunk"])],
        })

    return chunks.groupby(key).map_groups(_merge, batch_format="pandas")


# --- gap-based sessions (inactivity windows) --------------------------------

def gap_sessions(ds, key: str = "user_id", t_col: str = "t",
                 gap: int = 1800):
    """Split each key's event stream into sessions at inactivity gaps
    > ``gap`` seconds -> Dataset[(key, n_sessions, n_events)].

    Same skew-safe streaming shape as :func:`sessionize`: sort by
    (key, t) once, collapse each key's run inside every block to ONE
    chunk row (events, first/last t, session breaks WITHIN the chunk),
    then merge the per-block chunks — a key contributes at most
    #blocks-it-spans rows to the final groupby, so a hot key never
    materializes its raw events in one task.  Session count is
    tie-order-insensitive (equal timestamps give gap 0)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: pd.Series([], dtype=df[key].dtype),
                "n_events": pd.Series([], dtype="int64"),
                "first_t": pd.Series([], dtype="int64"),
                "last_t": pd.Series([], dtype="int64"),
                "breaks": pd.Series([], dtype="int64"),
            })
        brk = (df[t_col].diff() > gap) & (df[key] == df[key].shift())
        g = df.assign(_brk=brk).groupby(key, sort=False)
        out = g.agg(n_events=(t_col, "size"), first_t=(t_col, "min"),
                    last_t=(t_col, "max"), breaks=("_brk", "sum")).reset_index()
        return out.astype({"n_events": "int64", "first_t": "int64",
                           "last_t": "int64", "breaks": "int64"})

    chunks = ds.sort([key, t_col]).map_batches(
        _partial, batch_format="pandas", batch_size=None)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("first_t", kind="mergesort")
        boundary = (g["first_t"].to_numpy()[1:]
                    - g["last_t"].to_numpy()[:-1] > gap).sum()
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_sessions": [int(g["breaks"].sum() + boundary + 1)],
            "n_events": [int(g["n_events"].sum())],
        })

    return chunks.groupby(key).map_groups(_merge, batch_format="pandas")

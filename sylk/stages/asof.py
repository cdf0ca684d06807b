"""Fill-forward (as-of) operator: carry the last non-null value forward
within each key's ordered stream — the streaming equivalent of an as-of
self-join (``last_value(... IGNORE NULLS) OVER (PARTITION BY key ORDER
BY order ROWS UNBOUNDED PRECEDING)``).

Skew-safe two-pass shape (a hot key never occupies one task's heap):

1. ``sort((key, *order))`` + ``materialize()`` — the sort is the one
   all-to-all; materializing pins the block boundaries so both passes
   see IDENTICAL key-runs (blocks live in the object store and spill,
   they are not driver memory).
2. pass A (``map_batches``): per block emit one STATE row per key-run —
   (key, first order tuple, last non-null value in the run).  O(keys
   per block) rows total.
3. driver: order the state rows per key and compute each run's SEED =
   last non-null value among that key's EARLIER runs (a groupby-shift-
   ffill over #blocks x keys-per-block rows); broadcast the seed dict
   once (``ray.put``).
4. pass B (``map_batches``): in-block vectorized ffill per key-run,
   null prefix rows take the run's seed.

Determinism: the order columns must be a total order per key (include a
unique tiebreaker column, e.g. event_id) — the same requirement the SQL
window needs to be deterministic.

Scale bound: driver/broadcast state is O(#blocks + #keys) SEED rows
(sorted data keeps each key's runs contiguous, so a key contributes
~spanned-blocks entries).  That holds to ~10^8 keys; beyond it the
documented alternative is fully distributed — compute per-run seeds
with ``groupby(key).map_groups`` over the state rows, stamp each row's
run-first-order in pass B, and hash-join rows with seeds on
(key, first-order) instead of broadcasting (one extra exchange of the
full dataset; the same trade the dedup edge-join makes).
"""

from __future__ import annotations

import pandas as pd


def _run_key(df: pd.DataFrame, key: str, order_cols) -> pd.DataFrame:
    """First order-tuple per key-run in this (sorted) block."""
    firsts = df.groupby(key, sort=False)[order_cols].first().reset_index()
    return firsts


def fill_forward(ds, key: str, order_cols, value_col: str, out_col: str):
    """Dataset -> same rows + ``out_col`` = last non-null ``value_col``
    at or before each row in (key, order) order."""
    import ray

    order_cols = list(order_cols)

    sorted_ds = ds.sort([key] + order_cols).materialize()

    def _state(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 **{c: pd.Series([], dtype=df[c].dtype)
                                    for c in order_cols},
                                 "_last": pd.Series([], dtype="float64")})
        firsts = _run_key(df, key, order_cols)
        last = df.groupby(key, sort=False)[value_col] \
                 .agg(lambda s: s.dropna().iloc[-1] if s.notna().any() else None)
        firsts["_last"] = firsts[key].map(last)
        return firsts

    # state rows are O(#blocks x keys-per-block) — small by design
    states = sorted_ds.map_batches(_state, batch_format="pandas",
                                   batch_size=None).to_pandas()
    states = states.sort_values([key] + order_cols, kind="mergesort")
    # seed for each run = last non-null _last of the SAME key's earlier runs
    states["_seed"] = states.groupby(key, sort=False)["_last"] \
        .transform(lambda s: s.shift().ffill())
    cols = [key] + order_cols
    seed = dict(zip(map(tuple, states[cols].to_numpy()), states["_seed"]))
    seed_ref = ray.put(seed)

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(**{out_col: pd.Series([], dtype="float64")})
        lookup = ray.get(seed_ref)
        filled = df.groupby(key, sort=False)[value_col].ffill()
        firsts = _run_key(df, key, order_cols)
        run_seed = {k: lookup.get(tuple(row))
                    for k, row in zip(firsts[key],
                                      firsts[[key] + order_cols].to_numpy())}
        seeds = df[key].map(run_seed)
        return df.assign(**{out_col: filled.fillna(seeds)})

    return sorted_ds.map_batches(_fill, batch_format="pandas",
                                 batch_size=None)


def running_total(ds, key: str, order_cols, value_col: str, out_col: str):
    """Per-key running total in (key, order) order — ``SUM(value) OVER
    (PARTITION BY key ORDER BY order ROWS UNBOUNDED PRECEDING)``.

    Same skew-safe two-pass carry as :func:`fill_forward`, with an
    ADDITIVE seed: pass A emits one (key, first-order, block-sum) state
    row per key-run; the driver prefix-sums each key's earlier runs to a
    scalar seed per run; pass B adds the seed to the in-block cumsum.
    Same scale bound as fill_forward (O(#blocks + #keys) seed rows)."""
    import ray

    order_cols = list(order_cols)
    sorted_ds = ds.sort([key] + order_cols).materialize()

    def _state(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 **{c: pd.Series([], dtype=df[c].dtype)
                                    for c in order_cols},
                                 "_sum": pd.Series([], dtype="float64")})
        firsts = _run_key(df, key, order_cols)
        sums = df.groupby(key, sort=False)[value_col].sum()
        firsts["_sum"] = firsts[key].map(sums)
        return firsts

    states = sorted_ds.map_batches(_state, batch_format="pandas",
                                   batch_size=None).to_pandas()
    states = states.sort_values([key] + order_cols, kind="mergesort")
    states["_seed"] = states.groupby(key, sort=False)["_sum"] \
        .transform(lambda s: s.cumsum().shift()).fillna(0)
    cols = [key] + order_cols
    seed = dict(zip(map(tuple, states[cols].to_numpy()), states["_seed"]))
    seed_ref = ray.put(seed)

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(**{out_col: pd.Series([], dtype="float64")})
        lookup = ray.get(seed_ref)
        cum = df.groupby(key, sort=False)[value_col].cumsum()
        firsts = _run_key(df, key, order_cols)
        run_seed = {k: lookup.get(tuple(row), 0)
                    for k, row in zip(firsts[key],
                                      firsts[[key] + order_cols].to_numpy())}
        return df.assign(**{out_col: cum + df[key].map(run_seed)})

    return sorted_ds.map_batches(_fill, batch_format="pandas",
                                 batch_size=None)

"""Ordered conversion funnels over event streams.

Strict sequential funnel semantics (product analytics / agent-trace
step analysis): a key reaches stage ``i`` when it has a step-``i``
event strictly AFTER its stage-``i-1`` time, and the EARLIEST such
event defines the stage time (first-touch attribution).  Stage 0 is
the earliest step-0 event unconditionally.

Shape, chosen for the 100-TB case: one keyed grouped-MIN per step over
a successively SHRINKING frontier (stage-i candidates are an inner
hash join of the step-i event slice against the stage-(i-1) frontier,
so each step's exchange is bounded by the previous step's survivors),
never a per-key window sort over the full stream and never per-key
driver state.  Every grouped MIN runs a per-block pyarrow C++ partial
before the shuffle — the exchange moves O(blocks × distinct keys)
partial rows, not every event (the combiner rule from
sylk/stages/aggregate.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Min

from .join import hash_join


def grouped_min(ds, key: str, val: str, alias: str):
    """Keyed MIN with per-block partials before the keyed shuffle."""

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key: pa.array([], b.column(key).type),
                             alias: pa.array([], b.column(val).type)})
        t = pa.table({key: b.column(key), val: b.column(val)})
        g = t.group_by(key).aggregate([(val, "min")])
        return g.rename_columns([key, alias])

    return (ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(key).aggregate(Min(alias, alias_name=alias)))


def _step_slice(ds, step_col: str, step: str):
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b.column(step_col), pa.scalar(step))),
        batch_format="pyarrow", batch_size=None)


def funnel_stages(events_ds, steps, key: str = "user_id",
                  step_col: str = "event_type", t_col: str = "t_us",
                  sentinel: int = -1):
    """Dataset[(key, step_col, t_col:int64, ...)] -> one row per key:
    ``(key, stage, t_<step0>, t_<step1>, ...)`` where ``stage`` counts
    completed steps and unreached stage times carry ``sentinel``
    (keeps the column int64 — no null→NaN dtype drift).

    Every key that appears in the stream gets a row (stage 0 = entered
    the stream but never performed ``steps[0]``).
    """
    t_names = [f"t_{s}" for s in steps]
    step0, t0 = steps[0], t_names[0]

    # fused first pass: key universe (first-touch MIN over ALL events)
    # AND the unconditional step-0 MIN come from ONE scan + ONE keyed
    # reduce — the step-0 time is the MIN of a null-masked copy of the
    # time column (min ignores nulls on both the pyarrow partial and
    # the Ray reduce)
    def _partial0(b: pa.Table) -> pa.Table:
        t = b.column(t_col)
        mask = pc.equal(b.column(step_col), pa.scalar(step0))
        tv = pc.if_else(mask, t, pa.scalar(None, t.type))
        tbl = pa.table({key: b.column(key), "t_first": t, t0: tv})
        g = tbl.group_by(key).aggregate([("t_first", "min"),
                                         (t0, "min")])
        return g.rename_columns([key, "t_first", t0])

    # Each frontier feeds TWO consumers (the next step's join and the
    # assembly left-join); Ray re-executes shared lineage per consumer,
    # so pin the per-key tables in the object store once.  They are
    # bounded by key cardinality (one row per surviving key — the
    # aggregate result, never the event stream), which is exactly what
    # an object-store checkpoint is for at scale.
    out = (events_ds.map_batches(_partial0, batch_format="pyarrow",
                                 batch_size=None)
           .groupby(key).aggregate(Min("t_first", alias_name="t_first"),
                                   Min(t0, alias_name=t0))
           ).materialize()

    frontier = out.map_batches(
        lambda b: b.filter(pc.is_valid(b.column(t0))).select([key, t0]),
        batch_format="pyarrow", batch_size=None)
    for i, step in enumerate(steps[1:], start=1):
        ev = _step_slice(events_ds, step_col, step)
        prev = t_names[i - 1]
        j = hash_join(ev, frontier, on=(key,))
        after = j.map_batches(
            lambda b, _p=prev: b.filter(
                pc.greater(b.column(t_col), b.column(_p))),
            batch_format="pyarrow", batch_size=None)
        frontier = grouped_min(after, key, t_col,
                               t_names[i]).materialize()
        out = hash_join(out, frontier.select_columns([key, t_names[i]]),
                        on=(key,), join_type="left_outer")

    def _finish(b: pa.Table) -> pa.Table:
        n = b.num_rows
        stage = np.zeros(n, np.int64)
        cols = {key: b.column(key)}
        for name in t_names:
            v = b.column(name)
            stage += pc.is_valid(v).to_numpy(zero_copy_only=False)
            cols[name] = pc.fill_null(pc.cast(v, pa.int64()),
                                      pa.scalar(sentinel, pa.int64()))
        cols["stage"] = pa.array(stage)
        return pa.table(cols)

    return out.map_batches(_finish, batch_format="pyarrow",
                           batch_size=None)

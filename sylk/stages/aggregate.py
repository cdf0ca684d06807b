"""Aggregate stages: per-sink counts and histograms, shuffle-light.

Scale design: a bare ``groupby(keys).count()`` shuffles every row.  All
aggregates here are TWO-PHASE — a vectorized per-batch partial count
(pyarrow ``Table.group_by``) runs inside ``map_batches``, so the
all-to-all exchange moves at most (distinct keys per batch) rows per
block, then a small ``groupby().sum`` finalizes.  Hot keys (conversation
skew, one hot facility) are absorbed at the partial stage: a key that
dominates a block still contributes ONE partial row per block.

For group-aggregates whose reducer state is large (not just a count),
``salted_group_counts`` shows the salt pattern: spread one hot key over
``salt`` sub-keys, reduce twice.  Null key values are represented as ""
(unambiguous: parsed terms have min length 1, parser.rs:353-362).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


def _partial_counts(batch: pa.Table, keys, ok_filter: bool | None) -> pa.Table:
    if ok_filter is True:
        batch = batch.filter(batch.column("ok"))
    elif ok_filter is False:
        batch = batch.filter(pc.invert(batch.column("ok")))
    cols = {}
    for k in keys:
        col = batch.column(k)
        if pa.types.is_string(col.type):
            col = pc.fill_null(col, "")
        cols[k] = col
    t = pa.table(cols)
    out = t.group_by(keys).aggregate([([], "count_all")])
    return out.rename_columns(list(keys) + ["n"])


def grouped_counts(parsed_ds, keys, ok_filter: bool | None = None):
    """Two-phase distributed count by ``keys`` -> Dataset[keys..., n]."""
    partials = parsed_ds.map_batches(
        lambda b: _partial_counts(b, keys, ok_filter),
        batch_format="pyarrow",
        batch_size=None,
    )
    return partials.groupby(list(keys)).aggregate(Sum("n", alias_name="n"))


def sink_counts(parsed_ds):
    """Per-(facility, severity) routed message counts (ok rows)."""
    return grouped_counts(parsed_ds, ["facility", "severity"], ok_filter=True)


def reject_counts(parsed_ds):
    """Per-error-variant reject counts (failed rows)."""
    return grouped_counts(parsed_ds, ["error"], ok_filter=False)


def host_app_histogram(parsed_ds):
    """Per-(hostname, appname) histogram over parsed rows; nil terms -> ""."""
    return grouped_counts(parsed_ds, ["hostname", "appname"], ok_filter=True)


# the composite key behind ``combined_counts``: ONE parse pass feeds all
# three north-rule rollups (per-sink counts, reject counts, host/app
# histogram).  Shuffle volume == the host/app histogram's (the widest of
# the three) — the sink/reject rollups ride along for free.
_COMBINED_KEYS = ["ok", "facility", "severity", "error", "hostname", "appname"]


def _partial_combined(batch: pa.Table) -> pa.Table:
    cols = {}
    for k in _COMBINED_KEYS:
        col = batch.column(k)
        if pa.types.is_boolean(col.type):
            col = col.cast(pa.int8())  # groupby-friendly key
        elif pa.types.is_string(col.type):
            col = pc.fill_null(col, "")
        elif pa.types.is_integer(col.type):
            col = pc.fill_null(col, -1)  # facility/severity are never negative
        cols[k] = col
    t = pa.table(cols)
    out = t.group_by(_COMBINED_KEYS).aggregate([([], "count_all")])
    return out.rename_columns(_COMBINED_KEYS + ["n"])


def combined_counts(parsed_ds, distributed: bool = False):
    """Single-execution partial+final count over the composite key ->
    pandas DataFrame.  Use :func:`rollups_from_combined` on the result to
    get the sink / reject / host-app aggregates without re-running the
    pipeline.

    Final merge strategy: per-block partials are (distinct keys per
    block) rows — tiny relative to the input — so by default they stream
    to the driver and merge in one pandas groupby (a tree-reduce whose
    root is small).  When the composite key's global cardinality is too
    large for one machine (host/app histograms over millions of hosts),
    pass ``distributed=True`` to finalize with a Ray groupby shuffle
    instead.
    """
    partials = parsed_ds.map_batches(
        _partial_combined, batch_format="pyarrow", batch_size=None
    )
    if distributed:
        final = partials.groupby(_COMBINED_KEYS).aggregate(Sum("n", alias_name="n"))
        return final.to_pandas()
    pdf = partials.to_pandas()
    return pdf.groupby(_COMBINED_KEYS, as_index=False).n.sum()


def rollups_from_combined(pdf):
    """(sink, reject, host_app) pandas rollups from a combined_counts
    result — each with the same columns the dedicated aggregates emit."""
    ok = pdf[pdf.ok == 1]
    bad = pdf[pdf.ok == 0]
    sink = ok.groupby(["facility", "severity"], as_index=False).n.sum()
    rej = bad.groupby(["error"], as_index=False).n.sum()
    hostapp = ok.groupby(["hostname", "appname"], as_index=False).n.sum()
    return sink, rej, hostapp


def _salt_batch(batch: pa.Table, salt: int) -> pa.Table:
    # the salt must vary WITHIN one key's rows (it spreads a hot key over
    # sub-keys), so it is row-positional, not a function of the key value
    import numpy as np

    return batch.append_column(
        "_salt", pa.array((np.arange(len(batch)) % salt).astype(np.int32))
    )


def salted_group_counts(parsed_ds, key: str, salt: int = 16):
    """Two-round salted aggregate for a skewed key: round 1 reduces
    (key, salt) partials, round 2 merges salts per key.  With count
    partials this is belt-and-suspenders (the batch partial already
    absorbs skew); the pattern matters for heavy reducer state."""
    partials = parsed_ds.map_batches(
        lambda b: _partial_counts(_salt_batch(b, salt), [key, "_salt"], True),
        batch_format="pyarrow",
        batch_size=None,
    )
    round1 = partials.groupby([key, "_salt"]).aggregate(Sum("n", alias_name="n"))
    return round1.groupby(key).aggregate(Sum("n", alias_name="n"))

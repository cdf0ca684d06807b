"""Log-analytics operators over the syslog stream: template mining
(digit-masked message signatures — the vocabulary step of the
Drain/Spell template-mining family) and per-host rate-spike detection.

Both are two-phase aggregates: per-block partials collapse the stream to
(key -> partial) rows before any exchange, so the shuffle moves
O(blocks x distinct templates / host-hours), never raw rows — at 100 TB
the exchange is bounded by key cardinality, not data size.

Reference anchor: templates are computed over the same constructed
RFC 5424 lines the parse family consumes (sylk/sources/transcripts.py),
so the DuckDB oracle replays the masking with ``regexp_replace`` —
both engines run RE2 on the identical ``[0-9]+`` pattern, making the
masked strings bit-identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Min, Sum

# ASCII digit runs only ([0-9]+, not \d+): RE2's \d is ASCII-only but
# Python re's \d is unicode — the explicit class is the parity-safe
# spelling on both engines.
_DIGIT_RUN = "[0-9]+"
_MASK = "#"


def mask_templates_batch(tbl: pa.Table, text_col: str = "text",
                         out_col: str = "template") -> pa.Table:
    """Append the digit-masked template of ``text_col`` (vectorized RE2
    replace; capture-free pattern keeps the DFA fast path)."""
    masked = pc.replace_substring_regex(
        tbl.column(text_col), pattern=_DIGIT_RUN, replacement=_MASK)
    return tbl.append_column(out_col, masked)


def log_templates(ds, text_col: str = "text", order_col: str = "turn_idx"):
    """Template mining: mask digit runs, then count occurrences and
    record the earliest ``order_col`` per template.

    -> Dataset[(template, n, first_turn)].  Two-phase: each block
    collapses to its distinct templates (pyarrow C++ group_by) before
    the keyed exchange, so the shuffle is O(blocks x templates).
    """

    def _partial(b: pa.Table) -> pa.Table:
        b = mask_templates_batch(b, text_col)
        g = (b.select(["template", order_col])
              .group_by("template")
              .aggregate([(order_col, "min"), (order_col, "count")]))
        return g.rename_columns(["template", "first_turn", "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    return partials.groupby("template").aggregate(
        Sum(on="n", alias_name="n"),
        Min(on="first_turn", alias_name="first_turn"),
    )


def rate_spikes(ds, key: str = "hostname", window_col: str = "hour",
                factor: int = 2):
    """Flag (key, window) buckets whose count exceeds ``factor`` x the
    key's mean bucket count — integer-exact (``n * n_windows >
    factor * total``, no float rate), so the SQL oracle is bit-identical.

    -> Dataset[(key, window, n, key_total, key_windows)] (spikes only).

    Shape: one two-phase count to the (key, window) grain, a second
    keyed aggregate over those reduced rows for per-key totals, then a
    hash join of the two reduced tables.  Both exchanges move reduced
    rows only; the join partitions scale with data size
    (join._size_based_partitions), never with raw stream rows.
    """
    from .aggregate import grouped_counts
    from .join import hash_join

    per_window = grouped_counts(ds, [key, window_col])
    totals = per_window.groupby(key).aggregate(
        Sum(on="n", alias_name="key_total"),
        Count(alias_name="key_windows"),
    )
    joined = hash_join(per_window, totals, on=key)

    def _flag(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.int64())
        lhs = pc.multiply(n, pc.cast(b.column("key_windows"), pa.int64()))
        rhs = pc.multiply(pa.scalar(factor, pa.int64()),
                          pc.cast(b.column("key_total"), pa.int64()))
        return b.filter(pc.greater(lhs, rhs))

    return joined.map_batches(_flag, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

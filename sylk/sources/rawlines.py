"""Raw syslog text-file source.

The reference crate's native input is a stream of bare RFC 5424 lines
(its README example reads UDP datagrams, ``lib.rs:13-25``); this source
feeds the same shape from plain ``.log`` text files so every downstream
stage (parse -> enrich -> route -> aggregate) runs unchanged on either
parquet transcripts or raw log files.

``ray.data.read_text`` yields one row per line in a ``text`` column —
already the exact column the parse chain keys on.  Line order within a
file is preserved per block; ``line_id`` (stable hash of the line
content + a per-batch disambiguator) can be stamped on demand for
dedup/resume keys, mirroring how the transcript source derives ids.
"""

from __future__ import annotations

import pyarrow as pa


def read_syslog_lines(paths, include_line_hash: bool = False):
    """Text file(s) of raw RFC 5424 lines -> Dataset[(text[, line_h])]
    ready for ``parse_batch``.  Reads stream block-by-block (never a
    whole file in one task unless it is one block)."""
    import ray.data

    # empty lines ARE records (they parse to ExpectedTokenErr),
    # so don't let read_text silently drop them
    ds = ray.data.read_text(paths, drop_empty_lines=False)
    if not include_line_hash:
        return ds

    def _stamp(b: pa.Table) -> pa.Table:
        from ..stages.sample import content_hash64

        h = content_hash64(b.column("text"))
        return b.append_column("line_h", pa.array(h.astype("int64"),
                                                  pa.int64()))

    return ds.map_batches(_stamp, batch_format="pyarrow", batch_size=None)


def read_syslog_lines_gz(paths):
    """Gzip-compressed ``.log.gz`` files of raw RFC 5424 lines — the
    shape rotated syslog archives actually ship in.  Same output as
    :func:`read_syslog_lines`; decompression streams inside the read
    tasks (``arrow_open_stream_args``), never on the driver."""
    import ray.data

    return ray.data.read_text(
        paths, drop_empty_lines=False,
        arrow_open_stream_args={"compression": "gzip"})


def read_events_jsonl(paths):
    """Newline-delimited-JSON events source (the export format most log
    shippers emit): one JSON object per line with the events-table
    fields; ``ts`` arrives as ISO-8601 text and is restored to
    timestamp[us] so the transcript/parse chain runs unchanged."""
    import ray.data

    ds = ray.data.read_json(paths)

    def _restore(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        if not pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        idx = b.schema.get_field_index("ts")
        return b.set_column(idx, "ts", ts)

    return ds.map_batches(_restore, batch_format="pyarrow",
                          batch_size=None)


def read_events_csv(paths):
    """CSV events source (the lowest-common-denominator export format).
    One header row per file; ``ts`` arrives as ISO-8601 text and is
    restored to timestamp[us].  Parsing streams inside the read tasks
    (pyarrow's C++ CSV reader per block), never on the driver."""
    import ray.data

    ds = ray.data.read_csv(paths)

    def _restore(b: pa.Table) -> pa.Table:
        if "ts" in b.schema.names:
            ts = b.column("ts")
            if not pa.types.is_timestamp(ts.type):
                ts = ts.cast(pa.timestamp("us"))
            b = b.set_column(b.schema.get_field_index("ts"), "ts", ts)
        return b

    return ds.map_batches(_restore, batch_format="pyarrow",
                          batch_size=None)

"""Parse stage: one stateless ``map_batches`` transform, Arrow in/out.

Implements P0-P15 of SURVEY.md §2.1 as a batch operator over a string
column: for each line, the full RFC 5424 grammar of the reference
(parser.rs:343-384) is applied; failures never raise — they become
``ok=false`` rows carrying the ``ParseErr`` variant name
(parser.rs:13-45), so one pass cleanly splits into routed and reject
sinks downstream.

Execution shape: ``ds.map_batches(parse_batch, batch_format="pyarrow",
zero_copy_batch=True)`` — stateless tasks, no actor needed (the parser
holds no state).  The input string column is cast to binary zero-copy
(Arrow strings are UTF-8 bytes already) so per-row work operates on
``bytes`` without re-encoding.

Output appends the SURVEY.md §1.4 columns to the input batch:

    ok:bool, error:string, severity:int8, facility:int8, version:int32,
    timestamp:int64, timestamp_nanos:uint32, hostname:string,
    appname:string, procid_pid:int32, procid_name:string, msgid:string,
    sd:string (canonical sorted-key JSON, "{}" when empty),
    msg:string

A vectorized RE2 fast path (``pyarrow.compute.extract_regex``) handles
the common well-formed shape; rows it cannot prove identical (malformed,
SD escapes, unusual timestamps) fall back to the per-row oracle
``sylk.functions.reference_semantics.parse_line``.  A seeded differential
test asserts fast path == oracle on the full generator mixture.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.canonical_json import sd_to_json
from ..functions.reference_semantics import parse_line

PARSE_FIELDS = [
    ("ok", pa.bool_()),
    ("error", pa.string()),
    ("severity", pa.int8()),
    ("facility", pa.int8()),
    ("version", pa.int32()),
    ("timestamp", pa.int64()),
    ("timestamp_nanos", pa.uint32()),
    ("hostname", pa.string()),
    ("appname", pa.string()),
    ("procid_pid", pa.int32()),
    ("procid_name", pa.string()),
    ("msgid", pa.string()),
    ("sd", pa.string()),
    ("msg", pa.string()),
]


def parse_rows(lines: list) -> dict:
    """Parse a list of ``bytes | str | None`` lines into output columns
    (plain dict of Python lists — shared by slow path and tests)."""
    n = len(lines)
    ok = [False] * n
    error = [None] * n
    severity = [None] * n
    facility = [None] * n
    version = [None] * n
    timestamp = [None] * n
    timestamp_nanos = [None] * n
    hostname = [None] * n
    appname = [None] * n
    procid_pid = [None] * n
    procid_name = [None] * n
    msgid = [None] * n
    sd = [None] * n
    msg = [None] * n
    for i, line in enumerate(lines):
        if line is None:
            # a null text cell has no grammar to apply; modeled as the
            # reference's MissingField (parser.rs:37-38)
            error[i] = "MissingField"
            continue
        rec = parse_line(line)
        if not rec["ok"]:
            error[i] = rec["error"]
            continue
        ok[i] = True
        severity[i] = rec["severity"]
        facility[i] = rec["facility"]
        version[i] = rec["version"]
        timestamp[i] = rec["timestamp"]
        timestamp_nanos[i] = rec["timestamp_nanos"]
        hostname[i] = rec["hostname"]
        appname[i] = rec["appname"]
        procid_pid[i] = rec["procid_pid"]
        procid_name[i] = rec["procid_name"]
        msgid[i] = rec["msgid"]
        sd[i] = sd_to_json(rec["sd"])
        msg[i] = rec["msg"]
    return {
        "ok": ok, "error": error, "severity": severity, "facility": facility,
        "version": version, "timestamp": timestamp,
        "timestamp_nanos": timestamp_nanos, "hostname": hostname,
        "appname": appname, "procid_pid": procid_pid,
        "procid_name": procid_name, "msgid": msgid, "sd": sd, "msg": msg,
    }


def parse_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """The map_batches body: append parse-output columns to ``batch``."""
    col = batch.column(text_col)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        # zero-copy reinterpret: Arrow strings are UTF-8 bytes already
        col = col.cast(pa.large_binary() if pa.types.is_large_string(col.type) else pa.binary())
    lines = col.to_pylist()
    cols = parse_rows(lines)
    out = batch
    for name, typ in PARSE_FIELDS:
        out = out.append_column(name, pa.array(cols[name], type=typ))
    return out

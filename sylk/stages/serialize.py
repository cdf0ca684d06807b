"""Serde-JSON stage: full-message canonical JSON, vectorized.

Mirrors the reference's serde serialization surface (message.rs:41-49,
80-84; enum names facility.rs:117-122 / severity.rs:71-76; golden at
message.rs:225-231): struct-field order, enum names as strings, procid
as bare int or string, nulls for absent options, sorted SD keys.

The whole JSON line is assembled with ``pyarrow.compute`` string kernels
(``binary_join_element_wise`` over quoted/escaped fragments) — no Python
loop.  String fields are PRINTUSASCII (33-126) by grammar, so JSON
escaping needs exactly two passes (backslash, double-quote); the
free-text ``msg`` may carry control characters, and rows where it does
fall back to per-row ``json.dumps`` for spec-exact escaping.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.canonical_json import message_to_json
from ..functions.reference_semantics import FACILITY_NAMES, SEVERITY_NAMES

_CTRL_RE = r"[\x00-\x1f]"


def _esc(col):
    """JSON-escape a PRINTUSASCII string column (two vectorized passes)."""
    col = pc.replace_substring(col, "\\", "\\\\")
    return pc.replace_substring(col, '"', '\\"')


def _quoted_or_null(col):
    return pc.if_else(
        pc.is_valid(col),
        pc.binary_join_element_wise('"', _esc(col), '"', ""),
        pa.scalar("null"),
    )


def _int_or_null(col):
    return pc.if_else(
        pc.is_valid(col), pc.cast(col, pa.string()), pa.scalar("null")
    )


def message_json_batch(batch: pa.Table, out: str = "json") -> pa.Table:
    """Append ``out``: canonical serde JSON per ok row (null when failed)."""
    names = {c: batch.column(c) for c in (
        "ok", "severity", "facility", "version", "timestamp",
        "timestamp_nanos", "hostname", "appname", "procid_pid",
        "procid_name", "msgid", "sd", "msg")}
    sev = pc.take(pa.array(SEVERITY_NAMES, pa.string()), names["severity"])
    fac = pc.take(pa.array(FACILITY_NAMES, pa.string()), names["facility"])
    procid = pc.if_else(
        pc.is_valid(names["procid_pid"]),
        pc.cast(names["procid_pid"], pa.string()),
        _quoted_or_null(names["procid_name"]),
    )
    parts = [
        '{"severity":"', sev,
        '","facility":"', fac,
        '","version":', pc.cast(names["version"], pa.string()),
        ',"timestamp":', _int_or_null(names["timestamp"]),
        ',"timestamp_nanos":', _int_or_null(names["timestamp_nanos"]),
        ',"hostname":', _quoted_or_null(names["hostname"]),
        ',"appname":', _quoted_or_null(names["appname"]),
        ',"procid":', procid,
        ',"msgid":', _quoted_or_null(names["msgid"]),
        ',"sd":', names["sd"],
        ',"msg":"', _esc(names["msg"]), '"}',
    ]
    fast = pc.binary_join_element_wise(*parts, "")
    fast = pc.if_else(names["ok"], fast, pa.scalar(None, pa.string()))

    # rows whose msg carries control chars need spec-exact \uXXXX escapes
    ctrl = pc.and_kleene(
        names["ok"], pc.match_substring_regex(names["msg"], _CTRL_RE)
    )
    ctrl_np = pc.fill_null(ctrl, False).to_numpy(zero_copy_only=False)
    if ctrl_np.any():
        import numpy as np

        vals = fast.to_numpy(zero_copy_only=False).astype(object)
        idx = np.flatnonzero(ctrl_np)
        sub = batch.take(pa.array(idx)).to_pylist()
        for i, row in zip(idx, sub):
            rec = dict(row)
            rec["sd"] = json.loads(rec["sd"])
            vals[i] = message_to_json(rec)
        fast = pa.array(vals, pa.string())
    return batch.append_column(out, fast)

"""Canonical JSON emitters mirroring the reference's serde output.

The reference serializes ``StructuredData`` as nested JSON objects whose
keys iterate in BTreeMap (sorted) order (message.rs:55-70, golden at
message.rs:196-206), enums as their ``as_str()`` names (facility.rs:117-122,
severity.rs:71-76), ``ProcId`` as a bare int or string (message.rs:41-49),
and the full message in struct-field order (golden message.rs:225-231).
"""

from __future__ import annotations

import json

from .reference_semantics import FACILITY_NAMES, SEVERITY_NAMES


def sd_to_json(sd: dict) -> str:
    """Compact JSON of the SD map, keys sorted at both levels.

    Matches the serde golden ``{"faa":{"bar":"baz"},"foo":{...}}``
    (message.rs:196-206).
    """
    return json.dumps(sd, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def message_to_json(rec: dict) -> str:
    """Full-message JSON in struct-field order (message.rs:149-161).

    ``rec`` is a ``parse_line`` ok-result.  Matches the serde golden at
    message.rs:225-231 (enum names as strings, nulls for absent options,
    procid as bare int or string, sorted sd keys).
    """
    procid = rec["procid_pid"] if rec["procid_pid"] is not None else rec["procid_name"]
    ordered = {
        "severity": SEVERITY_NAMES[rec["severity"]],
        "facility": FACILITY_NAMES[rec["facility"]],
        "version": rec["version"],
        "timestamp": rec["timestamp"],
        "timestamp_nanos": rec["timestamp_nanos"],
        "hostname": rec["hostname"],
        "appname": rec["appname"],
        "procid": procid,
        "msgid": rec["msgid"],
        "sd": {k: dict(sorted(v.items())) for k, v in sorted(rec["sd"].items())},
        "msg": rec["msg"],
    }
    return json.dumps(ordered, separators=(",", ":"), ensure_ascii=False)

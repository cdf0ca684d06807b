"""SD accessors over the canonical-JSON ``sd`` column.

Mirrors the reference's ``StructuredData`` lookup surface:
``find_tuple(sd_id, param)`` (message.rs:113-128) and
``find_sdid(sd_id)`` (message.rs:131-133), as batch operators.
"""

from __future__ import annotations

import json

import pyarrow as pa


def sd_get_batch(batch: pa.Table, sd_id: str, param: str, out: str = "sd_value") -> pa.Table:
    """Append ``out``: sd[sd_id][param] per row (null when absent)."""
    vals = []
    for s in batch.column("sd").to_pylist():
        if s is None:
            vals.append(None)
            continue
        sub = json.loads(s).get(sd_id)
        vals.append(None if sub is None else sub.get(param))
    return batch.append_column(out, pa.array(vals, pa.string()))


def sd_find_sdid_batch(batch: pa.Table, sd_id: str, out: str = "sd_element") -> pa.Table:
    """Append ``out``: canonical JSON of sd[sd_id] (null when absent)."""
    vals = []
    for s in batch.column("sd").to_pylist():
        if s is None:
            vals.append(None)
            continue
        sub = json.loads(s).get(sd_id)
        vals.append(
            None
            if sub is None
            else json.dumps(sub, sort_keys=True, separators=(",", ":"), ensure_ascii=False)
        )
    return batch.append_column(out, pa.array(vals, pa.string()))

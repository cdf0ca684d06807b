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


def sd_stats_batch(batch: pa.Table) -> pa.Table:
    """Append ``n_sd_elements`` / ``n_sd_params`` / ``sd_is_empty`` —
    the reference's ``len`` / ``is_empty`` / ``Deref`` surface
    (message.rs:72-77, 136-143) over the canonical-JSON ``sd`` column."""
    n_el, n_par, empty = [], [], []
    for s in batch.column("sd").to_pylist():
        if s is None:
            n_el.append(None)
            n_par.append(None)
            empty.append(None)
            continue
        sd = json.loads(s)
        n_el.append(len(sd))
        n_par.append(sum(len(v) for v in sd.values()))
        empty.append(len(sd) == 0)
    batch = batch.append_column("n_sd_elements", pa.array(n_el, pa.int64()))
    batch = batch.append_column("n_sd_params", pa.array(n_par, pa.int64()))
    return batch.append_column("sd_is_empty", pa.array(empty, pa.bool_()))


def sd_set_batch(
    batch: pa.Table, sd_id: str, param: str, value: str, out: str = "sd"
) -> pa.Table:
    """Insert/overwrite ``sd[sd_id][param] = value`` per row — the
    reference's ``entry`` / ``insert_tuple`` mutate surface
    (message.rs:94-110); output stays canonical sorted-key JSON."""
    vals = []
    for s in batch.column("sd").to_pylist():
        if s is None:
            vals.append(None)
            continue
        sd = json.loads(s)
        sd.setdefault(sd_id, {})[param] = value
        vals.append(
            json.dumps(sd, sort_keys=True, separators=(",", ":"), ensure_ascii=False)
        )
    col = pa.array(vals, pa.string())
    if out in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(out), out, col)
    return batch.append_column(out, col)


SD_MAP_TYPE = pa.map_(pa.string(), pa.map_(pa.string(), pa.string()))


def sd_as_map_batch(batch: pa.Table, out: str = "sd_map") -> pa.Table:
    """Append ``out``: the SD column as a typed Arrow
    ``map<string, map<string, string>>`` (SURVEY.md §1.4's typed-map
    representation; the canonical-JSON string stays the shuffle/oracle
    format).  Key order inside the map mirrors the sorted-JSON order,
    matching the reference's BTreeMap iteration (message.rs:55-70)."""
    vals = []
    for s in batch.column("sd").to_pylist():
        if s is None:
            vals.append(None)
            continue
        sd = json.loads(s)
        vals.append([(k, list(v.items())) for k, v in sd.items()])
    return batch.append_column(out, pa.array(vals, SD_MAP_TYPE))


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

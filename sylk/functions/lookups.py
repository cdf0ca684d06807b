"""SD accessors over the canonical-JSON ``sd`` column.

Mirrors the reference's ``StructuredData`` lookup surface:
``find_tuple(sd_id, param)`` (message.rs:113-128) and
``find_sdid(sd_id)`` (message.rs:131-133), as batch operators.

Every accessor runs its ``json.loads`` once per DISTINCT sd string
(dictionary-encode + take — parse.py's `_sd_json_fast` pattern): SD
content repeats heavily in log data (a handful of templates across
millions of rows), so the Python JSON work is O(unique), not O(rows).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def _per_unique(col, fn, out_type):
    """Apply ``fn`` once per distinct string of ``col`` and expand the
    results back to row order (null rows stay null via the dictionary
    indices)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    de = col.dictionary_encode()
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    uniq = [fn(u) for u in de.dictionary.to_pylist()]
    return pc.take(pa.array(uniq, out_type), de.indices)


def sd_get_batch(batch: pa.Table, sd_id: str, param: str, out: str = "sd_value") -> pa.Table:
    """Append ``out``: sd[sd_id][param] per row (null when absent)."""

    def _get(s: str):
        sub = json.loads(s).get(sd_id)
        return None if sub is None else sub.get(param)

    return batch.append_column(
        out, _per_unique(batch.column("sd"), _get, pa.string()))


def sd_stats_batch(batch: pa.Table) -> pa.Table:
    """Append ``n_sd_elements`` / ``n_sd_params`` / ``sd_is_empty`` —
    the reference's ``len`` / ``is_empty`` / ``Deref`` surface
    (message.rs:72-77, 136-143) over the canonical-JSON ``sd`` column."""

    def _stats(s: str):
        sd = json.loads(s)
        return {"e": len(sd), "p": sum(len(v) for v in sd.values()),
                "z": len(sd) == 0}

    stats_type = pa.struct([("e", pa.int64()), ("p", pa.int64()),
                            ("z", pa.bool_())])
    st = _per_unique(batch.column("sd"), _stats, stats_type)
    batch = batch.append_column("n_sd_elements", pc.struct_field(st, "e"))
    batch = batch.append_column("n_sd_params", pc.struct_field(st, "p"))
    return batch.append_column("sd_is_empty", pc.struct_field(st, "z"))


def sd_set_batch(
    batch: pa.Table, sd_id: str, param: str, value: str, out: str = "sd"
) -> pa.Table:
    """Insert/overwrite ``sd[sd_id][param] = value`` per row — the
    reference's ``entry`` / ``insert_tuple`` mutate surface
    (message.rs:94-110); output stays canonical sorted-key JSON."""

    def _set(s: str):
        sd = json.loads(s)
        sd.setdefault(sd_id, {})[param] = value
        return json.dumps(sd, sort_keys=True, separators=(",", ":"),
                          ensure_ascii=False)

    col = _per_unique(batch.column("sd"), _set, pa.string())
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

    def _as_map(s: str):
        sd = json.loads(s)
        return [(k, list(v.items())) for k, v in sd.items()]

    return batch.append_column(
        out, _per_unique(batch.column("sd"), _as_map, SD_MAP_TYPE))


def sd_find_sdid_batch(batch: pa.Table, sd_id: str, out: str = "sd_element") -> pa.Table:
    """Append ``out``: canonical JSON of sd[sd_id] (null when absent)."""

    def _find(s: str):
        sub = json.loads(s).get(sd_id)
        return None if sub is None else json.dumps(
            sub, sort_keys=True, separators=(",", ":"), ensure_ascii=False)

    return batch.append_column(
        out, _per_unique(batch.column("sd"), _find, pa.string()))

"""The batch parse stage must agree with the per-line oracle everywhere
(differential test over the full generator mixture) — no Ray needed:
parse_batch is a pure function on Arrow tables."""

import numpy as np
import pyarrow as pa

from sylk.functions import parse_line, sd_to_json
from sylk.sources.corpus import MUST_PARSE, MUST_REJECT
from sylk.sources.transcripts import synth_batch
from sylk.stages.enrich import enrich_batch
from sylk.stages.parse import PARSE_FIELDS, parse_batch
from sylk.stages.router import add_route_columns


def _expected_columns(lines):
    rows = []
    for s in lines:
        rec = parse_line(s)
        if rec["ok"]:
            rows.append(
                {**{k: rec[k] for k in (
                    "severity", "facility", "version", "timestamp",
                    "timestamp_nanos", "hostname", "appname", "procid_pid",
                    "procid_name", "msgid", "msg")},
                 "ok": True, "error": None, "sd": sd_to_json(rec["sd"])}
            )
        else:
            rows.append({"ok": False, "error": rec["error"]})
    return rows


def _check_against_oracle(lines):
    batch = pa.table({"text": pa.array(lines, pa.string())})
    out = parse_batch(batch)
    expected = _expected_columns(lines)
    got = out.to_pylist()
    for i, (g, e) in enumerate(zip(got, expected)):
        for k, _ in PARSE_FIELDS:
            want = e.get(k)
            assert g[k] == want, f"row {i} ({lines[i]!r}) col {k}: {g[k]!r} != {want!r}"


def test_corpus_through_batch_parser():
    lines = [line for line, _ in MUST_PARSE.values()] + [
        line for line, _ in MUST_REJECT.values()
    ]
    _check_against_oracle(lines)


def test_differential_generator_mixture():
    # seeded, deterministic: 4000 rows covering the full mixture
    t = synth_batch(np.arange(0, 4000, dtype=np.int64))
    _check_against_oracle(t.column("text").to_pylist())


def test_null_text():
    batch = pa.table({"text": pa.array(["<1>1 - - - - - -", None], pa.string())})
    out = parse_batch(batch).to_pylist()
    assert out[0]["ok"] and out[1]["error"] == "MissingField"


def test_enrich_and_route_columns():
    lines = ["<78>1 - - - - - -", "<999>1 - - - - - -"]
    out = add_route_columns(enrich_batch(parse_batch(pa.table({"text": lines}))))
    rows = out.to_pylist()
    assert rows[0]["facility_name"] == "cron" and rows[0]["severity_name"] == "info"
    assert rows[0]["route"] == "cron" and rows[0]["route_key"] == "info"
    assert rows[1]["facility_name"] is None
    assert rows[1]["route"] == "reject" and rows[1]["route_key"] == "BadFacilityInPri"


def test_batch_carries_input_columns():
    t = synth_batch(np.arange(50, dtype=np.int64))
    out = parse_batch(t)
    for c in ("conv_id", "turn_idx", "role", "tool", "ts"):
        assert c in out.column_names
    assert out.column("conv_id").to_pylist() == t.column("conv_id").to_pylist()


def test_sd_typed_map_emitter():
    """SURVEY §1.4 typed-map representation: sorted keys at both levels,
    empty map for nil SD, null for failed rows."""
    from sylk.functions.lookups import SD_MAP_TYPE, sd_as_map_batch

    lines = ['<34>1 - - - - - [b k="2"][a x="1" y="z"] m',
             "<1>1 - - - - - -", "junk"]
    out = sd_as_map_batch(parse_batch(pa.table({"text": lines})))
    col = out.column("sd_map")
    assert col.type == SD_MAP_TYPE
    assert col.to_pylist() == [
        [("a", [("x", "1"), ("y", "z")]), ("b", [("k", "2")])],
        [],
        None,
    ]


def test_parse_binary_batch_utf8_taxonomy(ray_session):
    """Non-UTF-8 wire bytes through the binary entry point surface the
    crate's caller-side decode failure as BaseUnicodeError (lib.rs:27-31);
    valid bytes parse identically to the string path."""
    import pyarrow.compute as pc

    from sylk.stages.parse import parse_binary_batch

    good = '<78>1 2016-01-15T00:04:01+00:00 host1 CROND 10391 - [meta sequenceId="29"] some_message'
    raws = [
        good.encode("utf-8"),
        b"<1>1 - - - - - - \xff\xfe broken",   # invalid UTF-8 in MSG
        "<1>1 - - - - - - éok".encode("utf-8"),  # valid multibyte
        None,
        b"\xc3(",                              # invalid lead byte
    ]
    t = pa.table({"raw": pa.array(raws, pa.binary())})
    out = parse_binary_batch(t)
    ok = out.column("ok").to_pylist()
    err = out.column("error").to_pylist()
    assert ok == [True, False, True, False, False]
    assert err[1] == "BaseUnicodeError"
    assert err[4] == "BaseUnicodeError"
    assert out.column("hostname").to_pylist()[0] == "host1"
    assert out.column("msg").to_pylist()[2] == "éok"
    # all-valid batch takes the zero-copy cast fast path and matches
    # the string-column parser bit-for-bit
    t2 = pa.table({"raw": pa.array([good.encode()], pa.binary())})
    a = parse_binary_batch(t2)
    b = parse_batch(pa.table({"text": pa.array([good])}))
    for name in ("ok", "facility", "severity", "hostname", "sd", "msg"):
        assert a.column(name).to_pylist() == b.column(name).to_pylist()

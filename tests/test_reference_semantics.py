"""Conformance tests: the oracle parser vs the reference crate's unit-test
corpus (parser.rs:409-650, message.rs:174-252, facility.rs:124-132,
severity.rs:78-93), transcribed in sylk.sources.corpus / FIXTURES.md."""

import pytest

from sylk.functions import (
    FACILITY_NAMES,
    SEVERITY_NAMES,
    message_to_json,
    parse_line,
    sd_to_json,
)
from sylk.sources.corpus import MUST_PARSE, MUST_REJECT


@pytest.mark.parametrize("case_id", list(MUST_PARSE))
def test_must_parse(case_id):
    line, expect = MUST_PARSE[case_id]
    rec = parse_line(line)
    assert rec["ok"], f"{case_id}: unexpected error {rec.get('error')}"
    for field, want in expect.items():
        assert rec[field] == want, f"{case_id}.{field}: {rec[field]!r} != {want!r}"


@pytest.mark.parametrize("case_id", list(MUST_REJECT))
def test_must_reject(case_id):
    line, variant = MUST_REJECT[case_id]
    rec = parse_line(line)
    assert not rec["ok"], f"{case_id}: parsed but should reject: {rec}"
    if variant is not None:
        assert rec["error"] == variant, f"{case_id}: {rec['error']} != {variant}"


def test_enum_goldens():
    # facility.rs:87-114 / severity.rs:57-68 goldens (FIXTURES.md §4)
    assert FACILITY_NAMES == (
        "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
        "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
        "local0", "local1", "local2", "local3", "local4", "local5",
        "local6", "local7",
    )
    assert SEVERITY_NAMES == (
        "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
    )


def test_sd_canonical_json():
    # message.rs:196-206 golden: sorted keys at both levels
    sd = {"foo": {"bar": "baz", "baz": "bar"}, "faa": {"bar": "baz"}}
    assert sd_to_json(sd) == '{"faa":{"bar":"baz"},"foo":{"bar":"baz","baz":"bar"}}'


def test_message_json_golden():
    # message.rs:225-231 golden: struct-field order, enum names, nulls
    rec = parse_line("<6>1 - - - - - -")  # severity info, facility kern
    assert rec["ok"]
    assert message_to_json(rec) == (
        '{"severity":"info","facility":"kern","version":1,"timestamp":null,'
        '"timestamp_nanos":null,"hostname":null,"appname":null,"procid":null,'
        '"msgid":null,"sd":{},"msg":""}'
    )


def test_procid_classification():
    # parser.rs:357-360: PID iff i32-parseable
    assert parse_line("<1>1 - - - 10391 - -")["procid_pid"] == 10391
    assert parse_line("<1>1 - - - +7 - -")["procid_pid"] == 7
    assert parse_line("<1>1 - - - 007 - -")["procid_pid"] == 7
    rec = parse_line("<1>1 - - - 99999999999 - -")  # i32 overflow -> Name
    assert rec["procid_pid"] is None and rec["procid_name"] == "99999999999"
    rec = parse_line("<1>1 - - - p-42 - -")
    assert rec["procid_pid"] is None and rec["procid_name"] == "p-42"


def test_sd_dash_prefix_quirk():
    # parser.rs:189-191: '-' strips only the dash; "-x" => empty sd, msg "x"
    rec = parse_line("<1>1 - - - - - -x")
    assert rec["ok"] and rec["sd"] == {} and rec["msg"] == "x"


def test_term_truncation_quirk():
    # parser.rs:335-338: term truncated at max_length without consuming ->
    # following expected-space check fails on the leftover byte.
    long_host = "h" * 256
    rec = parse_line(f"<1>1 - {long_host} - - - -")
    assert not rec["ok"] and rec["error"] == "ExpectedTokenErr"
    # exactly max_length is fine
    ok_host = "h" * 255
    rec = parse_line(f"<1>1 - {ok_host} - - - -")
    assert rec["ok"] and rec["hostname"] == ok_host


def test_offset_colon_not_validated():
    # parser.rs:300-302: byte between offset HH and MM is never checked
    a = parse_line("<1>1 2015-01-01T00:00:00+05x30 host - - - -")
    b = parse_line("<1>1 2015-01-01T00:00:00+05:30 host - - - -")
    assert a["ok"] and b["ok"] and a["timestamp"] == b["timestamp"]


def test_trailing_space_empty_msg():
    # CHANGES.md:57-59 / parser.rs:365-369: SD + single trailing space -> msg ""
    rec = parse_line('<1>1 - - - - - [meta k="v"] ')
    assert rec["ok"] and rec["msg"] == ""
    rec = parse_line("<1>1 - - - - - - ")
    assert rec["ok"] and rec["msg"] == ""
    # two trailing spaces -> msg " "
    rec = parse_line("<1>1 - - - - - -  ")
    assert rec["ok"] and rec["msg"] == " "


def test_escape_semantics():
    # parser.rs:130-154: backslash dropped, next char kept verbatim, any char
    rec = parse_line(r'<1>1 - - - - - [m k="a\\b\]c\x"] t')
    assert rec["ok"]
    assert rec["sd"]["m"]["k"] == r"a\b]c" + "x"
    # unicode escaped char
    rec = parse_line('<1>1 - - - - - [m k="a\\é"] t')
    assert rec["sd"]["m"]["k"] == "aé"


def test_sd_id_max_len_cap():
    # parser.rs:108-117: sd_id capped at 128 chars -> ']' expected at char 129
    rec = parse_line(f'<1>1 - - - - - [{"x" * 129}] t')
    assert not rec["ok"] and rec["error"] == "ExpectedTokenErr"
    rec = parse_line(f'<1>1 - - - - - [{"x" * 128}] t')
    assert rec["ok"] and list(rec["sd"]) == ["x" * 128]

"""Conformance corpus — the reference crate's unit-test inputs.

Every line below is transcribed from the reference's inline tests
(parser.rs:409-650, message.rs:174-252, examples/bench.rs) — the corpus IS
the literal strings in those tests.  ``MUST_PARSE`` maps id -> (line,
expectations dict); ``MUST_REJECT`` maps id -> (line, expected error
variant or None when any error is acceptable).
"""

from __future__ import annotations

LONG_MSG_BODY = (
    "metascutellar conversationalist nephralgic exogenetic graphy streng "
    "outtaken acouasm amateurism prenotice Lyonese bedull antigrammatical "
    "diosphenol gastriloquial bayoneteer sweetener naggy roughhouser dighter "
    "addend sulphacid uneffectless ferroprussiate reveal Mazdaist plaudite "
    "Australasian distributival wiseman rumness Seidel topazine shahdom "
    "sinsion mesmerically pinguedinous ophthalmotonometer scuppler wound "
    "eciliate expectedly carriwitchet dictatorialism bindweb pyelitic idic "
    "atule kokoon poultryproof rusticial seedlip nitrosate splenadenoma "
    "holobenthic uneternal Phocaean epigenic doubtlessly indirection "
    "torticollar robomb adoptedly outspeak wappenschawing talalgia Goop "
    "domitic savola unstrafed carded unmagnified mythologically orchester "
    "obliteration imperialine undisobeyed galvanoplastical cycloplegia "
    "quinquennia foremean umbonal marcgraviaceous happenstance theoretical "
    "necropoles wayworn Igbira pseudoangelic raising unfrounced lamasary "
    "centaurial Japanolatry microlepidoptera"
)

# id -> (line, {field: expected}) ; only asserted fields listed.
MUST_PARSE: dict[str, tuple[str, dict]] = {
    # parser.rs:420-431
    "simple": (
        "<1>1 - - - - - -",
        {
            "facility": 0, "severity": 1, "timestamp": None,
            "timestamp_nanos": None, "hostname": None, "appname": None,
            "procid_pid": None, "procid_name": None, "msgid": None,
            "sd": {}, "msg": "",
        },
    ),
    # parser.rs:434-438
    "time_zulu": ("<1>1 2015-01-01T00:00:00Z host - - - -",
                  {"timestamp": 1420070400, "facility": 0, "severity": 1,
                   "hostname": "host", "sd": {}, "msg": ""}),
    # parser.rs:441-445
    "time_offset": ("<1>1 2015-01-01T00:00:00+00:00 - - - - -",
                    {"timestamp": 1420070400, "facility": 0, "severity": 1,
                     "hostname": None, "sd": {}, "msg": ""}),
    # parser.rs:448-451
    "offset_nonzero": ("<1>1 2015-01-01T00:00:00-10:00 - - - - -",
                       {"timestamp": 1420106400, "facility": 0, "severity": 1,
                        "hostname": None, "sd": {}, "msg": ""}),
    # parser.rs:453-457 (equal pair)
    "offset_pair_a": ("<1>1 2015-01-01T18:50:00-04:00 - - - - -",
                      {"timestamp": 1420152600, "facility": 0, "severity": 1,
                       "hostname": None, "sd": {}, "msg": ""}),
    "offset_pair_b": ("<1>1 2015-01-01T22:50:00Z - - - - -",
                      {"timestamp": 1420152600, "facility": 0, "severity": 1,
                       "hostname": None, "sd": {}, "msg": ""}),
    # parser.rs:459-463 (equal pair, fractional-hour offset)
    "frac_minutes_a": ("<1>1 2019-01-20T00:46:39+05:45 - - - - -",
                       {"timestamp": 1547924499, "facility": 0, "severity": 1,
                        "hostname": None, "sd": {}, "msg": ""}),
    "frac_minutes_b": ("<1>1 2019-01-19T11:01:39-08:00 - - - - -",
                       {"timestamp": 1547924499, "facility": 0, "severity": 1,
                        "hostname": None, "sd": {}, "msg": ""}),
    # parser.rs:467-482
    "complex": (
        '<78>1 2016-01-15T00:04:01+00:00 host1 CROND 10391 - [meta sequenceId="29"] some_message',
        {
            "facility": 9, "severity": 6, "hostname": "host1",
            "appname": "CROND", "procid_pid": 10391, "msg": "some_message",
            "timestamp": 1452816241, "sd": {"meta": {"sequenceId": "29"}},
        },
    ),
    # parser.rs:485-505
    "sd_empty": (
        "<78>1 2016-01-15T00:04:01Z host1 CROND 10391 - [meta@1234] some_message",
        {
            "facility": 9, "severity": 6, "hostname": "host1",
            "appname": "CROND", "procid_pid": 10391, "msg": "some_message",
            "timestamp": 1452816241, "sd": {"meta@1234": {}},
        },
    ),
    # parser.rs:508-522 — repeated SD-ID merges; "baz=" value legal
    "sd_features": (
        '<78>1 2016-01-15T00:04:01Z host1 CROND 10391 - '
        '[meta sequenceId="29" sequenceBlah="foo"][my key="value"]'
        '[meta bar="baz="] some_message',
        {
            "facility": 9, "severity": 6, "hostname": "host1",
            "sd": {
                "meta": {"sequenceId": "29", "sequenceBlah": "foo", "bar": "baz="},
                "my": {"key": "value"},
            },
            "msg": "some_message",
        },
    ),
    # parser.rs:525-534
    "escaped_quote": (
        r'<1>1 - - - - - [meta key="val\"ue"] message',
        {"facility": 0, "severity": 1, "hostname": None,
         "sd": {"meta": {"key": 'val"ue'}}, "msg": "message"},
    ),
    # parser.rs:537-540
    "long_msg": (
        '<190>1 2016-02-21T01:19:11+00:00 batch6sj - - - '
        '[meta sequenceId="21881798" x-group="37051387"]'
        '[origin x-service="tracking"] ' + LONG_MSG_BODY,
        {"facility": 23, "severity": 6, "hostname": "batch6sj",
         "sd": {"meta": {"sequenceId": "21881798", "x-group": "37051387"},
                "origin": {"x-service": "tracking"}},
         "msg": LONG_MSG_BODY},
    ),
    # parser.rs:559-587 — the RFC's example timestamps
    "ts_frac_1": ("<1>1 1985-04-12T23:20:50.52Z host - - - -",
                  {"timestamp": 482196050, "timestamp_nanos": 520000000,
                   "facility": 0, "severity": 1, "hostname": "host",
                   "sd": {}, "msg": ""}),
    "ts_frac_2": ("<1>1 1985-04-12T19:20:50.52+04:00 host - - - -",
                  {"timestamp": 482167250, "timestamp_nanos": 520000000,
                   "facility": 0, "severity": 1, "hostname": "host",
                   "sd": {}, "msg": ""}),
    "ts_frac_3": ("<1>1 1985-04-12T19:20:50+04:00 host - - - -",
                  {"timestamp": 482167250, "timestamp_nanos": 0,
                   "facility": 0, "severity": 1, "hostname": "host",
                   "sd": {}, "msg": ""}),
    "ts_frac_4": ("<1>1 2003-08-24T05:14:15.000003+07:00 host - - - -",
                  {"timestamp": 1061676855, "timestamp_nanos": 3000,
                   "facility": 0, "severity": 1, "hostname": "host",
                   "sd": {}, "msg": ""}),
    "ts_frac_9a": ("<1>1 2003-08-24T05:14:15.000000003+07:00 host - - - -",
                   {"timestamp": 1061676855, "timestamp_nanos": 3,
                    "facility": 0, "severity": 1, "hostname": "host",
                    "sd": {}, "msg": ""}),
    "ts_frac_9b": ("<1>1 2003-08-24T05:14:15.123456789+07:00 host - - - -",
                   {"timestamp": 1061676855, "timestamp_nanos": 123456789,
                    "facility": 0, "severity": 1, "hostname": "host",
                    "sd": {}, "msg": ""}),
    # parser.rs:594-621
    "empty_sd_value": (
        '<29>1 2018-05-14T08:23:01.520Z leyal_test4 mgd 13894 UI_CHILD_EXITED '
        '[junos@2636.1.1.1.2.57 pid="14374" return-value="5" '
        'core-dump-status="" command="/usr/sbin/mustd"]',
        {
            "facility": 3, "severity": 5, "hostname": "leyal_test4",
            "appname": "mgd", "procid_pid": 13894, "msgid": "UI_CHILD_EXITED",
            "msg": "", "timestamp": 1526286181, "timestamp_nanos": 520000000,
            "sd": {"junos@2636.1.1.1.2.57": {
                "pid": "14374", "return-value": "5",
                "core-dump-status": "", "command": "/usr/sbin/mustd",
            }},
        },
    ),
    # parser.rs:624-639 — leading-dash terms are NOT nil
    "dash_start": (
        '<39>1 2018-05-15T20:56:58+00:00 -web1west -201805020050-bc5d6a47c3-master - - '
        '[meta sequenceId="28485532"] 25450-uWSGI worker 6: '
        'getaddrinfo*.gaih_getanswer: got type "DNAME"',
        {
            "facility": 4, "severity": 7,
            "hostname": "-web1west", "appname": "-201805020050-bc5d6a47c3-master",
            "sd": {"meta": {"sequenceId": "28485532"}},
            "msg": '25450-uWSGI worker 6: getaddrinfo*.gaih_getanswer: got type "DNAME"',
        },
    ),
    # message.rs:246-251 (FromStr path — same grammar)
    "fromstr": ("<1>1 1985-04-12T23:20:50.52Z host - - - -",
                {"timestamp": 482196050, "facility": 0, "severity": 1,
                 "hostname": "host", "sd": {}, "msg": ""}),
    # examples/bench.rs:42 — quoted strings inside MSG untouched
    "bench_avg": (
        '<29>1 2016-02-21T04:32:57+00:00 web1 someservice - - '
        '[origin x-service="someservice"][meta sequenceId="14125553"] '
        '127.0.0.1 - - 1456029177 "GET /v1/ok HTTP/1.1" 200 145 "-" '
        '"hacheck 0.9.0" 24306 127.0.0.1:40124 575',
        {
            "facility": 3, "severity": 5, "hostname": "web1",
            "appname": "someservice",
            "sd": {"origin": {"x-service": "someservice"},
                   "meta": {"sequenceId": "14125553"}},
            "msg": '127.0.0.1 - - 1456029177 "GET /v1/ok HTTP/1.1" 200 145 '
                   '"-" "hacheck 0.9.0" 24306 127.0.0.1:40124 575',
        },
    ),
    # examples/bench.rs:18 — UTF-8 MSG (U+FEFF BOM prefix)
    "bench_utf8": (
        "<14>1 2017-07-26T14:47:35.869952+05:30 my_hostname custom_appname "
        "5678 some_unique_msgid - ﻿Some other message",
        {
            "facility": 1, "severity": 6, "hostname": "my_hostname",
            "appname": "custom_appname", "procid_pid": 5678,
            "msgid": "some_unique_msgid", "msg": "﻿Some other message",
            "sd": {},
            "timestamp": 1501060655, "timestamp_nanos": 869952000,
        },
    ),
}

# id -> (line, expected ParseErr variant name or None if unspecified)
MUST_REJECT: dict[str, tuple[str, str | None]] = {
    # parser.rs:543-546 — digit run capped at 3 -> '>' expected at '6'
    "bad_pri": ("<4096>1 - - - - - -", "ExpectedTokenErr"),
    # parser.rs:206-210 / facility.rs:75 — fac 24 > 23
    "bad_facility": ("<192>1 - - - - - -", "BadFacilityInPri"),
    # parser.rs:549-553 — RFC3164 must not parse
    # the crate test only asserts is_err; the variant follows from the
    # grammar: version parse_num sees 'F' (no digit) -> TooFewDigits
    "rfc3164": ("<134>Feb 18 20:53:31 haproxy[376]: I am a message", "TooFewDigits"),
    # parser.rs:588-590 — 10th frac digit leaks into the offset parser
    "frac_10_digits": ("<1>1 2003-08-24T05:14:15.1122334455+07:00 host - - - -",
                       "InvalidUTCOffset"),
    # parser.rs:642-649
    "truncated": ("<39>1 2018-05-15T20:56:58+00:00 -web1west -", "UnexpectedEndOfInput"),
    # remaining ParseErr variants (parser.rs:13-45), our own probes:
    "bad_month": ("<1>1 2015-13-01T00:00:00Z - - - - -", "InvalidMonth"),
    "bad_mday": ("<1>1 2015-02-29T00:00:00Z - - - - -", "InvalidDate"),
    "bad_hour": ("<1>1 2015-01-01T24:00:00Z - - - - -", "InvalidDate"),
    "bad_offset_hours": ("<1>1 2015-01-01T00:00:00+24:00 - - - - -", "InvalidOffset"),
    "bad_offset_char": ("<1>1 2015-01-01T00:00:00@00:00 - - - - -", "InvalidUTCOffset"),
    "bad_offset_digits": ("<1>1 2015-01-01T00:00:00+ab:cd - - - - -", "IntConversionErr"),
    "no_lt": ("1 - - - - - -", "ExpectedTokenErr"),
    "empty_term": ("<1>1 -  - - - -", "TooFewDigits"),
    "unterminated_quote": ('<1>1 - - - - - [meta key="oops', "UnexpectedEndOfInput"),
    "unterminated_sd": ("<1>1 - - - - - [meta", "UnexpectedEndOfInput"),
    "empty_line": ("", "UnexpectedEndOfInput"),
    "version_too_long": ("<1>100 - - - - - -", "ExpectedTokenErr"),
}


def corpus_lines() -> list[str]:
    """All corpus lines (parse + reject), deterministic order."""
    return [line for line, _ in MUST_PARSE.values()] + [
        line for line, _ in MUST_REJECT.values()
    ]

"""Adversarial differential fuzz: the vectorized fast path must agree
with the per-line oracle on EVERY input, especially around the SD/MSG
boundary logic (loose-capture + strict-validate) and the split-based
header decomposition.  Seeded hypothesis + hand-picked nasties."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sylk.functions import parse_line, sd_to_json
from sylk.stages.parse import PARSE_FIELDS, parse_batch

# hand-picked boundary nasties: every case the fast-path proof sketch in
# sylk/stages/parse.py reasons about
NASTIES = [
    # SD boundary vs adjacent-invalid elements (loose swallows, strict must veto)
    "<1>1 - - - - - [a][b=c] x",
    "<1>1 - - - - - [a] [b=c] x",
    "<1>1 - - - - - [a][b] x",
    "<1>1 - - - - - [a]x",
    "<1>1 - - - - - [a] ",
    "<1>1 - - - - - [a]",
    # quote-protected ']' and escapes
    '<1>1 - - - - - [a p="x][y"] m',
    '<1>1 - - - - - [a p="x\\"y\\]z"] m',
    '<1>1 - - - - - [a\\] b]',
    '<1>1 - - - - - [a"b] m',
    '<1>1 - - - - - [a p="unterminated',
    '<1>1 - - - - - [a p="v"',
    # nil-SD msg rules (the '-' strips-only quirk)
    "<1>1 - - - - - -x",
    "<1>1 - - - - - - x",
    "<1>1 - - - - - --",
    "<1>1 - - - - - -[a] m",
    # PRI-first error ordering
    "<200>1 total garbage here",
    "<200>1",
    "<2000>1 - - - - - -",
    "<192>1 - - - - - -",
    "<191>1 - - - - - -",
    # header shape
    "<1>1 - -  - - - -",
    "<1>1 - - - - -",
    "<1>1  - - - - - -",
    "",
    " ",
    "<1>1 - - - - - - ",
    # timestamp quirks: offset separator byte, 10-digit frac, no offset
    "<1>1 2015-01-01T00:00:00*00:00 - - - - -",
    "<1>1 2015-01-01T00:00:00+99:00 - - - - -",
    "<1>1 2015-01-01T00:00:00.1234567890Z - - - - -",
    "<1>1 2015-01-01T00:00:00 - - - - -",
    "<1>1 2016-02-29T23:59:59Z - - - - -",
    "<1>1 2015-02-29T00:00:00Z - - - - -",
    "<1>1 2015-01-01T00:00:00é00:00 - - - - -",  # multibyte offset sep
    # multibyte in terms / msg / sd
    "<1>1 - hést - - - -",
    "<1>1 - - - - - [exé p=\"寿司\"] héllo wörld",
    "<1>1 - - - - - - msg with é and \x01 control",
    # term length caps
    "<1>1 - " + "h" * 255 + " - - - -",
    "<1>1 - " + "h" * 256 + " - - - -",
    "<1>1 - - " + "a" * 49 + " - - -",
]


def _assert_agree(lines):
    batch = pa.table({"text": pa.array(lines, pa.string())})
    out = parse_batch(batch).to_pylist()
    for line, got in zip(lines, out):
        rec = parse_line(line)
        if rec["ok"]:
            exp = {k: rec[k] for k in (
                "severity", "facility", "version", "timestamp",
                "timestamp_nanos", "hostname", "appname", "procid_pid",
                "procid_name", "msgid", "msg")}
            exp.update(ok=True, error=None, sd=sd_to_json(rec["sd"]))
        else:
            exp = {k: None for k, _ in PARSE_FIELDS}
            exp.update(ok=False, error=rec["error"])
        for k, _ in PARSE_FIELDS:
            assert got[k] == exp.get(k), (
                f"{line!r} col {k}: fast={got[k]!r} oracle={exp.get(k)!r}")


def test_nasties():
    _assert_agree(NASTIES)


_sd_piece = st.sampled_from(
    ["[", "]", '"', "\\", "=", " ", "-", "a", "p", "é", "<1>", "1",
     '[m k="v"]', '[m]', 'k="', '"]', "\\]", '\\"', "x y"]
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(_sd_piece, min_size=0, max_size=12))
def test_fuzz_sd_tail(pieces):
    """Random SD/MSG tails glued onto a valid header."""
    _assert_agree(["<34>1 - host app 42 id " + "".join(pieces)])


_line_piece = st.sampled_from(
    ["<", ">", "1", "9", " ", "-", "Z", ":", ".", "T", "[", "]", '"',
     "\\", "=", "a", "é", "2015-01-01", "00:00:00", "<13>", "+05:30"]
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(_line_piece, min_size=0, max_size=16))
def test_fuzz_whole_line(pieces):
    _assert_agree(["".join(pieces)])


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.text(min_size=0, max_size=60))
def test_fuzz_arbitrary_text(s):
    _assert_agree([s])


def test_differential_distant_index_windows():
    """The generator mixture varies with the global row index; cover
    windows far from the 0-4000 range the main differential test uses."""
    from sylk.sources.transcripts import synth_batch

    for start in (997_000, 76_543_210, 2**33):
        t = synth_batch(np.arange(start, start + 1500, dtype=np.int64))
        _assert_agree(t.column("text").to_pylist())


def test_large_string_and_chunked_input():
    """Ray blocks sometimes arrive as large_string or multi-chunk."""
    lines = ["<34>1 - h a 1 m [s k=\"v\"] msg", "<999>1 - - - - - -", "junk"]
    big = pa.table({"text": pa.array(lines, pa.large_string())})
    out_big = parse_batch(big).to_pylist()
    chunked = pa.table(
        {"text": pa.chunked_array([pa.array(lines[:2]), pa.array(lines[2:])])}
    )
    out_chunked = parse_batch(chunked).to_pylist()
    plain = parse_batch(pa.table({"text": pa.array(lines)})).to_pylist()
    for a, b in zip(out_big, plain):
        assert {k: a[k] for k, _ in PARSE_FIELDS} == {k: b[k] for k, _ in PARSE_FIELDS}
    for a, b in zip(out_chunked, plain):
        assert {k: a[k] for k, _ in PARSE_FIELDS} == {k: b[k] for k, _ in PARSE_FIELDS}

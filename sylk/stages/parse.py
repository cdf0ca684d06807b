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

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.canonical_json import sd_to_json
from ..functions.reference_semantics import parse_line

# ---------------------------------------------------------------------------
# Vectorized fast path: split on the 6 header spaces, then validate each
# field with a SMALL anchored RE2 — match-only (capture-free) wherever
# possible, because RE2 answers capture-free matches with its DFA while
# multi-capture extraction drops to the much slower NFA engines (measured
# on this corpus: one 18-group whole-line extract = 398ms/65k rows; the
# decomposed passes below total ~105ms).  Every sub-language is written
# so that "fast path accepts" => "oracle accepts with identical output",
# and anything else falls back to the per-row oracle:
#
# * PRI/VERSION digit runs are capped exactly like take_while
#   (parser.rs:93-106): <4096> can't match `\d{1,3}>` so it falls back
#   and gets the oracle's ExpectedTokenErr('>').  A field-0 PRI with
#   facility > 23 is BadFacilityInPri regardless of the rest of the
#   line, mirroring the oracle's eager PRI check (parser.rs:346-348).
# * terms are ASCII 33..=126 runs with the reference's max lengths
#   (parser.rs:353-362); over-long or oddly-terminated terms fail the
#   match.  Consecutive separators yield empty fields, which fail the
#   {1,N} bound — exactly the oracle's one-space grammar.
# * the timestamp offset separator is any single ASCII byte
#   ([\x00-\x7f]), mirroring the unchecked byte skip (parser.rs:300-302);
#   multibyte separators fall back (byte-slicing there diverges from
#   codepoints).  Date/time digits are read by fixed-position slices —
#   the shape regex pins their offsets.
# * SD boundary detection runs a LOOSE single-capture prefix regex
#   (bracket blocks with quote-aware content — cheap for RE2), then the
#   captured run is validated against the STRICT element grammar with a
#   capture-free anchored match.  Loose and strict agree on element ends
#   (both end an element at the first un-quoted `]`; quoted values
#   protect `]` identically, parser.rs:130-154), so a strict-validated
#   loose capture IS the oracle's greedy SD prefix (parser.rs:199-201).
#   Anything loose cannot match (escapes outside quotes, multibyte
#   oddities) falls back.
# * SD ids / param names in the strict class are printable ASCII minus
#   ' ' '=' ']' so the 128-char cap counts bytes exactly like the byte-
#   indexed cap in parser.rs:109 (or any-codepoint up to 32 chars, <=128
#   bytes worst case).
# * after a bracket SD the oracle only ever yields msg following a space
#   (parser.rs:199-201); a loose-matched row with sd!='-', no separating
#   space and nonempty msg is therefore kicked to the fallback (which
#   rejects it) — this also covers loose swallowing an element the
#   strict grammar rejects.
#
# Calendar/offset range validation (month/day/hour/minute/second/offset,
# parser.rs:256-316) is applied as vectorized masks; rows that fail go to
# the fallback so the exact ParseErr variant comes from the oracle.
# ---------------------------------------------------------------------------

# SD id / param name: ASCII printable minus ' ' '=' ']' up to 128 chars
# (= bytes), OR any-codepoint form up to 32 chars (<= 128 bytes at 4
# bytes/char worst case) — either way the oracle's byte-indexed 128-cap
# (parser.rs:109) cannot fire, so fast == oracle.
_SDCH = r"[!-<>-\\^-~]"  # printable ASCII minus ' ', '=', ']'
_SDID = rf"(?:{_SDCH}{{1,128}}|[^ =\]]{{1,32}})"
# param value: escape-free runs or backslash + any one char — exactly the
# oracle's escape rule (parser.rs:130-154: backslash dropped, next char
# kept verbatim)
_SDVAL = r'(?:[^"\\]|\\(?s:.))*'

_PRI_RE = r"^<(?P<pri>\d{1,3})>(?P<ver>\d{1,2})$"
_TS_RE = (r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
          r"(?:\.\d{1,9})?(?:Z|[+-]\d{2}[\x00-\x7f]\d{2})$")
_FRAC_OFF_RE = r"^(?:\.(?P<f>\d{1,9}))?(?P<off>Z|[+-]\d{2}[\x00-\x7f]\d{2})$"
_TERM_RES = (("host", r"^[!-~]{1,255}$"), ("app", r"^[!-~]{1,48}$"),
             ("proc", r"^[!-~]{1,128}$"), ("msgid", r"^[!-~]{1,32}$"))
_SD_LOOSE_RE = (r'^(?P<sd>-|(?:\[[^\]"\\]*'
                r'(?:"(?:[^"\\]|\\(?s:.))*"[^\]"\\]*)*\])+)')
_SD_STRICT_RE = rf"^(?:\[{_SDID}(?: {_SDID}=\"{_SDVAL}\")*\])+$"

_SD_ELEM_RE = re.compile(rf"\[({_SDID})((?: {_SDID}=\"{_SDVAL}\")*)\]")
_SD_PARAM_RE = re.compile(rf" ({_SDID})=\"({_SDVAL})\"")
_SD_UNESCAPE_RE = re.compile(r"\\(.)", re.S)

_DIM_VEC = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], np.int64)
_I32_MIN_NP = -(2**31)
_I32_MAX_NP = 2**31 - 1

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


def parse_batch_slow(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Reference-faithful per-row path (the oracle, run for every row).
    Kept for differential testing; ``parse_batch`` is the production
    dispatcher."""
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


def _np_bool(arr) -> np.ndarray:
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False).astype(bool)


def _np_int(arr) -> np.ndarray:
    # non-participating regex groups yield '' on matched rows and null on
    # unmatched rows — both mean "absent" here and become 0
    s = pc.fill_null(arr, "0")
    s = pc.if_else(pc.equal(s, ""), "0", s)
    return pc.cast(s, pa.int64()).to_numpy(zero_copy_only=False)


def _sd_json_fast(sd_str: str) -> str:
    """Canonical JSON for a fast-path SD string (escape-free, well-formed
    by regex construction).  Mirrors parse_sd merge semantics
    (parser.rs:187-204) + the sorted-key serde output (message.rs:196-206)."""
    sd: dict = {}
    for sd_id, params in _SD_ELEM_RE.findall(sd_str):
        sub = sd.setdefault(sd_id, {})
        for k, v in _SD_PARAM_RE.findall(params):
            if "\\" in v:
                v = _SD_UNESCAPE_RE.sub(r"\1", v)
            sub[k] = v
    return json.dumps(sd, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def _field(parts, i: int):
    """Element ``i`` of each split row (null when the row has fewer)."""
    return pc.list_flatten(
        pc.list_slice(parts, i, i + 1, return_fixed_size_list=True)
    )


def _tail_suffixes(tail, sd):
    """Split each tail row after its SD prefix, by bytes, vectorized:
    returns ``(sp_is_space bool[n], msg StringArray, msg_len int64[n])``
    where msg = the tail after the sd prefix and one optional space
    (exactly the old ``(?P<sp> ?)(?P<msg>(?s:.*))$`` captures).  Rows
    with a null/unmatched sd use skip 0 (callers mask on sd validity).

    Implementation reads the Arrow offsets+data buffers directly and
    compresses the skipped prefix bytes with one boolean mask (O(bytes),
    no per-row Python — the content_hash64 buffer discipline)."""
    tail_f = pc.fill_null(tail, "")
    if isinstance(tail_f, pa.ChunkedArray):
        tail_f = tail_f.combine_chunks()
    n = len(tail_f)
    if n == 0:
        return (np.zeros(0, bool), pa.array([], pa.string()),
                np.zeros(0, np.int64))
    off = np.frombuffer(tail_f.buffers()[1], dtype=np.int32)[
        tail_f.offset: tail_f.offset + n + 1].astype(np.int64)
    data = np.frombuffer(tail_f.buffers()[2], dtype=np.uint8)
    sd_len = pc.binary_length(pc.fill_null(sd, "")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    row_len = off[1:] - off[:-1]
    skip = np.minimum(sd_len, row_len)  # sd is a prefix; min is a guard
    after = off[:-1] + skip
    has_byte = skip < row_len
    sp_is_space = np.zeros(n, dtype=bool)
    idx = after[has_byte]
    sp_is_space[has_byte] = data[idx] == 0x20
    skip = skip + sp_is_space
    # compress the per-row skipped prefixes out of the data buffer: the
    # dropped bytes (SD prefixes, ~100 B/row) are far fewer than the
    # kept bytes, so enumerate DROP indices (repeat+arange over the
    # short skips) and boolean-compress once — O(bytes) with temps
    # proportional to the dropped volume, not the buffer
    lo, hi = off[0], off[-1]
    seg = data[lo:hi]
    starts_rel = off[:-1] - lo
    tot_skip = int(skip.sum())
    mask = np.ones(len(seg), dtype=bool)
    if tot_skip:
        csk = np.concatenate(([0], np.cumsum(skip)))
        intra = np.arange(tot_skip, dtype=np.int64) \
            - np.repeat(csk[:-1], skip)
        mask[np.repeat(starts_rel, skip) + intra] = False
    out_data = seg[mask]
    new_off = (off - lo - np.concatenate(([0], np.cumsum(skip)))) \
        .astype(np.int32)
    msg = pa.StringArray.from_buffers(
        n, pa.py_buffer(new_off.tobytes()), pa.py_buffer(out_data.tobytes()))
    return sp_is_space, msg, off[1:] - off[:-1] - skip


def parse_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """The map_batches body: append parse-output columns to ``batch``.

    Vectorized split + small-RE2 fast path + per-row oracle fallback; a
    seeded differential test asserts this equals ``parse_batch_slow``
    everywhere.
    """
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        # normalize: several kernels below lack (large_string, string)
        # mixed signatures (e.g. replace_with_mask)
        texts = texts.cast(pa.string())
    n = len(texts)
    if n == 0:
        out = batch
        for name, typ in PARSE_FIELDS:
            out = out.append_column(name, pa.array([], type=typ))
        return out

    # fill nulls BEFORE the split: list_flatten drops null parents, which
    # would misalign the field arrays (null texts go to the slow path,
    # detected from the original column)
    parts = pc.split_pattern(pc.fill_null(texts, ""), " ", max_splits=6)
    seven = _np_bool(pc.equal(pc.list_value_length(parts), 7))
    g = {}
    pri_st = pc.extract_regex(_field(parts, 0), _PRI_RE)
    g["pri"], g["ver"] = pc.struct_field(pri_st, "pri"), pc.struct_field(pri_st, "ver")
    ts_f = _field(parts, 1)
    for name, idx in (("host", 2), ("app", 3), ("proc", 4), ("msgid", 5)):
        g[name] = _field(parts, idx)
    tail = _field(parts, 6)

    pri_ok = _np_bool(pc.is_valid(pri_st))
    pri = _np_int(g["pri"])
    facility = pri >> 3
    severity = pri & 0x7
    # the oracle checks PRI before any later field (parser.rs:346-348),
    # so a parsed PRI with facility > 23 is an error row no matter what
    # follows
    fac_bad = pri_ok & (facility > 23)

    terms_ok = seven.copy()
    for name, pat in _TERM_RES:
        terms_ok &= _np_bool(pc.match_substring_regex(g[name], pat))

    # --- timestamp validation + epoch (vectorized) ---
    nil_ts = _np_bool(pc.equal(ts_f, "-"))
    ts_shape_pa = pc.match_substring_regex(pc.fill_null(ts_f, ""), _TS_RE)
    ts_shape = _np_bool(ts_shape_pa)
    # substitute a digit-shaped dummy where the shape failed so the
    # fixed-position digit slices always cast (those rows are masked out)
    safe_ts = pc.if_else(ts_shape_pa, ts_f, pa.scalar("0000-00-00T00:00:00Z"))

    def _dig(a, b):
        return _np_int(pc.utf8_slice_codeunits(safe_ts, a, b))

    y = _dig(0, 4)
    mo = _dig(5, 7)
    d = _dig(8, 10)
    h = _dig(11, 13)
    mi = _dig(14, 16)
    s = _dig(17, 19)
    leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    mo_c = np.clip(mo, 1, 12)
    dim = _DIM_VEC[mo_c] + (leap & (mo_c == 2))
    cal_ok = (mo >= 1) & (mo <= 12) & (d >= 1) & (d <= dim) & (h <= 23) & (mi <= 59) & (s <= 59)

    fo_st = pc.extract_regex(
        pc.utf8_slice_codeunits(safe_ts, 19, 2**30), _FRAC_OFF_RE
    )
    g["f"] = pc.struct_field(fo_st, "f")
    off = pc.struct_field(fo_st, "off")
    is_z = _np_bool(pc.equal(off, "Z"))
    off_sign_neg = _np_bool(pc.equal(pc.utf8_slice_codeunits(off, 0, 1), "-"))
    oh_s = pc.utf8_slice_codeunits(off, 1, 3)
    om_s = pc.utf8_slice_codeunits(off, 4, 6)
    # slices are pure digits by regex; 'Z'/null rows produce ''/null -> fill 0
    oh = _np_int(pc.if_else(pc.equal(oh_s, ""), "0", pc.fill_null(oh_s, "0")))
    om = _np_int(pc.if_else(pc.equal(om_s, ""), "0", pc.fill_null(om_s, "0")))
    off_ok = is_z | ((oh <= 23) & (om <= 59))
    off_sec = np.where(is_z, 0, np.where(off_sign_neg, -1, 1) * (oh * 3600 + om * 60))

    ts_ok = nil_ts | (ts_shape & cal_ok & off_ok)
    # days-from-civil (proleptic Gregorian), vectorized
    yy = y - (mo_c <= 2)
    era = np.where(yy >= 0, yy, yy - 399) // 400
    yoe = yy - era * 400
    doy = (153 * (mo_c + np.where(mo_c > 2, -3, 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    epoch = (era * 146097 + doe - 719468) * 86400 + h * 3600 + mi * 60 + s - off_sec

    fr = g["f"]
    fr_len = pc.cast(
        pc.utf8_length(pc.fill_null(fr, "")), pa.int64()
    ).to_numpy(zero_copy_only=False)
    fr_val = _np_int(fr)
    nanos = fr_val * np.power(10, np.maximum(9 - np.maximum(fr_len, 1), 0))

    # --- SD boundary (loose capture) + strict validation + msg rule ---
    # capture ONLY the (short) SD prefix: a trailing `(?P<msg>(?s:.*))$`
    # capture forces RE2 into submatch-tracking over the WHOLE tail
    # (measured 11.7 µs/row on 1 KB messages vs ~1 µs for the prefix
    # alone); sp/msg then come from exact byte arithmetic on the Arrow
    # buffers (`_tail_suffixes`), which the suffix-always-matches
    # structure of the old pattern makes equivalent
    sd_st = pc.extract_regex(tail, _SD_LOOSE_RE)
    g["sd"] = pc.struct_field(sd_st, "sd")
    sd_matched = _np_bool(pc.is_valid(sd_st))
    sd_nil = _np_bool(pc.equal(g["sd"], "-"))
    sd_strict_ok = sd_nil | _np_bool(
        pc.match_substring_regex(g["sd"], _SD_STRICT_RE)
    )
    sp_is_space, msg_arr, msg_len = _tail_suffixes(tail, g["sd"])
    g["msg"] = pc.if_else(pa.array(sd_matched), msg_arr,
                          pa.scalar(None, pa.string()))
    # old semantics: sp/msg compare as False on unmatched rows (null
    # propagation through pc.equal) — mask with sd_matched
    sp_empty = (~sp_is_space) & sd_matched
    msg_empty = (msg_len == 0) & sd_matched
    sd_slow = (~sd_nil) & sp_empty & (~msg_empty)

    ok_fast = (
        seven & pri_ok & (~fac_bad) & terms_ok & ts_ok
        & sd_matched & sd_strict_ok & (~sd_slow)
    )
    err_fast = fac_bad  # the only vectorized error: BadFacilityInPri
    slow = ~(ok_fast | err_fast)
    slow_idx = np.flatnonzero(slow)

    # --- procid classification (parser.rs:357-360), vectorized ---
    proc = g["proc"]
    proc_num = _np_bool(pc.match_substring_regex(proc, r"^[+-]?\d{1,18}$"))
    proc_stripped = pc.if_else(
        pa.array(proc_num), pc.replace_substring_regex(pc.fill_null(proc, "0"), r"^\+", ""), "0"
    )
    proc_val = _np_int(proc_stripped)
    is_pid = proc_num & (proc_val >= _I32_MIN_NP) & (proc_val <= _I32_MAX_NP)

    # --- assemble fast columns (mask=True means null) ---
    not_ok = ~ok_fast

    def _num(values, invalid, typ):
        return pa.array(values, type=typ, mask=invalid | not_ok)

    nil = pa.scalar(None, pa.string())
    ok_pa = pa.array(ok_fast)

    def _str_col(col, extra_null=None):
        invalid = not_ok if extra_null is None else (not_ok | extra_null)
        return pc.if_else(pa.array(invalid), nil, col)

    host_nil = _np_bool(pc.equal(g["host"], "-"))
    app_nil = _np_bool(pc.equal(g["app"], "-"))
    proc_nil = _np_bool(pc.equal(g["proc"], "-"))
    msgid_nil = _np_bool(pc.equal(g["msgid"], "-"))

    # canonical-JSON SD: "{}" for nil/empty; the python transform runs
    # once per UNIQUE sd string (dictionary-encode + take) — SD content
    # repeats heavily in log data, so this is usually a large saving
    sd_vals = np.full(n, None, dtype=object)
    sd_vals[ok_fast & sd_nil] = "{}"
    sd_idx = np.flatnonzero(ok_fast & ~sd_nil)
    if len(sd_idx):
        de = g["sd"].take(pa.array(sd_idx)).dictionary_encode()
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        uniq_json = [_sd_json_fast(u) for u in de.dictionary.to_pylist()]
        sd_vals[sd_idx] = pc.take(
            pa.array(uniq_json, pa.string()), de.indices
        ).to_numpy(zero_copy_only=False)

    cols = {
        "ok": ok_pa,
        "error": pc.if_else(pa.array(err_fast), pa.scalar("BadFacilityInPri"), nil),
        "severity": _num(severity, np.zeros(n, bool), pa.int8()),
        "facility": _num(facility, np.zeros(n, bool), pa.int8()),
        "version": _num(_np_int(g["ver"]), np.zeros(n, bool), pa.int32()),
        "timestamp": _num(epoch, nil_ts, pa.int64()),
        "timestamp_nanos": _num(nanos, nil_ts, pa.uint32()),
        "hostname": _str_col(g["host"], host_nil),
        "appname": _str_col(g["app"], app_nil),
        "procid_pid": _num(proc_val, ~is_pid | proc_nil, pa.int32()),
        "procid_name": _str_col(proc, proc_nil | is_pid),
        "msgid": _str_col(g["msgid"], msgid_nil),
        "sd": pa.array(sd_vals, type=pa.string()),
        "msg": _str_col(g["msg"]),
    }

    # --- oracle fallback for the rows the fast path can't prove ---
    if len(slow_idx):
        bin_type = (
            pa.large_binary() if pa.types.is_large_string(texts.type) else pa.binary()
        )
        slow_lines = texts.take(pa.array(slow_idx)).cast(bin_type).to_pylist()
        patch = parse_rows(slow_lines)
        slow_mask = pa.array(slow)
        for name, typ in PARSE_FIELDS:
            cols[name] = pc.replace_with_mask(
                cols[name], slow_mask, pa.array(patch[name], type=typ)
            )

    out = batch
    for name, typ in PARSE_FIELDS:
        col = cols[name]
        if col.type != typ:
            col = col.cast(typ)
        out = out.append_column(name, col)
    return out


def parse_binary_batch(batch: pa.Table, raw_col: str = "raw") -> pa.Table:
    """Binary-line entry point: UTF-8-validate, then parse.

    The crate's ``parse_message`` takes ``AsRef<str>`` (parser.rs:405) —
    the wire-bytes decode happens CALLER-side (lib.rs:20-24 doc example)
    and its failure surfaces as the ``BaseUnicodeError``/``UnicodeError``
    variants (lib.rs:27-31).  This operator folds that step in so the
    error taxonomy is complete end-to-end for non-UTF-8 input arriving
    through an Arrow ``binary`` column: rows that fail the decode get
    ``ok=false, error="BaseUnicodeError"`` and null fields; valid rows
    take the normal vectorized parse path.

    Fast path: one C++ whole-column UTF-8 validation (binary->string
    cast); the per-row decode loop runs only when the column actually
    contains invalid bytes.
    """
    col = batch.column(raw_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_binary(col.type) and not pa.types.is_large_binary(col.type):
        col = col.cast(pa.binary())
    try:
        texts = col.cast(pa.string())
        bad = None
    except pa.ArrowInvalid:
        decoded, bad_list = [], []
        for b in col.to_pylist():
            if b is None:
                decoded.append(None)
                bad_list.append(False)
                continue
            try:
                decoded.append(b.decode("utf-8"))
                bad_list.append(False)
            except UnicodeDecodeError:
                decoded.append("")  # placeholder; row overridden below
                bad_list.append(True)
        texts = pa.array(decoded, pa.string())
        bad = pa.array(bad_list, pa.bool_())

    work = batch.append_column("__text", texts)
    out = parse_batch(work, text_col="__text")
    out = out.drop_columns(["__text"])
    if bad is not None and pc.any(bad).as_py():
        idx = out.schema.get_field_index("ok")
        out = out.set_column(
            idx, "ok", pc.if_else(bad, pa.scalar(False), out.column("ok"))
        )
        idx = out.schema.get_field_index("error")
        out = out.set_column(
            idx, "error",
            pc.if_else(bad, pa.scalar("BaseUnicodeError"), out.column("error")),
        )
    return out

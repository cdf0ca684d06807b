"""Faithful per-line RFC 5424 parser — the semantic oracle.

This is a from-scratch Python reimplementation of the grammar implemented
by the reference crate ``syslog_rfc5424`` (``/root/reference/src/parser.rs``),
quirks included.  It is *authoritative* for parse semantics in this repo:
the vectorized Arrow fast path (``sylk.stages.parse``) must agree with this
module on every input (enforced by a seeded differential test).

Quirk parity notes (each cites the reference behavior it mirrors):

* ``take_while`` caps a run at ``max_chars`` via a byte-index equality
  check evaluated only at char starts (parser.rs:93-106); consequently
  ``TooManyDigits`` is unreachable from ``parse_num`` (parser.rs:213-226)
  — ``<4096>`` fails later with ``ExpectedTokenErr('>')``
  (test parser.rs:543-546).  At EOF the consumed prefix is dropped and
  callers report ``UnexpectedEndOfInput`` (parser.rs:105, 215).
* Terms (HOSTNAME/APP-NAME/PROCID/MSGID) are runs of bytes 33..=126,
  truncated at ``max_length`` bytes *without consuming the remainder*
  (parser.rs:318-341), so an over-long term fails on the following
  expected-space check.  A leading ``-`` is nil only when followed by
  EOF or a space byte (parser.rs:323); otherwise ``-foo`` is a real term
  (test parser.rs:624-639).
* Timestamps are hand-validated calendar dates (parser.rs:256-316);
  fractional seconds allow 1..=9 digits scaled by ``10^(9-n)`` to nanos
  (parser.rs:244-254, 277-278); the ``:`` between offset HH and MM is
  never checked (parser.rs:300-302); a 10th fractional digit leaks into
  the offset parser and yields ``InvalidUTCOffset`` (test parser.rs:588-590).
  Where the reference would panic on a short offset slice (Rust
  ``&irest[0..2]`` out of bounds), we raise ``UnexpectedEndOfInput``.
* SD: repeated SD-IDs merge into one element, repeated param keys last-wins
  (parser.rs:187-204, message.rs:62-67); ``[id]`` with no params is legal
  (test parser.rs:485-505); param values un-escape ``\\X`` -> ``X`` for any
  X (parser.rs:120-157); ``-`` only strips the dash, so ``-x`` is nil SD
  followed by msg ``"x"`` (parser.rs:189-191, 365-369).
* PRI: ``sev = pri & 7`` (never invalid), ``fac = pri >> 3`` must be <= 23
  else ``BadFacilityInPri`` (parser.rs:206-210).
* PROCID: classified as an int PID iff it parses as Rust ``i32``
  (optional sign, digits, within i32 range), else a name (parser.rs:357-360).

All offsets below are BYTE offsets into the UTF-8 encoding of the line,
mirroring Rust ``&str`` slicing.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "ParseError",
    "parse_line",
    "FACILITY_NAMES",
    "SEVERITY_NAMES",
    "ERROR_VARIANTS",
]

# facility.rs:87-114 — int -> name, 0..=23
FACILITY_NAMES = (
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
)

# severity.rs:57-68 — int -> name, 0..=7
SEVERITY_NAMES = ("emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")

# parser.rs:13-45 — ParseErr variant names (error taxonomy)
ERROR_VARIANTS = (
    "RegexDoesNotMatchErr",  # legacy, unreachable
    "BadSeverityInPri",      # unreachable: pri & 7 is always 0..=7
    "BadFacilityInPri",
    "UnexpectedEndOfInput",
    "TooFewDigits",
    "TooManyDigits",         # unreachable: take_while caps the digit run
    "InvalidUTCOffset",
    "BaseUnicodeError",      # unreachable here: term prefixes are pure ASCII
    "UnicodeError",
    "ExpectedTokenErr",
    "IntConversionErr",
    "MissingField",
    "InvalidMonth",
    "InvalidDate",
    "InvalidOffset",
)

_I32_MIN = -(2**31)
_I32_MAX = 2**31 - 1


class ParseError(Exception):
    """One ``ParseErr`` variant (parser.rs:13-45)."""

    __slots__ = ("variant", "detail")

    def __init__(self, variant: str, detail: str = ""):
        super().__init__(variant if not detail else f"{variant}({detail})")
        self.variant = variant
        self.detail = detail


def _char_len(lead_byte: int) -> int:
    """Length in bytes of the UTF-8 char starting with ``lead_byte``."""
    if lead_byte < 0x80:
        return 1
    if lead_byte < 0xE0:
        return 2
    if lead_byte < 0xF0:
        return 3
    return 4


def _take_while_digits(data: bytes, pos: int, max_chars: int):
    """take_while(is_ascii_digit) — parser.rs:93-106 via parse_num.

    Returns (end, has_rest): consumed = data[pos:end].  has_rest=False
    mirrors the Rust ("", None) EOF return (consumed prefix dropped).
    Non-ASCII chars fail the digit predicate, so pure byte iteration is
    exact here.
    """
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if not (0x30 <= b <= 0x39):
            return i, True
        if i - pos == max_chars:
            return i, True
        i += 1
    return n, False


def _take_while_sdid(data: bytes, pos: int, max_chars: int):
    """take_while(c != ' ' && c != '=' && c != ']') — parser.rs:108-117.

    Predicate and the max-chars equality check are evaluated per *char*
    (byte index of the char start), so multibyte chars are skipped whole —
    a char straddling the cap never triggers it, exactly like
    ``char_indices`` in the reference.
    """
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if b in (0x20, 0x3D, 0x5D):  # ' ', '=', ']'
            return i, True
        if i - pos == max_chars:
            return i, True
        i += _char_len(b)
    return n, False


def _expect(data: bytes, pos: int, byte: int, char: str) -> int:
    """take_char! — parser.rs:79-91."""
    if pos >= len(data):
        raise ParseError("UnexpectedEndOfInput")
    if data[pos] != byte:
        raise ParseError("ExpectedTokenErr", char)
    return pos + 1


def _parse_num(data: bytes, pos: int, min_digits: int, max_digits: int):
    """parse_num — parser.rs:213-226.  Returns (value, new_pos)."""
    end, has_rest = _take_while_digits(data, pos, max_digits)
    if not has_rest:
        raise ParseError("UnexpectedEndOfInput")
    ndig = end - pos
    if ndig < min_digits:
        raise ParseError("TooFewDigits")
    if ndig > max_digits:  # pragma: no cover — unreachable, kept for parity
        raise ParseError("TooManyDigits")
    # i32::from_str on a pure-digit run; all call sites cap digits such that
    # the value fits in i32, so IntConversionErr is unreachable here.
    return int(data[pos:end]), end


def _parse_decimal(data: bytes, pos: int, min_digits: int, max_digits: int):
    """parse_decimal — parser.rs:244-254: scale to nanoseconds.

    ``z = 10 - ndigits``; multiplicand = 10^(z-1); .52 -> 520000000,
    .000003 -> 3000 (goldens parser.rs:559-587).
    """
    val, end = _parse_num(data, pos, min_digits, max_digits)
    z = 10 - (end - pos)
    return val * (10 ** (z - 1)), end


_DAYS_IN_MONTH = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _is_leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 for a proleptic-Gregorian calendar date.

    Standard days-from-civil algorithm; replaces the reference's use of the
    ``time`` crate (parser.rs:309-314 assume_utc -> unix_timestamp).
    """
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _strict_int(data: bytes, lo: int, hi: int) -> int:
    """Rust integer ``from_str``: optional single +/- then 1+ ASCII digits,
    value within [lo, hi]; anything else -> IntConversionErr."""
    if not data:
        raise ParseError("IntConversionErr")
    i = 0
    neg = False
    if data[0] in (0x2B, 0x2D):  # '+', '-'
        neg = data[0] == 0x2D
        i = 1
    if i == len(data):
        raise ParseError("IntConversionErr")
    for b in data[i:]:
        if not (0x30 <= b <= 0x39):
            raise ParseError("IntConversionErr")
    val = int(data[i:])
    if neg:
        val = -val
    if not (lo <= val <= hi):
        raise ParseError("IntConversionErr")
    return val


def _parse_timestamp(data: bytes, pos: int):
    """parse_timestamp — parser.rs:256-316.

    Returns ((unix_seconds, nanos) | None, new_pos).  ``-`` -> None.
    The ``:`` between offset HH and MM is deliberately not validated
    (parser.rs:300-302).  Offsets are applied with RFC3339 sign semantics.
    """
    n = len(data)
    if pos < n and data[pos] == 0x2D:  # '-'
        return None, pos + 1
    year, pos = _parse_num(data, pos, 4, 4)
    pos = _expect(data, pos, 0x2D, "-")
    month, pos = _parse_num(data, pos, 2, 2)  # u8 via parse_num_generic
    if not 1 <= month <= 12:
        raise ParseError("InvalidMonth", str(month))
    pos = _expect(data, pos, 0x2D, "-")
    mday, pos = _parse_num(data, pos, 2, 2)
    dim = _DAYS_IN_MONTH[month - 1] + (1 if (month == 2 and _is_leap(year)) else 0)
    # time::Date::from_calendar_date — ComponentRange on the day field
    if not 1 <= mday <= dim:
        raise ParseError("InvalidDate", "day")
    pos = _expect(data, pos, 0x54, "T")
    hour, pos = _parse_num(data, pos, 2, 2)
    pos = _expect(data, pos, 0x3A, ":")
    minute, pos = _parse_num(data, pos, 2, 2)
    pos = _expect(data, pos, 0x3A, ":")
    second, pos = _parse_num(data, pos, 2, 2)
    if pos < n and data[pos] == 0x2E:  # '.'
        pos += 1
        nano, pos = _parse_decimal(data, pos, 1, 9)
    else:
        nano = 0
    # time::Time::from_hms_nano — ComponentRange on hour/minute/second
    if hour > 23:
        raise ParseError("InvalidDate", "hour")
    if minute > 59:
        raise ParseError("InvalidDate", "minute")
    if second > 59:
        raise ParseError("InvalidDate", "second")

    offset_seconds = 0
    if pos < n:
        b = data[pos]
        if b == 0x5A:  # 'Z' -> assume UTC
            pos += 1
        elif b == 0x2D or b == 0x2B:  # '-' / '+' — signs per RFC3339
            sign = -1 if b == 0x2D else 1
            irest = pos + 1
            # Rust slices irest[0..2] / irest[3..5]; a shorter remainder
            # would panic the reference — we reject instead, after the
            # same hour-parse the reference would attempt first.
            if n - irest < 2:
                raise ParseError("UnexpectedEndOfInput")
            hours = _strict_int(data[irest : irest + 2], -128, 127)  # i8
            if n - irest < 5:
                raise ParseError("UnexpectedEndOfInput")
            minutes = _strict_int(data[irest + 3 : irest + 5], -128, 127)
            pos = irest + 5
            h = hours * sign
            m = minutes * sign
            # time::UtcOffset::from_hms range checks; mismatched component
            # signs are coerced to the hour's sign (time 0.3 semantics)
            if not -23 <= h <= 23:
                raise ParseError("InvalidOffset")
            if not -59 <= m <= 59:
                raise ParseError("InvalidOffset")
            if (h > 0 and m < 0) or (h < 0 and m > 0):
                m = -m
            offset_seconds = h * 3600 + m * 60
        else:
            raise ParseError("InvalidUTCOffset")
    # else: EOF after seconds -> assume UTC (parser.rs:285-286)

    unix = (
        _days_from_civil(year, month, mday) * 86400
        + hour * 3600
        + minute * 60
        + second
        - offset_seconds
    )
    return (unix, nano), pos


def _parse_term(data: bytes, pos: int, min_length: int, max_length: int):
    """parse_term — parser.rs:318-341.  Returns (str | None, new_pos).

    Byte-oriented: a term is a run of bytes 33..=126; any other byte
    terminates it.  Truncates at max_length bytes WITHOUT consuming the
    rest; EOF inside a term is UnexpectedEndOfInput.
    """
    n = len(data)
    if pos < n and data[pos] == 0x2D and (n - pos <= 1 or data[pos + 1] == 0x20):
        return None, pos + 1
    i = pos
    while i < n:
        b = data[i]
        if b < 33 or b > 126:
            if i - pos < min_length:
                raise ParseError("TooFewDigits")
            return data[pos:i].decode("ascii"), i
        if i - pos >= max_length:
            return data[pos:i].decode("ascii"), i
        i += 1
    raise ParseError("UnexpectedEndOfInput")


def _parse_sd_id(data: bytes, pos: int):
    """parse_sd_id — parser.rs:108-117 (also used for PARAM-NAME)."""
    end, has_rest = _take_while_sdid(data, pos, 128)
    if not has_rest:
        raise ParseError("UnexpectedEndOfInput")
    return data[pos:end].decode("utf-8"), end


def _parse_param_value(data: bytes, pos: int):
    """parse_param_value — parser.rs:120-157: quoted string, ``\\X`` -> X."""
    pos = _expect(data, pos, 0x22, '"')
    n = len(data)
    i = pos
    saw_escape = False
    buf: Optional[bytearray] = None
    escaped = False
    while i < n:
        b = data[i]
        clen = _char_len(b)
        if escaped:
            escaped = False
            buf += data[i : i + clen]  # type: ignore[operator]
            i += clen
            continue
        if b == 0x5C:  # backslash: dropped, next char kept verbatim
            escaped = True
            if not saw_escape:
                buf = bytearray(data[pos:i])
                saw_escape = True
            i += 1
            continue
        if b == 0x22:  # closing quote
            val = bytes(buf) if saw_escape else data[pos:i]
            return val.decode("utf-8"), i + 1
        if saw_escape:
            buf += data[i : i + clen]  # type: ignore[operator]
        i += clen
    raise ParseError("UnexpectedEndOfInput")


def _parse_sd_params(data: bytes, pos: int):
    """parse_sd_params — parser.rs:161-176: zero+ ``SP name="value"``."""
    params = []
    n = len(data)
    while True:
        if pos >= n or data[pos] != 0x20:  # maybe_expect_char ' '
            return params, pos
        p = pos + 1
        name, p = _parse_sd_id(data, p)
        p = _expect(data, p, 0x3D, "=")
        value, p = _parse_param_value(data, p)
        params.append((name, value))
        pos = p


def _parse_sde(data: bytes, pos: int):
    """parse_sde — parser.rs:178-185: one ``[sd_id params]`` element."""
    pos = _expect(data, pos, 0x5B, "[")
    sd_id, pos = _parse_sd_id(data, pos)
    params, pos = _parse_sd_params(data, pos)
    pos = _expect(data, pos, 0x5D, "]")
    return (sd_id, params), pos


def _parse_sd(data: bytes, pos: int):
    """parse_sd — parser.rs:187-204.

    ``-`` strips only the dash (``-x`` -> empty SD, rest ``x``).  Repeated
    SD-IDs merge; repeated param keys last-wins.  Elements accumulate until
    EOF or a space following an element.
    """
    sd: dict = {}
    n = len(data)
    if pos < n and data[pos] == 0x2D:
        return sd, pos + 1
    while pos < n:
        (sd_id, params), pos = _parse_sde(data, pos)
        sub = sd.setdefault(sd_id, {})
        for k, v in params:
            sub[k] = v
        if pos < n and data[pos] == 0x20:
            break
    return sd, pos


def parse_line(data) -> dict:
    """parse_message — parser.rs:343-384.  Never raises.

    ``data`` is ``bytes`` (UTF-8) or ``str``.  Returns a dict:

    ok=True  -> severity, facility, version, timestamp, timestamp_nanos,
                hostname, appname, procid_pid, procid_name, msgid,
                sd (dict[str, dict[str, str]]), msg
    ok=False -> error (ParseErr variant name), error_detail
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    try:
        return _parse_message(data)
    except ParseError as e:
        return {"ok": False, "error": e.variant, "error_detail": e.detail}


def _parse_message(data: bytes) -> dict:
    pos = _expect(data, 0, 0x3C, "<")
    prival, pos = _parse_num(data, pos, 1, 3)
    pos = _expect(data, pos, 0x3E, ">")
    # parse_pri_val — parser.rs:206-210: sev always valid; fac must be <= 23
    severity = prival & 0x7
    facility = prival >> 3
    if facility > 23:
        raise ParseError("BadFacilityInPri")
    version, pos = _parse_num(data, pos, 1, 2)
    pos = _expect(data, pos, 0x20, " ")
    ts, pos = _parse_timestamp(data, pos)
    pos = _expect(data, pos, 0x20, " ")
    hostname, pos = _parse_term(data, pos, 1, 255)
    pos = _expect(data, pos, 0x20, " ")
    appname, pos = _parse_term(data, pos, 1, 48)
    pos = _expect(data, pos, 0x20, " ")
    procid, pos = _parse_term(data, pos, 1, 128)
    pos = _expect(data, pos, 0x20, " ")
    msgid, pos = _parse_term(data, pos, 1, 32)
    pos = _expect(data, pos, 0x20, " ")
    sd, pos = _parse_sd(data, pos)
    if pos < len(data) and data[pos] == 0x20:  # optional single SP before MSG
        pos += 1
    msg = data[pos:].decode("utf-8")

    # ProcId classification — parser.rs:357-360: PID iff it parses as i32
    procid_pid = None
    procid_name = None
    if procid is not None:
        try:
            procid_pid = _strict_int(procid.encode("ascii"), _I32_MIN, _I32_MAX)
        except ParseError:
            procid_name = procid

    return {
        "ok": True,
        "severity": severity,
        "facility": facility,
        "version": version,
        "timestamp": None if ts is None else ts[0],
        "timestamp_nanos": None if ts is None else ts[1],
        "hostname": hostname,
        "appname": appname,
        "procid_pid": procid_pid,
        "procid_name": procid_name,
        "msgid": msgid,
        "sd": sd,
        "msg": msg,
    }

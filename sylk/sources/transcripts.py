"""Deterministic synthetic transcript corpus (the pipeline's input table).

Schema per ``BASELINE.json`` ``input_hint``::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp[us]

Each ``text`` value is one RFC 5424 line.  Two generators:

* :func:`synth_transcripts` / :func:`write_transcripts` — standalone seeded
  corpus: every row is a pure function of its global row index (splitmix64
  hashing, no RNG state), so generation is embarrassingly parallel,
  restartable, and identical at any parallelism.  The mixture follows
  FIXTURES.md §1: conformance-corpus lines, generated valid lines covering
  all 24 facilities x 8 severities / nil combinations / 0-3 SD elements /
  escapes / 1-9 fractional digits / every offset form, and malformed lines
  hitting each reachable ``ParseErr`` variant (parser.rs:13-45).  conv_id
  assignment is skewed (a few hot conversations) to exercise salting.

* :func:`transcripts_from_events` — maps ``events.parquet`` rows into
  transcript rows with a construction that is *exactly* expressible in
  ANSI SQL (see ``__ray_entry__.oracle_sql``), so DuckDB can recompute the
  expected parse output from the source columns.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .corpus import MUST_PARSE, MUST_REJECT

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "python", "browser", "shell")
_APPS = ("nginx", "cron-runner", "authd", "kv-store", "scheduler", "CROND", "uwsgi")
_MSGS = (
    "",
    "worker heartbeat ok",
    'GET /v1/ok HTTP/1.1" 200 145',
    "connection reset by peer",
    "unicode msg éè寿司 ﻿end",
    "job finished rc=0",
)
_EPOCH_US = 1704067200 * 1_000_000  # 2024-01-01T00:00:00Z

_PARSE_LINES = [line for line, _ in MUST_PARSE.values()]
_REJECT_LINES = [line for line, _ in MUST_REJECT.values()]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic entropy source.
    uint64 wrap-around is the algorithm, not an accident."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _ts_string(h: int) -> str:
    """A valid RFC3339-ish timestamp string, form selected by ``h``."""
    year = 1975 + (h >> 8) % 120
    month = 1 + (h >> 16) % 12
    day = 1 + (h >> 21) % 28  # <=28: always calendar-valid
    hour = (h >> 26) % 24
    minute = (h >> 31) % 60
    sec = (h >> 37) % 60
    base = f"{year:04d}-{month:02d}-{day:02d}T{hour:02d}:{minute:02d}:{sec:02d}"
    form = (h >> 43) % 8
    if form >= 6:  # fractional seconds, 1-9 digits
        ndig = 1 + (h >> 46) % 9
        frac = str((h >> 24) % (10**ndig)).rjust(ndig, "0")
        base += "." + frac
    # NB: a bare no-offset timestamp is only legal at EOF (the next char
    # otherwise hits InvalidUTCOffset, parser.rs:285-297), so mid-message
    # valid lines always carry Z or +/-HH:MM.
    off = (h >> 50) % 4
    if off in (0, 1):
        return base + "Z"
    sign = "+" if off == 2 else "-"
    oh = (h >> 52) % 24
    om = ((h >> 57) % 4) * 15
    return f"{base}{sign}{oh:02d}:{om:02d}"


def _valid_line(i: int, h: int) -> str:
    """A grammatically valid line; PRI cycles through all 192 combos."""
    pri = i % 192
    version = 1 if h % 10 else 2
    ts = "-" if h % 7 == 0 else _ts_string(h)
    g = _splitmix64(np.uint64(h ^ 0xABCDEF))  # second hash for field picks
    g = int(g)
    hostname = "-" if g % 5 == 0 else ("-dash-host" if g % 5 == 1 else f"host{g % 50:02d}")
    appname = "-" if (g >> 8) % 4 == 0 else _APPS[(g >> 8) % len(_APPS)]
    procid = (
        "-"
        if (g >> 16) % 3 == 0
        else (str((g >> 16) % 100000) if (g >> 16) % 3 == 1 else f"p-{(g >> 16) % 97}")
    )
    msgid = "-" if (g >> 24) % 3 == 0 else f"m{(g >> 24) % 64}"
    n_sd = (g >> 32) % 4
    if n_sd == 0:
        sd = "-"
    else:
        parts = []
        for k in range(n_sd):
            sid = ("meta", "origin@32473", "exé")[k % 3]
            ps = []
            n_params = (g >> (34 + 2 * k)) % 3
            for p in range(n_params):
                key = f"k{p}"
                if (g >> (40 + k + p)) % 4 == 0:
                    val = ""  # empty param value (parser.rs:593-621)
                elif (g >> (40 + k + p)) % 4 == 1:
                    val = 'es\\"caped\\] v'  # \" and \] escapes
                else:
                    val = f"v{(g >> (8 * p)) % 1000}"
                ps.append(f' {key}="{val}"')
            parts.append(f"[{sid}{''.join(ps)}]")
        sd = "".join(parts)
    msg = _MSGS[(g >> 48) % len(_MSGS)]
    body = f" {msg}" if msg or (g >> 53) % 2 else ""
    return f"<{pri}>{version} {ts} {hostname} {appname} {procid} {msgid} {sd}{body}"


_MALFORMED = (
    lambda h: f"<{192 + h % 64}>1 - - - - - -",  # BadFacilityInPri
    lambda h: f"{h % 10} no pri here",  # ExpectedTokenErr('<')
    lambda h: "<134>Feb 18 20:53:31 haproxy[376]: I am a message",  # RFC3164
    lambda h: f"<1>1 2015-{13 + h % 80:02d}-01T00:00:00Z - - - - -",  # InvalidMonth
    lambda h: "<1>1 2015-02-30T00:00:00Z - - - - -",  # InvalidDate
    lambda h: "<1>1 2015-01-01T25:00:00Z - - - - -",  # InvalidDate(hour)
    lambda h: "<1>1 2015-01-01T00:00:00*00:00 - - - - -",  # InvalidUTCOffset
    lambda h: "<1>1 2015-01-01T00:00:00+99:00 - - - - -",  # InvalidOffset
    lambda h: f"<1>1 2003-08-24T05:14:15.{h % 10}122334455+07:00 - - - - -",  # 10 frac
    lambda h: "<1>1 -  - - - -",  # TooFewDigits (empty term)
    lambda h: '<1>1 - - - - - [meta key="unterminated',  # UnexpectedEndOfInput
    lambda h: f"<4096>{h % 10} - - - - - -",  # digit cap -> ExpectedTokenErr('>')
    lambda h: "<1>1 2015-01-01T00:00:00Z host - -",  # truncated header
)


def gen_text(i: int, h: int) -> str:
    """The line for global row index ``i`` (pure function; no RNG state)."""
    kind = i % 100
    if kind < 80:
        return _valid_line(i, h)
    if kind < 90:
        return _PARSE_LINES[h % len(_PARSE_LINES)]
    if kind < 97:
        return _MALFORMED[h % len(_MALFORMED)](h >> 13)
    return _REJECT_LINES[h % len(_REJECT_LINES)]


def synth_batch(indices: np.ndarray) -> pa.Table:
    """Transcript rows for a batch of global row indices (vectorized where
    it pays, per-row f-strings for line assembly)."""
    idx = indices.astype(np.uint64)
    hs = _splitmix64(idx)
    n = len(idx)
    # conv assignment: ~15% of rows land on 8 hot conversations (skew),
    # the rest spread over 4096 conv ids.
    hot = (hs % np.uint64(100)) < np.uint64(15)
    conv_num = np.where(
        hot, (hs >> np.uint64(7)) % np.uint64(8), (hs >> np.uint64(7)) % np.uint64(4096)
    )
    roles = [_ROLES[int(i) % 3] for i in indices % 3]
    texts = [gen_text(int(i), int(h)) for i, h in zip(indices, hs)]
    tools = [
        _TOOLS[int(h) % len(_TOOLS)] if r == "tool" else None
        for r, h in zip(roles, hs)
    ]
    return pa.table(
        {
            "conv_id": pa.array([f"conv-{c:06d}" for c in conv_num], pa.string()),
            "turn_idx": pa.array(indices.astype(np.int32), pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(_EPOCH_US + indices.astype(np.int64) * 1_000_000, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def synth_transcripts(n_rows: int) -> pa.Table:
    """The whole corpus as one Arrow table (small n only; tests)."""
    return synth_batch(np.arange(n_rows, dtype=np.int64))


def write_transcripts(path: str, n_rows: int, rows_per_file: int = 250_000) -> str:
    """Write the corpus as partitioned parquet under ``path`` (driver-side,
    chunked — used by bench/test setup; at scale you would generate with
    ``ray.data.range(n).map_batches(lambda b: synth_batch(b["id"]))``)."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for start in range(0, n_rows, rows_per_file):
        stop = min(start + rows_per_file, n_rows)
        fn = os.path.join(path, f"part-{start // rows_per_file:05d}.parquet")
        if os.path.exists(fn):
            continue  # deterministic content -> safe to skip (resume)
        pq.write_table(synth_batch(np.arange(start, stop, dtype=np.int64)), fn)
    return path


def transcripts_from_events(sf_dir: str):
    """Transcript Dataset derived from ``events.parquet`` by an ANSI-SQL-
    expressible mapping (the DuckDB oracle recomputes expected parse output
    from the same source columns — see ``__ray_entry__.oracle_sql``).

    Malformed rows: ``event_id % 23 == 7`` gets PRI 192+ (BadFacilityInPri).
    """
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    return ds.map_batches(events_to_transcripts, batch_format="pandas", batch_size=None)


def events_to_transcripts(df):
    """pandas batch fn for :func:`transcripts_from_events` (vectorized)."""
    import pandas as pd

    eid = df["event_id"]
    uid = df["user_id"]
    pri = (eid % 192).astype(str)
    tss = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    good = (
        "<" + pri + ">1 " + tss
        + " host" + (uid % 50).astype(str)
        + " " + df["event_type"]
        + " " + (eid % 65536).astype(str)
        + " m" + (eid % 1000).astype(str)
        + ' [meta seq="' + eid.astype(str) + '" user="' + uid.astype(str) + '"]'
        + " evt k=" + (eid % 7).astype(str)
    )
    bad = "<" + (192 + eid % 100).astype(str) + ">1 - - - - - -"
    role_idx = (eid % 3).astype(int)
    out = pd.DataFrame(
        {
            "conv_id": "conv-" + (uid % 100).astype(str),
            "turn_idx": eid.astype("int32"),
            "role": pd.Series(role_idx.map({0: "user", 1: "assistant", 2: "tool"})),
            "text": good.where(eid % 23 != 7, bad),
            "tool": df["event_type"].where(role_idx == 2, None),
            "ts": df["ts"],
        }
    )
    return out

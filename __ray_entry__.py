"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse → enrich → route → aggregate
pipeline (sylk/pipelines/flagship.py) end-to-end on sf0.001, including
the partitioned-sink write and the resume manifest; ``queries()`` /
``oracle_sql()`` expose every operator family from SURVEY.md §2 with
DuckDB-checkable oracles (sylk/pipelines/queries.py documents why the
parse-family oracles are exact).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in sylk) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

_SF_ENTRY = "/root/testdata/sf0.001"
_ENTRY_TMP = "/tmp/sylk_entry"


def entry() -> Any:
    """Flagship pipeline on sf0.001; returns the per-sink routed count
    table (route, route_key, n) — stable schema, >= 1 row."""
    from sylk.pipelines.flagship import run_flagship
    from sylk.sources.transcripts import transcripts_from_events

    tdir = os.path.join(_ENTRY_TMP, "transcripts")
    shutil.rmtree(_ENTRY_TMP, ignore_errors=True)
    transcripts_from_events(_SF_ENTRY).write_parquet(tdir)
    files = sorted(
        os.path.join(tdir, f) for f in os.listdir(tdir) if f.endswith(".parquet")
    )
    out = os.path.join(_ENTRY_TMP, "out")
    summary = run_flagship(files, out, files_per_unit=4)

    import pandas as pd

    rows = [
        {"route": "sink", "route_key": k, "n": int(v)}
        for k, v in sorted(summary["sink_counts"].items())
    ] + [
        {"route": "reject", "route_key": k, "n": int(v)}
        for k, v in sorted(summary["reject_by_error"].items())
    ]
    return pd.DataFrame(rows, columns=["route", "route_key", "n"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator family (SURVEY.md §2):
    parse grammar P0-P15, enrich lookups, router fan-out, two-phase and
    salted aggregates, filters, SD accessors, text analysis, dedup
    (exact/minhash/simhash/embedding), ANN (bruteforce/IVF), and the
    reference conformance corpus."""
    from sylk.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for every SQL-expressible query (the LSH /
    IVF / conformance entries are intentionally omitted → rows-only
    checks)."""
    from sylk.pipelines.queries import build_oracle_sql

    return build_oracle_sql()

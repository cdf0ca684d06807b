"""Flagship pipeline: transcripts -> parse -> enrich -> route -> aggregate.

The end-to-end composition the north rule names (BASELINE.json):

    read_parquet (transcript shards)
      -> map_batches(parse_batch)            stateless vectorized tasks
      -> map_batches(Enricher, concurrency)  actor pool, lookup in __init__
      -> route_and_write                     one hash-partitioned Hive write
      -> grouped counts                      two-phase shuffle-light
      -> Manifest.commit                     per-partition lineage + metrics

Checkpoint granularity is a *partition unit* (a group of input files):
each unit streams through the full pipeline with whole-cluster
parallelism, then commits one manifest line.  A resumed run skips
committed units; a crashed unit's deterministic output dir is
overwritten on retry (idempotent).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import ray.data

from ..stages.aggregate import grouped_counts_local
from ..stages.enrich import Enricher, enrich_batch
from ..stages.parse import parse_batch
from ..stages.router import route_and_write
from ..state.manifest import Manifest

# Columns the host/app histogram needs when re-reading routed output
# (prune at the read — never re-scan msg/sd for a count).  Sink and
# reject counters never re-read anything: they merge from the manifest.
_HIST_COLUMNS = ["ok", "hostname", "appname"]


def parse_enrich(ds, enrich_concurrency=None, enrich_mode: str = "tasks"):
    """parse + enrich stages on any transcript Dataset.

    ``batch_size=None`` = whole Arrow blocks per call: the parse regex
    compiles once per block instead of once per 1024 rows, and the
    vectorized kernels amortize.

    ``enrich_mode="tasks"`` (default): the enrich lookup runs as fused
    stateless tasks with a per-worker cached table (see
    ``enrich_batch``) — measured ~4x faster end-to-end than the actor
    pool at this state size, because warm task workers are reused
    across executions.  ``enrich_mode="actors"`` keeps the explicit
    actor-pool stage (the pattern for expensive state); beware Ray
    fuses the upstream stateless parse INTO the pool, so the pool
    ceiling caps parse parallelism too — it defaults to the cluster
    CPU count for that reason."""
    ds = ds.map_batches(
        parse_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    if enrich_mode == "tasks":
        return ds.map_batches(
            enrich_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    if enrich_concurrency is None:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
        enrich_concurrency = (1, max(2, n))
    return ds.map_batches(
        Enricher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        concurrency=enrich_concurrency,
    )


def _unit_counts_from_footers(unit_dir: str):
    """(sink_counts "fac/sev" -> n, reject_by_error -> n) from the Hive
    layout + parquet footer metadata only — zero data pages read."""
    import pyarrow.parquet as pq

    from ..functions.reference_semantics import FACILITY_NAMES, SEVERITY_NAMES

    fac_id = {n: i for i, n in enumerate(FACILITY_NAMES)}
    sev_id = {n: i for i, n in enumerate(SEVERITY_NAMES)}
    sinks: dict = {}
    rejects: dict = {}
    for f in glob.glob(os.path.join(unit_dir, "**", "*.parquet"), recursive=True):
        parts = dict(
            seg.split("=", 1)
            for seg in f.split(os.sep)
            if "=" in seg and not seg.endswith(".parquet")
        )
        n = pq.ParquetFile(f).metadata.num_rows
        route, key = parts["route"], parts["route_key"]
        if route == "reject":
            rejects[key] = rejects.get(key, 0) + n
        else:
            k = f"{fac_id[route]}/{sev_id[key]}"
            sinks[k] = sinks.get(k, 0) + n
    return sinks, rejects


def _merge_counts(acc: dict, pdf, keys):
    for row in pdf.itertuples(index=False):
        k = tuple(getattr(row, c) for c in keys)
        if len(keys) == 1:
            k = k[0]
        acc[k] = acc.get(k, 0) + int(row.n)
    return acc


def run_flagship(
    input_files: list[str],
    out_dir: str,
    files_per_unit: int = 16,
    enrich_concurrency=(1, 8),
    concurrent_units: int = 2,
    input_format: str = "parquet",
) -> dict:
    """Run the full pipeline over ``input_files`` with checkpoint/resume.

    Returns a summary dict: total rows, parse_ok, per-sink counts,
    reject counts, host/app histogram sizes, units run vs skipped.

    ``concurrent_units`` > 1 overlaps that many unit pipelines (each a
    full Ray Data execution) from driver threads: units are independent
    (own output dir, own manifest commit line), so this preserves the
    checkpoint/resume semantics while hiding per-unit barrier latency
    (the sort→write tail of one unit overlaps the read→parse head of
    the next).
    """
    import concurrent.futures as cf

    mf = Manifest(out_dir)
    done = mf.completed()
    units = [
        (f"u{ui:05d}", input_files[i : i + files_per_unit])
        for ui, i in enumerate(range(0, len(input_files), files_per_unit))
    ]
    totals = {"rows": 0, "parse_ok": 0, "units_run": 0, "units_skipped": 0}
    unit_dirs = []
    pending = []

    for uid, files in units:
        unit_dir = os.path.join(out_dir, "data", f"unit={uid}")
        unit_dirs.append(unit_dir)
        if uid in done and done[uid].get("input_files") == files:
            rec = done[uid]
            totals["units_skipped"] += 1
            totals["rows"] += rec["rows"]
            totals["parse_ok"] += rec["parse_ok"]
            continue
        # uid absent, or committed under a DIFFERENT file list (the unit
        # boundaries moved: files_per_unit or the input set changed) —
        # reusing the stale output would corrupt the global aggregates,
        # so wipe and re-run; the fresh commit line supersedes the old
        pending.append((uid, files, unit_dir))

    def _run_unit(uid, files, unit_dir):
        t0 = time.time()
        # a unit present on disk but absent from the manifest is a
        # crashed partial write: wipe it so the retry is idempotent
        # (Ray writes uniquely-named files; append would duplicate)
        shutil.rmtree(unit_dir, ignore_errors=True)
        # one block per input file -> the planner fuses the read into the
        # parse/enrich/route chain (no SplitBlocks, no extra plasma hop)
        if input_format == "text":
            # raw RFC 5424 line files (the crate's native input shape)
            ds = ray.data.read_text(files, drop_empty_lines=False)
        elif input_format == "text_gz":
            # rotated syslog archives; decompression streams in-task
            from ..sources.rawlines import read_syslog_lines_gz

            ds = read_syslog_lines_gz(files)
        else:
            ds = ray.data.read_parquet(files, override_num_blocks=len(files))
        parsed = parse_enrich(ds, enrich_concurrency)
        route_and_write(parsed, unit_dir)

        # per-unit metrics for the manifest come FREE from the routed
        # layout: the Hive dirs encode (route, route_key) and parquet
        # footers carry row counts — a footer scan, no data re-read
        sink_counts, reject_counts = _unit_counts_from_footers(unit_dir)
        rows = sum(sink_counts.values()) + sum(reject_counts.values())
        ok_rows = sum(sink_counts.values())
        mf.commit(
            uid,
            input_files=files,
            rows=rows,
            parse_ok=ok_rows,
            sink_counts=sink_counts,
            reject_by_error=reject_counts,
            output_path=unit_dir,
            wall_s=round(time.time() - t0, 3),
        )
        return rows, ok_rows

    if pending:
        with cf.ThreadPoolExecutor(max_workers=max(1, concurrent_units)) as ex:
            for rows, ok_rows in ex.map(lambda a: _run_unit(*a), pending):
                totals["rows"] += rows
                totals["parse_ok"] += ok_rows
                totals["units_run"] += 1

    # global sink/reject counters come from the MANIFEST — every unit in
    # this run (fresh or resumed) committed its per-unit counts, so a
    # resumed run re-reads ZERO bytes for them
    done = mf.completed()
    sink: dict = {}
    rejects: dict = {}
    for uid, _files in units:
        rec = done[uid]
        for k, n in rec.get("sink_counts", {}).items():
            fac, sev = (int(x) for x in k.split("/"))
            key = (fac, sev)
            sink[key] = sink.get(key, 0) + int(n)
        for err, n in rec.get("reject_by_error", {}).items():
            rejects[err] = rejects.get(err, 0) + int(n)

    # only the host/app histogram genuinely needs the routed rows again
    # (its key is not in the Hive layout): one columnar re-read pruned to
    # three narrow columns (this Ray version's read_parquet takes a list
    # of FILES, not dirs)
    all_files = [
        f
        for d in unit_dirs
        for f in sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    ]
    back = ray.data.read_parquet(all_files, columns=_HIST_COLUMNS)
    ha = grouped_counts_local(back, ["hostname", "appname"], ok_filter=True)
    hostapp: dict = {}
    _merge_counts(hostapp, ha.to_pandas(), ["hostname", "appname"])
    return {
        **totals,
        "sink_counts": sink,
        "reject_by_error": rejects,
        "host_app_histogram": hostapp,
        "out_dir": out_dir,
    }


def follow_flagship(input_glob: str, out_dir: str, poll_s: float = 2.0,
                    idle_exit: int = 3, max_polls: int | None = None,
                    **run_kw) -> dict:
    """Micro-batch follow mode — the Ray-Data shape of the crate's
    sustained syslog-server ingestion (reference: rust-syslog-rfc5424
    is built to parse a continuous server feed; here the feed is a
    growing directory of rotated shards).

    Polls ``input_glob`` every ``poll_s`` seconds; whenever the sorted
    file list grows, re-enters :func:`run_flagship` — committed units
    skip via the manifest, so each wake processes ONLY the new shards
    (append-ordered names keep unit boundaries stable; a file that
    sorts before existing shards shifts boundaries and re-runs from the
    first moved unit, which is correct, just not incremental).  Exits
    after ``idle_exit`` consecutive empty polls (or ``max_polls``).

    Returns the last run's summary plus follow-loop counters.  Crash
    safety is inherited: a killed follow loop resumes exactly like a
    killed batch run."""
    seen: list[str] | None = None
    summary: dict = {}
    polls = wakes = idle = 0
    while True:
        polls += 1
        files = sorted(glob.glob(input_glob))
        if files and files != seen:
            summary = run_flagship(files, out_dir, **run_kw)
            seen = files
            wakes += 1
            idle = 0
        else:
            idle += 1
        if idle >= idle_exit or (max_polls is not None
                                 and polls >= max_polls):
            break
        time.sleep(poll_s)
    return {**summary, "follow_polls": polls, "follow_wakes": wakes}

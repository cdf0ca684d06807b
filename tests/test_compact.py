"""Small-file compaction: content preservation, idempotence, atomicity."""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylk.stages.compact import compact_partitions  # noqa: E402


def _make_store(root, n_parts=3, files_per_part=8, rows_per_file=50):
    """Hive-ish store: n_parts leaf dirs, each with many small files."""
    rid = 0
    for p in range(n_parts):
        d = os.path.join(root, f"k={p}")
        os.makedirs(d, exist_ok=True)
        for f in range(files_per_part):
            tbl = pa.table({
                "id": pa.array(range(rid, rid + rows_per_file), pa.int64()),
                "v": pa.array([(rid + i) % 7 for i in range(rows_per_file)],
                              pa.int64()),
            })
            pq.write_table(tbl, os.path.join(d, f"part-{f:04d}.parquet"))
            rid += rows_per_file


def _read_all_sorted(root):
    import pyarrow.dataset as pads

    t = pads.dataset(root, format="parquet", partitioning="hive").to_table()
    return t.sort_by("id").select(["id", "v"])


def test_compact_preserves_rows_and_reduces_files(ray_session, tmp_path):
    root = str(tmp_path / "store")
    _make_store(root)
    before = _read_all_sorted(root)
    n_files_before = sum(
        f.endswith(".parquet") for _, _, fs in os.walk(root) for f in fs)

    stats = compact_partitions(root, target_rows=1 << 20)
    assert stats["dirs"] == 3
    assert stats["files_before"] == n_files_before == 24
    assert stats["files_after"] == 3  # one output file per leaf dir
    assert stats["rows"] == before.num_rows

    after = _read_all_sorted(root)
    assert after.equals(before)
    n_files_after = sum(
        f.endswith(".parquet") for _, _, fs in os.walk(root) for f in fs)
    assert n_files_after == 3
    # no temp debris left behind
    assert not any(f.endswith(".tmp")
                   for _, _, fs in os.walk(root) for f in fs)


def test_compact_idempotent_and_respects_target(ray_session, tmp_path):
    root = str(tmp_path / "store")
    _make_store(root, n_parts=2, files_per_part=6, rows_per_file=40)
    before = _read_all_sorted(root)

    # target 100 rows -> 240 rows/dir -> 3 output files per dir
    stats1 = compact_partitions(root, target_rows=100)
    assert stats1["files_after"] == 6
    after1 = _read_all_sorted(root)
    assert after1.equals(before)

    # second run: already at/below the target file count -> all skipped
    stats2 = compact_partitions(root, target_rows=100)
    assert stats2["files_before"] == stats2["files_after"] == 6
    after2 = _read_all_sorted(root)
    assert after2.equals(before)


def test_compact_partition_column_untouched(ray_session, tmp_path):
    """Hive key column survives a compaction round-trip."""
    import pyarrow.dataset as pads

    root = str(tmp_path / "store")
    _make_store(root, n_parts=2, files_per_part=4, rows_per_file=10)
    compact_partitions(root, target_rows=1 << 20)
    t = pads.dataset(root, format="parquet", partitioning="hive").to_table()
    keys = pc.unique(t.column("k")).to_pylist()
    assert sorted(int(k) for k in keys) == [0, 1]


def _crash_after(monkeypatch, module, fname, calls_before_crash):
    """Make module.fname raise after N successful calls (crash injection)."""
    real = getattr(module, fname)
    state = {"n": 0}

    def wrapper(*a, **k):
        if state["n"] >= calls_before_crash:
            raise RuntimeError("injected crash")
        state["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(module, fname, wrapper)
    return lambda: monkeypatch.setattr(module, fname, real)


def test_compact_crash_before_commit_loses_nothing(tmp_path, monkeypatch):
    """Crash while writing tmps (pre-commit): originals untouched, stale
    tmps cleaned on rerun, rows exact."""
    from sylk.stages import compact as C

    root = str(tmp_path / "store")
    _make_store(root, n_parts=1)
    before = _read_all_sorted(root)
    d = os.path.join(root, "k=0")

    restore = _crash_after(monkeypatch, C.pq, "write_table", 1)
    try:
        C._compact_one(d, 100)   # 4 output files -> crash after tmp #1
        assert False, "expected injected crash"
    except RuntimeError:
        pass
    restore()
    # crash window: some tmps on disk, no marker, all originals intact
    assert any(f.endswith(".tmp") for f in os.listdir(d))
    assert _read_all_sorted(root).equals(before)
    stats = C._compact_one(d, 1 << 20)
    assert not stats["skipped"] and stats["rows"] == before.num_rows
    assert _read_all_sorted(root).equals(before)
    assert not any(f.endswith(".tmp") or f == "_commit.json"
                   for f in os.listdir(d))


def test_compact_crash_after_commit_rolls_forward(tmp_path, monkeypatch):
    """Crash right after the commit marker lands (before any rename):
    rerun finishes the plan — exact rows, one generation, no dupes."""
    from sylk.stages import compact as C

    root = str(tmp_path / "store")
    _make_store(root, n_parts=1)
    before = _read_all_sorted(root)
    d = os.path.join(root, "k=0")

    real_finish = C._finish_commit
    monkeypatch.setattr(C, "_finish_commit",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("injected crash")))
    try:
        C._compact_one(d, 1 << 20)
        assert False, "expected injected crash"
    except RuntimeError:
        pass
    monkeypatch.setattr(C, "_finish_commit", real_finish)
    # crash window: marker + tmps + originals all present — readers see
    # the originals only (tmps aren't .parquet)
    assert os.path.exists(os.path.join(d, "_commit.json"))
    assert _read_all_sorted(root).equals(before)
    stats = C._compact_one(d, 1 << 20)
    # recovery rolled the pending commit forward; the dir is now compact
    assert stats["skipped"] and stats["rows"] == before.num_rows
    assert _read_all_sorted(root).equals(before)
    assert not os.path.exists(os.path.join(d, "_commit.json"))
    assert sum(f.endswith(".parquet") for f in os.listdir(d)) == 1


def test_compact_crash_mid_delete_converges(tmp_path):
    """Crash mid-delete (post-commit, renames done, some originals
    left): rerun removes the stragglers — no duplicated rows."""
    import json

    from sylk.stages import compact as C

    root = str(tmp_path / "store")
    _make_store(root, n_parts=1)
    before = _read_all_sorted(root)
    d = os.path.join(root, "k=0")

    # build the post-rename, partially-deleted state by hand
    names = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    tbl = pa.concat_tables(
        [pq.read_table(os.path.join(d, f)) for f in names])
    pq.write_table(tbl, os.path.join(d, "compacted_1_00000.parquet"))
    plan = {"renames": [["_compact_00000.tmp", "compacted_1_00000.parquet"]],
            "remove": names}
    with open(os.path.join(d, "_commit.json"), "w") as fh:
        json.dump(plan, fh)
    for f in names[: len(names) // 2]:
        os.remove(os.path.join(d, f))

    stats = C._compact_one(d, 1 << 20)
    assert stats["skipped"] and stats["rows"] == before.num_rows
    assert _read_all_sorted(root).equals(before)
    assert sum(f.endswith(".parquet") for f in os.listdir(d)) == 1


def test_recompaction_generation_names_disjoint(tmp_path):
    """Compacting a dir whose inputs are a previous compaction's output
    plus new appends never collides final names with input names."""
    from sylk.stages import compact as C

    root = str(tmp_path / "store")
    _make_store(root, n_parts=1, files_per_part=4)
    d = os.path.join(root, "k=0")
    C._compact_one(d, 100)          # gen 1: 200 rows -> 2 files
    _make_store_append = pa.table({
        "id": pa.array(range(10_000, 10_050), pa.int64()),
        "v": pa.array([i % 7 for i in range(10_000, 10_050)], pa.int64())})
    pq.write_table(_make_store_append, os.path.join(d, "part-new.parquet"))
    before = _read_all_sorted(root)
    stats = C._compact_one(d, 1 << 20)
    assert not stats["skipped"]
    assert _read_all_sorted(root).equals(before)
    names = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert names == ["compacted_2_00000.parquet"]

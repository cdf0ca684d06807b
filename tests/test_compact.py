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

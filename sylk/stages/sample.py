"""Deterministic content-hash sampling.

The right way to sample at corpus scale: membership is a pure function
of row content (md5), so the sample is identical across runs, cluster
sizes, resumes, and engines — no RNG state to coordinate, and DuckDB
can recompute it bitwise (``md5_number_lower`` = the little-endian
integer of digest bytes 8..16, verified in tests).  A salt namespaces
independent samples of the same data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def content_hash64(texts, salt: str = "") -> np.ndarray:
    """Per-value uint64: little-endian digest bytes [8:16] of
    md5(salt + value) — bit-identical to DuckDB ``md5_number_lower``
    when salt is ''."""
    pre = salt.encode("utf-8")
    return np.array(
        [
            int.from_bytes(hashlib.md5(pre + t.encode("utf-8")).digest()[8:16], "little")
            if t is not None
            else 0
            for t in texts
        ],
        dtype=np.uint64,
    )


def sample_batch(batch: pa.Table, column: str, percent: int, salt: str = "") -> pa.Table:
    """Keep rows where hash(content) % 100 < percent."""
    h = content_hash64(batch.column(column).to_pylist(), salt)
    keep = (h % np.uint64(100)) < np.uint64(percent)
    return batch.filter(pa.array(keep))


def deterministic_sample(ds, column: str, percent: int, salt: str = ""):
    """Streaming deterministic sample of ``percent``% of rows by content
    hash of ``column`` — one stateless map_batches, no shuffle."""
    return ds.map_batches(
        lambda b: sample_batch(b, column, percent, salt),
        batch_format="pyarrow",
        batch_size=None,
    )

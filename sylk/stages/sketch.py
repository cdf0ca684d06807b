"""Approximate distinct-count sketch (HyperLogLog) as a Ray Data
combiner-state aggregate.

The pattern this demonstrates matters more than the sketch itself: a
MERGEABLE per-block partial (here a 2^b-register byte array, merged by
elementwise max) is how any sketch/accumulator state rides Ray Data at
100 TB — each block contributes one tiny partial, merge order is
irrelevant, and the exchange volume is O(blocks x m), independent of
row count or key cardinality.  (The reference has no approximate
aggregates — SURVEY.md §2.3 — this is a training-data-pipeline
extension.)

Hashing is pandas ``hash_array`` (SipHash, fixed key) — deterministic
across processes/workers, unlike Python ``hash``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_B = 10                     # 2^10 = 1024 registers
_M = 1 << _B
# bias constant for m >= 128 (Flajolet et al. 2007)
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hash_strings(values: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.util.hash_array(values, categorize=False).astype(np.uint64)


def _floor_log2(w: np.ndarray) -> np.ndarray:
    """Branchless vectorized floor(log2(w)) for w > 0 (uint64)."""
    r = np.zeros(len(w), np.int64)
    w = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = w >= (np.uint64(1) << np.uint64(s))
        r[mask] += s
        w[mask] >>= np.uint64(s)
    return r


def hll_partial(values: np.ndarray) -> np.ndarray:
    """Register array (uint8[m]) for one batch of string values."""
    regs = np.zeros(_M, np.uint8)
    vals = values[values != np.array(None)] if values.dtype == object else values
    if len(vals) == 0:
        return regs
    h = _hash_strings(vals)
    idx = (h >> np.uint64(64 - _B)).astype(np.int64)
    rest = h << np.uint64(_B)  # top 64-b bits shifted out; w in upper bits
    rank = np.where(rest == 0, 64 - _B + 1, 63 - _floor_log2(rest) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(partials) -> np.ndarray:
    """Elementwise-max merge — associative, commutative, idempotent."""
    out = np.zeros(_M, np.uint8)
    for p in partials:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range correction."""
    est = _ALPHA * _M * _M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * _M and zeros > 0:
        est = _M * np.log(_M / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, column: str) -> dict:
    """Approximate distinct count of a string column.

    One streaming pass: each block emits its 1KiB register row; the
    driver merges by max and estimates.  Exchange volume is
    O(blocks x 1KiB) regardless of data size.
    """
    import ray

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        regs = hll_partial(vals)
        return pa.table({"registers": pa.array([regs], pa.list_(pa.uint8(), _M))})

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    tables = ray.get(partials.to_arrow_refs())
    regs = hll_merge(
        np.asarray(row, dtype=np.uint8)
        for t in tables
        for row in t.column("registers").to_pylist()
    )
    return {"estimate": hll_estimate(regs), "registers": regs}

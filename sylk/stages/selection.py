"""Exact distributed quantile SELECTION over unbounded (double) domains.

``aggregate.grouped_quantiles`` is exact for bounded integer domains
(histogram state = |distinct values|).  For continuous columns the
histogram degenerates to the dataset itself, so this module implements
the classic 3-pass distributed selection instead — exact, streaming,
driver state bounded by the sample size:

1. pass A — per block: row count + a DETERMINISTIC value sample (the k
   smallest ``splitmix64(bits(v), salt)`` per block: reproducible across
   runs/block layouts, no RNG state; same philosophy as
   ``sample.content_hash64``).  Driver gets one tiny row per block.
2. pass B — candidate pivots = up to ``n_candidates`` evenly spaced
   order statistics of the pooled sample, broadcast once; per block one
   vectorized ``searchsorted`` emits counts <= each candidate.  Driver
   sums to exact global ranks and brackets every target rank between
   adjacent candidates.
3. pass C — collect only the values inside the (union of) brackets —
   expected ~n / n_candidates values per bracket for a well-mixed
   sample — and select the exact order statistic driver-side.

Rank convention = percentile_disc / DuckDB ``quantile_disc``:
1-indexed max(1, ceil(q * n)), same as ``grouped_quantiles``.

The input is re-read once per pass (3 reads total); at corpus scale
either point the passes at the parquet store (reads are column-pruned to
ONE column) or ``materialize()`` upstream if the column is already the
product of heavy compute.

Scale bound: pass A ships #blocks x ``sample_per_block`` doubles to the
driver — size ``sample_per_block`` ~ target_total / expected_blocks
when block counts are huge (the candidate set only needs ~10^3-10^4
pooled points for tight brackets; more sample buys narrower pass-C
brackets, not correctness).  Pass C collects ~n / n_candidates values
per requested quantile; a pathological value distribution (one value >
bracket width of the mass) widens a bracket to its duplicate count —
still exact, bounded by the heaviest single value's multiplicity.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


from ..functions.hashing import mix64 as _mix64


def _values_at_ranks(ds, col: str, ranks_fn, sample_per_block: int = 4096,
                     n_candidates: int = 512, salt: int = 0):
    """Core 3-pass exact rank selection: ``ranks_fn(total) -> [rank]``
    (1-based) is evaluated once the global count is known; returns
    ``(total, {rank: value})``.  Shared by the discrete and the
    interpolated (cont) quantile fronts."""
    import ray

    # --- pass A: block counts + deterministic per-block sample ----------
    def _sample(b: pa.Table) -> pa.Table:
        v = b.column(col).drop_null().to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        h = _mix64(v.view(np.uint64) ^ np.uint64(salt))
        k = min(sample_per_block, len(v))
        take = np.argpartition(h, k - 1)[:k] if 0 < k < len(v) else \
            np.arange(len(v))
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "sample": pa.array([np.sort(v[take]).tolist()],
                               pa.list_(pa.float64())),
        })

    parts = ds.map_batches(_sample, batch_format="pyarrow",
                           batch_size=None).take_all()
    total = int(sum(p["n"] for p in parts))
    if total == 0:
        return 0, {}
    pool = np.sort(np.concatenate(
        [np.asarray(p["sample"], dtype=np.float64) for p in parts]))
    ranks = sorted(set(ranks_fn(total)))

    # --- pass B: exact global ranks of <=512 candidate pivots -----------
    idx = np.unique(np.linspace(0, len(pool) - 1,
                                min(n_candidates, len(pool))).astype(np.int64))
    cand = np.unique(pool[idx])
    cand_ref = ray.put(cand)

    def _counts(b: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        v = np.sort(b.column(col).drop_null().to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        le = np.searchsorted(v, c, side="right").astype(np.int64)
        return pa.table({"le": pa.array([le.tolist()],
                                        pa.list_(pa.int64()))})

    le_parts = ds.map_batches(_counts, batch_format="pyarrow",
                              batch_size=None).take_all()
    count_le = np.sum([np.asarray(p["le"], dtype=np.int64)
                       for p in le_parts], axis=0)

    # --- bracket each rank, pass C: collect bracket values, select ------
    out = []
    lo_list, hi_list = [], []
    for r in ranks:
        j = int(np.searchsorted(count_le, r, side="left"))
        lo = cand[j - 1] if j > 0 else -np.inf
        hi = cand[j] if j < len(cand) else np.inf
        lo_list.append(lo)
        hi_list.append(hi)
    lo_arr, hi_arr = np.array(lo_list), np.array(hi_list)
    lo_ref = ray.put((lo_arr, hi_arr))

    def _bracket(b: pa.Table) -> pa.Table:
        lo_a, hi_a = ray.get(lo_ref)
        v = b.column(col).drop_null().to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        keep = np.zeros(len(v), dtype=bool)
        for lo, hi in zip(lo_a, hi_a):
            keep |= (v > lo) & (v <= hi)
        return pa.table({"v": pa.array(v[keep], pa.float64())})

    bracket_tbl = ds.map_batches(_bracket, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
    bvals = np.sort(bracket_tbl["v"].to_numpy())
    for r, lo, hi in zip(ranks, lo_arr, hi_arr):
        if lo == -np.inf:
            below = 0
        else:
            below = int(count_le[int(np.searchsorted(cand, lo))])
        mine = bvals[(bvals > lo) & (bvals <= hi)]
        out.append(float(np.sort(mine)[r - below - 1]))
    return total, dict(zip(ranks, out))


def distributed_quantiles(ds, col: str, qs, sample_per_block: int = 4096,
                          n_candidates: int = 512, salt: int = 0):
    """Exact q-quantiles (discrete, element-of-input, DuckDB
    quantile_disc rank convention max(1, ceil(q*n))) of ``ds[col]`` ->
    list of floats aligned with ``qs``.  Nulls are excluded (matching
    SQL aggregate semantics)."""
    qs = list(qs)
    total, at = _values_at_ranks(
        ds, col, lambda n: [max(1, math.ceil(q * n)) for q in qs],
        sample_per_block, n_candidates, salt)
    if total == 0:
        return [None] * len(qs)
    return [at[max(1, math.ceil(q * total))] for q in qs]


def distributed_quantiles_cont(ds, col: str, qs,
                               sample_per_block: int = 4096,
                               n_candidates: int = 512, salt: int = 0):
    """INTERPOLATED q-quantiles (DuckDB/Postgres quantile_cont
    convention: h = q*(n-1), lerp between the order statistics at
    floor(h)+1 and floor(h)+2) — bit-compatible IEEE op order
    ``lo*(1-frac) + hi*frac`` (DuckDB's Interpolate, confirmed by
    probe; ``lo + frac*(hi-lo)`` differs in the last ulp)."""
    qs = list(qs)

    def _ranks(n):
        rr = []
        for q in qs:
            h = q * (n - 1)
            lo = int(math.floor(h))
            rr.append(lo + 1)
            rr.append(min(lo + 2, n))
        return rr

    total, at = _values_at_ranks(ds, col, _ranks,
                                 sample_per_block, n_candidates, salt)
    if total == 0:
        return [None] * len(qs)
    out = []
    for q in qs:
        h = q * (total - 1)
        lo = int(math.floor(h))
        frac = h - lo
        v_lo = at[lo + 1]
        v_hi = at[min(lo + 2, total)]
        out.append(v_lo * (1 - frac) + v_hi * frac)
    return out

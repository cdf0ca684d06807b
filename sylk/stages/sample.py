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


def stratified_sample(ds, column: str, group_col: str, rates: dict,
                      default_percent: int = 0, salt: str = ""):
    """Per-group deterministic sampling rates (percent per group value,
    e.g. ``{"en": 30, "de": 10}``): keep rows where
    hash(content) % 100 < rate[group].  Same zero-shuffle stateless map
    as :func:`deterministic_sample`; the rate map is captured in the
    task closure (tiny — shipped once per task, not per batch)."""

    def _filt(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(column).to_pylist(), salt)
        groups = batch.column(group_col).to_pylist()
        pct = np.array([rates.get(g, default_percent) for g in groups],
                       dtype=np.uint64)
        keep = (h % np.uint64(100)) < pct
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filt, batch_format="pyarrow", batch_size=None)


_BAL_SCALE = 1_000_000


def balanced_resample(ds, column: str, group_col: str,
                      scale: int = _BAL_SCALE, salt: str = ""):
    """Deterministic class rebalancing (the training-mix step that
    equalizes languages/sources): downsample every group to the
    SMALLEST group's expected size with keep probability
    ``c_min / c_g``, realized as the integer threshold
    ``(scale * c_min) // c_g`` on ``hash(content) % scale`` — all
    integer arithmetic, so membership is a pure function of content and
    the global counts, and an engine replaying the same formula selects
    the identical rows (no RNG, no float rate).

    Two phases: a keyed count over ``group_col`` (tiny result — one row
    per class) collected to a threshold map shipped in the task
    closure, then the same zero-shuffle stateless filter as
    :func:`stratified_sample`.  The input is traversed twice (counts,
    then filter) — at scale, point the second pass at a materialized /
    checkpointed dataset to avoid recomputing an expensive upstream."""
    counts = {r[group_col]: r["count()"]
              for r in ds.groupby(group_col).count().take_all()}
    if not counts:
        return ds
    c_min = min(counts.values())
    thresholds = {g: (scale * c_min) // c for g, c in counts.items()}

    def _filt(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(column).to_pylist(), salt)
        groups = batch.column(group_col).to_pylist()
        thr = np.array([thresholds.get(g, 0) for g in groups],
                       dtype=np.uint64)
        keep = (h % np.uint64(scale)) < thr
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filt, batch_format="pyarrow", batch_size=None)


def weighted_priority_sample(ds, column: str, weight_col: str, k: int,
                             id_col: str, salt: str = ""):
    """Deterministic weighted top-k sample: keep the ``k`` rows with
    the smallest ``hash64(content) // max(weight, 1)`` (ties broken by
    ``id_col``).  A row with weight ``w`` has its uniform 64-bit hash
    shrunk by ``w``, so inclusion probability grows ~linearly with
    weight while staying a pure function of content — the weighted
    analogue of :func:`deterministic_sample` (same sample across runs,
    cluster sizes, and engines; integer-only, so DuckDB replays it
    bitwise with ``md5_number_lower(col) // w``).

    Each block keeps only its own k best rows (partial top-k — the
    exchange payload is k×blocks rows, never the corpus), then a
    global sort+limit runs on the reduced candidate set."""
    kk = int(k)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_prio", pa.array([], pa.uint64()))
        h = content_hash64(batch.column(column).to_pylist(), salt)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        prio = h // np.maximum(w, 1).astype(np.uint64)
        t = batch.append_column("_prio", pa.array(prio))
        if t.num_rows > kk:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, prio))[:kk]
            t = t.take(pa.array(order))
        return t

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    return partials.sort(["_prio", id_col]).limit(kk)


def group_reservoir(ds, column: str, group_col: str, k: int,
                    id_col: str, salt: str = ""):
    """Deterministic fixed-size sample per group: the k rows with the
    SMALLEST content hash (ties broken by ``id_col``) — a rank-by-hash
    reservoir that is identical across runs, cluster sizes, and block
    layouts (unlike a stateful reservoir, which is order-dependent).

    Two-phase: each block keeps at most k rows per group seen in it
    (partial top-k — the only shuffle payload), then a final per-group
    top-k over the partials.  Equivalent SQL:
    ``row_number() OVER (PARTITION BY group ORDER BY md5_number_lower(col), id) <= k``.
    """
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("_h", pa.array([], pa.uint64()))
        h = content_hash64(batch.column(column).to_pylist(), salt)
        t = batch.append_column("_h", pa.array(h))
        df = t.to_pandas()
        df = df.sort_values(["_h", id_col], kind="mergesort") \
               .groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["_h", id_col], kind="mergesort").head(k) \
                .drop(columns=["_h"])

    return partials.groupby(group_col).map_groups(_final,
                                                  batch_format="pandas")

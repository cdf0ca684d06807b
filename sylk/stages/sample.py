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

# --- vectorized MD5 (RFC 1321) over packed Arrow string buffers -------------
#
# The sample / split / shuffle / checksum family hashes EVERY row of a
# full-corpus scan, so a per-row Python ``hashlib.md5`` loop is the
# hottest interpreter loop in the engine.  This kernel computes all the
# digests of a block simultaneously in numpy uint32 arithmetic directly
# on the Arrow offsets+data buffers (no to_pylist, no per-row objects):
# one (rows x 64)-byte padded-block gather + 64 vectorized rounds per
# 64-byte block, with a row mask for multi-block (>55-byte) messages.
# Bit-exact vs hashlib / DuckDB md5_number_lower — differentially
# fuzz-tested in tests/test_training_ops.py::test_content_hash64_kernel.

_MD5_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * 2.0**32).astype(np.uint64).astype(np.uint32)
_MD5_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 +
                  [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, dtype=np.uint32)
# per-round message-word index g
_MD5_G = np.array(
    [i for i in range(16)] +
    [(5 * i + 1) % 16 for i in range(16, 32)] +
    [(3 * i + 5) % 16 for i in range(32, 48)] +
    [(7 * i) % 16 for i in range(48, 64)], dtype=np.int64)


_MD5_SLAB = 16384  # rows per inner slab: keeps every temporary small
                   # (slab x 64 bytes chunk matrix, 64KB round registers),
                   # so buffers stay cache-warm and the allocator reuses
                   # them instead of mmap-churning 100MB+ temporaries
                   # (measured: unslabbed was 10-100x slower and erratic
                   # under memory pressure)

_MD5_SH = [int(s) for s in _MD5_S]
_MD5_GI = [int(g) for g in _MD5_G]


def _md5_rounds(Mt, aa, bb, cc, dd, f, x):
    """64 MD5 rounds over all rows at once, fully in-place (two scratch
    registers; the spent ``aa`` buffer is recycled as the new ``bb``
    each round).  ``Mt``: (16, rows) contiguous message words."""
    for i in range(64):
        if i < 16:     # (b&c)|(~b&d)  ==  d ^ (b & (c^d))
            np.bitwise_xor(cc, dd, out=f)
            np.bitwise_and(f, bb, out=f)
            np.bitwise_xor(f, dd, out=f)
        elif i < 32:   # (d&b)|(~d&c)  ==  c ^ (d & (b^c))
            np.bitwise_xor(bb, cc, out=f)
            np.bitwise_and(f, dd, out=f)
            np.bitwise_xor(f, cc, out=f)
        elif i < 48:   # b^c^d
            np.bitwise_xor(bb, cc, out=f)
            np.bitwise_xor(f, dd, out=f)
        else:          # c ^ (b|~d)
            np.bitwise_not(dd, out=f)
            np.bitwise_or(f, bb, out=f)
            np.bitwise_xor(f, cc, out=f)
        np.add(aa, f, out=aa)
        np.add(aa, _MD5_K[i], out=aa)
        np.add(aa, Mt[_MD5_GI[i]], out=aa)
        s = _MD5_SH[i]
        np.left_shift(aa, s, out=x)
        np.right_shift(aa, 32 - s, out=aa)
        np.bitwise_or(x, aa, out=aa)
        np.add(bb, aa, out=aa)
        aa, dd, cc, bb = dd, cc, bb, aa
    return aa, bb, cc, dd


def _md5_hi64(raw: np.ndarray, off: np.ndarray) -> np.ndarray:
    """uint64 little-endian digest bytes [8:16] of md5 over each
    ``raw[off[i]:off[i+1]]`` slice — vectorized, slab at a time.
    (Little-endian host assumed — the ``<u4`` block view.)

    ``raw``: uint8 view of the packed value bytes; ``off``: int64
    offsets, len n+1.  Returns uint64[n]."""
    n = len(off) - 1
    if n <= 0:
        return np.empty(0, np.uint64)
    if n > _MD5_SLAB:
        return np.concatenate([
            _md5_hi64(raw, off[i:i + _MD5_SLAB + 1])
            for i in range(0, n, _MD5_SLAB)])
    lengths = off[1:] - off[:-1]
    nblocks = (lengths + 9 + 63) // 64
    # One O(total-bytes) scatter builds every padded block up front
    # (message bytes, 0x80 terminator, 64-bit little-endian bit length
    # in the final 8 bytes); the per-block loop then only gathers 16
    # uint32 words per row — no byte-level masking matrices.
    strides = nblocks * 64
    oo = np.zeros(n + 1, np.int64)
    np.cumsum(strides, out=oo[1:])
    padded = np.zeros(int(oo[-1]), np.uint8)
    nbytes = int(off[-1] - off[0])
    if nbytes:
        # dst[j] = byte j's output position: one repeat of the per-row
        # (padded_start - source_start) delta plus a shared arange
        dst = np.repeat(oo[:-1] - (off[:-1] - off[0]), lengths)
        dst += np.arange(nbytes, dtype=np.int64)
        padded[dst] = raw[off[0]:off[-1]]
    padded[oo[:-1] + lengths] = 0x80
    bitlen = lengths.astype(np.uint64) * np.uint64(8)
    fin = oo[1:] - 8
    for k in range(8):
        padded[fin + k] = ((bitlen >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
    p4 = padded.view("<u4")
    w0 = oo[:-1] >> 2                    # first word index of each row
    A = np.full(n, 0x67452301, np.uint32)
    B = np.full(n, 0xEFCDAB89, np.uint32)
    C = np.full(n, 0x98BADCFE, np.uint32)
    D = np.full(n, 0x10325476, np.uint32)
    f = np.empty(n, np.uint32)
    x = np.empty(n, np.uint32)
    w16 = np.arange(16, dtype=np.int64)
    for blk in range(int(nblocks.max())):
        if blk == 0:
            rows = slice(None)          # every row has a first block
            starts, m = w0, n
        else:
            rows = np.nonzero(nblocks > blk)[0]
            starts, m = w0[rows], len(rows)
        # (16, rows) contiguous: each round's word gather is a plain view
        Mt = np.ascontiguousarray(
            p4[starts[:, None] + (16 * blk + w16)[None, :]].T)
        a, b, c, d = A[rows], B[rows], C[rows], D[rows]
        aa, bb, cc, dd = _md5_rounds(
            Mt, a.copy(), b.copy(), c.copy(), d.copy(), f[:m], x[:m])
        A[rows] = a + aa
        B[rows] = b + bb
        C[rows] = c + cc
        D[rows] = d + dd
    # digest bytes [8:16] little-endian == words C, D
    return C.astype(np.uint64) | (D.astype(np.uint64) << np.uint64(32))


_MD5_LONG = 192  # bytes; above this OpenSSL's register-resident C loop
                 # (~0.06 us/block via hashlib) beats the numpy kernel's
                 # memory-bound ~0.25 us/block, so long rows route per-row


def _md5_hi64_hybrid(raw: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Length-adaptive dispatch: short rows through the vectorized slab
    kernel, rows > _MD5_LONG bytes per-row through hashlib (same
    algorithm — parity is structural).  Long rows hash straight off the
    buffer via memoryview; surviving short rows are compacted with one
    O(bytes) gather so the slab kernel sees contiguous offsets."""
    lengths = off[1:] - off[:-1]
    if lengths.size == 0 or int(lengths.max()) <= _MD5_LONG:
        return _md5_hi64(raw, off)
    out = np.empty(len(lengths), np.uint64)
    longm = lengths > _MD5_LONG
    mv = memoryview(raw)
    for i in np.nonzero(longm)[0]:
        out[i] = int.from_bytes(
            hashlib.md5(mv[off[i]:off[i + 1]]).digest()[8:16], "little")
    si = np.nonzero(~longm)[0]
    if len(si):
        slen = lengths[si]
        cum = np.zeros(len(si) + 1, np.int64)
        np.cumsum(slen, out=cum[1:])
        total = int(cum[-1])
        if total:
            src = np.repeat(off[:-1][si] - cum[:-1], slen)
            src += np.arange(total, dtype=np.int64)
            out[si] = _md5_hi64(raw[src], cum)
        else:
            out[si] = _md5_hi64(np.empty(0, np.uint8), cum)
    return out


def _salted_view(raw: np.ndarray, off: np.ndarray, pre: bytes):
    """Pack ``pre + value`` per row into a fresh buffer (vectorized
    gather — no per-row Python), returning (raw2, off2)."""
    n = len(off) - 1
    slen = len(pre)
    lengths = off[1:] - off[:-1]
    out_len = lengths + slen
    off2 = np.zeros(n + 1, np.int64)
    np.cumsum(out_len, out=off2[1:])
    total = int(off2[-1])
    raw2 = np.empty(total, np.uint8)
    # within-row position of every output byte
    wpos = np.arange(total, dtype=np.int64) - np.repeat(off2[:-1], out_len)
    is_salt = wpos < slen
    salt_arr = np.frombuffer(pre, np.uint8)
    raw2[is_salt] = salt_arr[wpos[is_salt]]
    src = np.repeat(off[:-1], out_len) + (wpos - slen)
    if len(raw) == 0:
        raw = np.zeros(1, np.uint8)
    raw2[~is_salt] = raw[src[~is_salt]]
    return raw2, off2


def _hash64_arrow(arr, salt: str = "") -> np.ndarray:
    """content_hash64 over a pyarrow (Chunked)Array of strings,
    zero-copy from the Arrow offsets+data buffers."""
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            return np.empty(0, np.uint64)
        return np.concatenate([_hash64_arrow(c, salt) for c in arr.chunks]) \
            if arr.num_chunks > 1 else _hash64_arrow(arr.chunk(0), salt)
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    else:
        arr = arr.cast(pa.string())
        odt = np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt,
                        count=arr.offset + n + 1)[arr.offset:].astype(np.int64)
    raw = (np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None
           else np.empty(0, np.uint8))
    if salt:
        raw, off = _salted_view(raw, off, salt.encode("utf-8"))
    out = _md5_hi64_hybrid(raw, off)
    if arr.null_count:
        out[~np.asarray(arr.is_valid())] = 0
    return out


def content_hash64_ref(texts, salt: str = "") -> np.ndarray:
    """Per-row hashlib reference implementation (the kernel's
    differential-test ground truth; also the list-input slow path)."""
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


def content_hash64(texts, salt: str = "") -> np.ndarray:
    """Per-value uint64: little-endian digest bytes [8:16] of
    md5(salt + value) — bit-identical to DuckDB ``md5_number_lower``
    when salt is ''.

    Accepts a pyarrow (Chunked)Array (fast path: vectorized numpy MD5
    straight off the Arrow buffers) or any sequence of str/None
    (converted to Arrow first; tiny inputs fall back to hashlib)."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        return _hash64_arrow(texts, salt)
    if len(texts) < 64:
        return content_hash64_ref(texts, salt)
    return _hash64_arrow(pa.array(texts, pa.string()), salt)


def sample_batch(batch: pa.Table, column: str, percent: int, salt: str = "") -> pa.Table:
    """Keep rows where hash(content) % 100 < percent."""
    h = content_hash64(batch.column(column), salt)
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
        h = content_hash64(batch.column(column), salt)
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
        h = content_hash64(batch.column(column), salt)
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
        h = content_hash64(batch.column(column), salt)
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
        h = content_hash64(batch.column(column), salt)
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

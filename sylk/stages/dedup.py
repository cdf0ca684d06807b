"""Deduplication operators over the ``documents`` table.

Five families, each expressed Ray-Data-first:

* exact: content-hash -> hash-partitioned groupby, keep lowest doc_id.
* MinHash + LSH: shingle -> minhash signature -> banded bucket groupby ->
  candidate pairs -> exact-Jaccard verification.
* SimHash: 64-bit signatures -> chunk-banded buckets -> Hamming verify.
* n-gram Jaccard: exact similarity on candidate pairs.
* embedding cosine: multi-band random-hyperplane LSH (OR-amplified)
  -> cosine verify.

Shared machinery and partitioning assumptions (documented per
north-rule):

* Candidate generation shuffles only (doc_id, band, band_hash) triples —
  tiny vs the corpus.  Below ``_DRIVER_TRIPLE_LIMIT`` triples the driver
  runs a numpy run-finder over the collected triples; above it the
  buckets go through a hash-partitioned ``groupby`` (the corpus-scale
  path — triples are the ONLY payload shuffled).
* Pair verification attaches the source values (text / signature /
  vector) to each candidate pair.  Below ``_DRIVER_PAIR_LIMIT``
  candidates, the needed rows are filtered WORKER-side against a
  broadcast id set (``ray.put`` once) so only candidate rows ever reach
  the driver.  Above it, :func:`_verify_pairs_join` runs the fully
  distributed path: explode each pair into two edge rows, hash-JOIN the
  edges with the source on doc_id (the corpus is shuffled exactly once),
  then assemble per pair with a groupby on (a, b) (only candidate-sized
  data moves).  ``distributed=True`` forces the join path end-to-end
  (exercised by tests/test_distributed_paths.py).

All hashing is explicit (blake2b / seeded numpy / splitmix64), never
Python ``hash`` (PYTHONHASHSEED varies across Ray workers).
"""

from __future__ import annotations

import collections
import functools
import hashlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows

# below this many (doc, band) triples, candidate generation collects them
# to the driver (24B/row) and runs the numpy run-finder; above it, the
# hash-partitioned groupby (the 100TB path).
_DRIVER_TRIPLE_LIMIT = 20_000_000
# below this many candidate pairs, verification uses the broadcast-filter
# lookup; above it, the distributed edge-join.
_DRIVER_PAIR_LIMIT = 2_000_000


def _bounded_collect(ds, limit: int):
    """Materialize ``ds`` into the OBJECT STORE (distributed, spillable),
    read its row count from block metadata, and return ``(mds, table)``
    where ``table`` is the driver-collected concat ONLY when the count is
    within ``limit`` (else None).  The tier DECISION is thereby bounded:
    the driver heap never holds rows it is about to reject — the same
    rule join._semi_anti applies to its probe."""
    import ray

    mds = ds.materialize()
    if mds.count() <= limit:
        # to_arrow_refs hands back pandas blocks verbatim when a stage
        # emitted batch_format="pandas"; coerce those, and drop blocks
        # that surface schema-less (zero columns) from upstream
        # map_groups stages
        raw = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(mds.to_arrow_refs())]
        blocks = [b for b in raw if b.num_columns > 0]
        if not blocks:
            schema = mds.schema()
            if schema is None:  # every block schemaless (all-empty ds)
                return mds, pa.table({})
            return mds, pa.Table.from_pydict(
                {f.name: pa.array([], f.type) for f in schema.base_schema})
        return mds, pa.concat_tables(blocks)
    return mds, None


def _hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


# splitmix64 finalizer — a cheap uniform permutation family (the
# minhash estimate only needs per-seed pseudo-random orderings); shared
# constants live in functions.hashing
from ..functions.vectors import list_column_matrix
from ..functions.hashing import mix64 as _mix64  # noqa: E402


# --- shingle hashing (vectorized) ------------------------------------------

# Per-worker token-hash cache: corpora repeat tokens heavily, so blake2b
# runs once per DISTINCT token per worker; shingle combination is then
# pure numpy.  Bounded: cleared wholesale at the cap (simple, rare).
_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1 << 22

_SHINGLE_BASE = np.uint64(0x9E3779B97F4A7C15)  # odd => bijective per position


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) >= _TOKEN_CACHE_MAX:
                cache.clear()
            h = cache[t] = _hash64(t.encode("utf-8"))
        out[i] = h
    return out


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle -> unique uint64 hash array (deterministic).

    Vectorized: one blake2b per distinct token (cached), then a rolling
    positional-polynomial combine over token hashes + splitmix64 finish
    (same pattern as :func:`winnow_fingerprints`).  Texts shorter than k
    tokens produce one whole-text shingle."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    kk = min(k, len(th))
    with np.errstate(over="ignore"):
        powers = _SHINGLE_BASE ** np.arange(kk - 1, -1, -1, dtype=np.uint64)
        wins = np.lib.stride_tricks.sliding_window_view(th, kk)
        combined = (wins * powers).sum(axis=1, dtype=np.uint64)
    return np.unique(_mix64(combined))


_PERM_SEEDS = np.random.default_rng(42).integers(
    0, np.iinfo(np.uint64).max, size=_N_PERM, dtype=np.uint64
)


def minhash_signature(text: str) -> np.ndarray:
    """64-permutation minhash signature (uint64[64]) — per-doc reference
    implementation; the hot path is :func:`minhash_signatures` (batched,
    differential-tested against this)."""
    hs = _shingle_hashes(text)
    if len(hs) == 0:
        return np.zeros(_N_PERM, dtype=np.uint64)
    return _mix64(hs[None, :] ^ _PERM_SEEDS[:, None]).min(axis=1)


def _shingle_hash_segments(texts: list, k: int = 3,
                           whole_doc_short: bool = True):
    """Block-batched shingle hashing: concatenated (non-unique) shingle
    hashes for every doc + int64 segment offsets (len n_docs+1).

    Duplicates are NOT removed — the minhash min is invariant under
    duplicates, and skipping the per-doc ``np.unique`` keeps this one
    pass fully batched.  Tokens are hashed once per DISTINCT token in
    the block (pandas factorize + blake2b over the vocabulary), window
    combination is a single positional-polynomial pass over the
    concatenated token-hash array with document boundaries masked out.

    ``whole_doc_short=True`` (the minhash/Jaccard convention here) maps
    a doc with 0 < tokens < k to ONE whole-doc shingle; ``False`` maps
    it to zero shingles — the strict sliding-window count
    (len-k+1), which is what positional gram census oracles expect.
    """
    n = len(texts)
    tok_lists = [(t or "").split() for t in texts]
    lens = np.zeros(n, dtype=np.int64)
    for i, tl in enumerate(tok_lists):
        lens[i] = len(tl)
    all_toks = [w for tl in tok_lists for w in tl]
    if not all_toks:
        return np.empty(0, dtype=np.uint64), np.zeros(n + 1, dtype=np.int64)
    codes, uniques = pd.factorize(np.asarray(all_toks, dtype=object))
    uh = np.fromiter(
        (_hash64(u.encode("utf-8")) for u in uniques),
        dtype=np.uint64, count=len(uniques),
    )
    th = uh[codes]
    doc_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_start[1:])

    # one shingle count per doc: lens-k+1 full-k windows, or one
    # whole-doc shingle when 0 < lens < k (zero when short and
    # whole_doc_short is off), or zero when empty
    short_sh = 1 if whole_doc_short else 0
    n_sh = np.where(lens >= k, lens - k + 1,
                    np.where(lens > 0, short_sh, 0))
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_sh, out=offs[1:])
    out = np.empty(offs[-1], dtype=np.uint64)

    with np.errstate(over="ignore"):
        if len(th) >= k:
            powers = _SHINGLE_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
            conv = th[: len(th) - k + 1] * powers[0]
            for j in range(1, k):
                conv = conv + th[j : len(th) - k + 1 + j] * powers[j]
            # valid window starts: inside one doc (start..start+lens-k)
            valid = np.zeros(len(conv), dtype=bool)
            for d in np.flatnonzero(lens >= k):
                valid[doc_start[d] : doc_start[d] + lens[d] - k + 1] = True
            full = _mix64(conv[valid])
        else:
            full = np.empty(0, dtype=np.uint64)
        # scatter: docs with lens>=k take runs of `full` in order; short
        # docs get their single whole-doc shingle
        fpos = 0
        for d in range(n):
            if lens[d] >= k:
                cnt = lens[d] - k + 1
                out[offs[d] : offs[d + 1]] = full[fpos : fpos + cnt]
                fpos += cnt
            elif lens[d] > 0 and whole_doc_short:
                kk = int(lens[d])
                pw = _SHINGLE_BASE ** np.arange(kk - 1, -1, -1, dtype=np.uint64)
                acc = (th[doc_start[d] : doc_start[d] + kk] * pw).sum(
                    dtype=np.uint64
                )
                out[offs[d]] = _mix64(np.array([acc], dtype=np.uint64))[0]
    return out, offs


def minhash_signatures(texts: list) -> np.ndarray:
    """Batched signatures: (n_docs, _N_PERM).

    Shingle hashing and the permutation-min both run block-batched (see
    :func:`_shingle_hash_segments`); the mix+min pass is chunked so the
    (n_perm, n_shingles) intermediate stays cache-resident — measured
    ~3x the per-doc kernel on the sf corpus.  Docs with no shingles
    keep the all-zeros signature (same as :func:`minhash_signature`)."""
    n = len(texts)
    sigs = np.zeros((n, _N_PERM), dtype=np.uint64)
    if n == 0:
        return sigs
    cat, offs = _shingle_hash_segments(texts)
    if len(cat) == 0:
        return sigs
    seg_len = np.diff(offs)
    chunk_shingles = 2048  # (64, 2048) uint64 = 1 MiB: L2-resident
    start = 0
    while start < n:
        end = start
        tot = 0
        while end < n and (tot == 0 or tot + seg_len[end] <= chunk_shingles):
            tot += seg_len[end]
            end += 1
        nonempty = np.flatnonzero(seg_len[start:end]) + start
        if len(nonempty):
            lo, hi = offs[start], offs[end]
            mixed = _mix64(cat[None, lo:hi] ^ _PERM_SEEDS[:, None])
            sub_offs = (offs[nonempty] - lo).astype(np.int64)
            sigs[nonempty] = np.minimum.reduceat(mixed, sub_offs, axis=1).T
        start = end
    return sigs


_BAND_SALT = np.uint64(0xD6E8FEB86659FD93)


def _band_hashes(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_docs, n_perm) signatures -> (n_docs, n_bands) band hashes.
    Positional polynomial over each band's rows, band index salted in so
    equal chunks in different bands never collide, splitmix64 finish —
    all numpy, no per-chunk digests."""
    n, width = sigs.shape
    rows = width // n_bands
    chunks = sigs.reshape(n, n_bands, rows)
    with np.errstate(over="ignore"):
        powers = _SHINGLE_BASE ** np.arange(rows, dtype=np.uint64)
        mixed = (chunks * powers).sum(axis=2, dtype=np.uint64)
        salt = np.arange(n_bands, dtype=np.uint64) * _BAND_SALT
        return _mix64(mixed ^ salt[None, :])


def minhash_bands_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Explode each doc into (doc_id, band, band_hash) rows — the ONLY
    payload that enters the LSH shuffle."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    sigs = minhash_signatures(texts)
    bh = _band_hashes(sigs, _BANDS)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, _BANDS), pa.int64()),
            "band": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), len(texts))),
            "band_hash": pa.array(bh.reshape(-1)),
        }
    )


@functools.lru_cache(maxsize=65536)
def _shingle_hashes_cached(text: str, k: int) -> np.ndarray:
    """Per-worker memo for pair verification: a doc in c candidate
    pairs is shingled once, not c times (read-only use downstream).
    Measured: ngram_jaccard_prefix at sf0.1 went 91s -> seconds."""
    return _shingle_hashes(text, k)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    ha = _shingle_hashes_cached(text_a, k)
    hb = _shingle_hashes_cached(text_b, k)
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = len(ha) + len(hb) - inter
    return inter / union if union else 0.0


# --- candidate generation ---------------------------------------------------

def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                         "b": pd.Series([], dtype="int64")})


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band, band_hash) bucket."""
    ids = sorted(set(group["doc_id"].tolist()))
    if len(ids) < 2:
        return _empty_pairs()
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
    return pd.DataFrame({"a": list(a), "b": list(b)})


def _pairs_from_triples(tbl: pa.Table) -> pd.DataFrame:
    """Candidate (a, b) pairs from collected (doc_id, band, band_hash)
    triples: sort by composite bucket key, find runs with numpy, expand
    only multi-member runs.  Orders of magnitude faster than a per-group
    pandas apply when buckets are small."""
    band = tbl.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    bh = tbl.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    key = (band << np.uint64(48)) ^ bh
    order = np.lexsort((ids, key))
    key, ids = key[order], ids[order]
    boundaries = np.flatnonzero(np.diff(key) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    stops = np.concatenate((boundaries, [len(key)]))
    return _expand_runs_to_pairs(ids, starts, stops)


def _expand_runs_to_pairs(ids: np.ndarray, starts: np.ndarray,
                          stops: np.ndarray) -> pd.DataFrame:
    """Vectorized pair expansion over sorted bucket runs: per-run
    ``triu_indices``, global dedupe via one ``np.unique`` on packed
    (a << 32 | b) keys — hot template corpora emit millions of pairs,
    and the old per-pair Python set dominated wall time.  Packing is
    uint64 (unsigned shifts) so the full uint32 id range is safe —
    int64 packing would overflow (negative "a" ids) at a >= 2^31.
    Falls back to the set path only for doc ids outside uint32
    (packing invalid)."""
    if len(ids) and (ids.max() >= (1 << 32) or ids.min() < 0):
        out = set()
        for s, e in zip(starts, stops):
            if e - s < 2:
                continue
            run = np.unique(ids[s:e])
            for i in range(len(run)):
                for j in range(i + 1, len(run)):
                    out.add((int(run[i]), int(run[j])))
        if not out:
            return _empty_pairs()
        a, b = zip(*sorted(out))
        return pd.DataFrame({"a": list(a), "b": list(b)})
    chunks = []
    for s, e in zip(starts, stops):
        if e - s < 2:
            continue
        run = np.unique(ids[s:e]).astype(np.uint64)
        if len(run) < 2:
            continue
        ii, jj = np.triu_indices(len(run), k=1)
        chunks.append((run[ii] << np.uint64(32)) | run[jj])
    if not chunks:
        return _empty_pairs()
    keys = np.unique(np.concatenate(chunks))
    return pd.DataFrame({"a": (keys >> np.uint64(32)).astype(np.int64),
                         "b": (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)})


def _expand_runs_to_pair_counts(ids: np.ndarray, starts: np.ndarray,
                                stops: np.ndarray) -> pd.DataFrame:
    """Counting sibling of :func:`_expand_runs_to_pairs`: each run a
    pair co-occurs in contributes 1 to its ``n`` (``np.unique`` with
    ``return_counts`` on the packed keys) — the winnowing shared-
    fingerprint count, vectorized."""
    if len(ids) and (ids.max() >= (1 << 32) or ids.min() < 0):
        cnt: collections.Counter = collections.Counter()
        for s, e in zip(starts, stops):
            if e - s < 2:
                continue
            run = np.unique(ids[s:e])
            for i in range(len(run)):
                for j in range(i + 1, len(run)):
                    cnt[(int(run[i]), int(run[j]))] += 1
        if not cnt:
            return _empty_pairs().assign(n=pd.Series([], dtype="int64"))
        a, b = zip(*sorted(cnt))
        return pd.DataFrame({"a": list(a), "b": list(b),
                             "n": [cnt[p] for p in sorted(cnt)]})
    chunks = []
    for s, e in zip(starts, stops):
        if e - s < 2:
            continue
        run = np.unique(ids[s:e]).astype(np.uint64)
        if len(run) < 2:
            continue
        ii, jj = np.triu_indices(len(run), k=1)
        chunks.append((run[ii] << np.uint64(32)) | run[jj])
    if not chunks:
        return _empty_pairs().assign(n=pd.Series([], dtype="int64"))
    keys, counts = np.unique(np.concatenate(chunks), return_counts=True)
    return pd.DataFrame({"a": (keys >> np.uint64(32)).astype(np.int64),
                         "b": (keys & np.uint64(0xFFFFFFFF)).astype(np.int64),
                         "n": counts.astype(np.int64)})


def _pair_counts_from_keyed_rows(tbl: pa.Table, key_col: str) -> pd.DataFrame:
    """(doc_id, key) rows -> (a, b, n) partial co-occurrence counts."""
    key = tbl.column(key_col).to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key))
    key, ids = key[order], ids[order]
    boundaries = np.flatnonzero(np.diff(key) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    stops = np.concatenate((boundaries, [len(key)]))
    return _expand_runs_to_pair_counts(ids, starts, stops)


_COARSE_GROUP_ROWS = 2_000_000


def _coarse_grouped_pairs(rows_ds, key_fn, pairs_fn):
    """Distributed candidate expansion WITHOUT per-bucket pandas groups:
    hash each row's bucket key into ~rows/2M coarse partitions (a bucket
    never splits — co-location by hash), then run the vectorized numpy
    run-finder over each whole partition.  One pandas/pyarrow call per
    coarse group instead of one per bucket — the difference between
    minutes and seconds on template-heavy corpora.

    ``rows_ds`` must be materialized (count() is then metadata-cheap);
    ``key_fn(table) -> uint64[n]`` computes the bucket key per row;
    ``pairs_fn(table) -> DataFrame[a, b]`` expands one coarse group.
    Cross-group duplicate pairs (same pair via different bands) remain
    and are collapsed by _verify_pairs_join's hash aggregate."""
    from ..functions.hashing import mix64

    n = rows_ds.count()
    # cap bounds the hash-shuffle partition count; beyond it per-group
    # rows grow linearly with the corpus (lexsort holds one group in a
    # worker heap — at 2M rows/group the cap supports ~8x10^9 index
    # rows; shard by band first if a corpus ever exceeds that)
    n_groups = max(32, min(4096, n // _COARSE_GROUP_ROWS + 1))

    def _add_pkey(b: pa.Table) -> pa.Table:
        key = key_fn(b)
        pkey = (mix64(key) % np.uint64(n_groups)).astype(np.int64)
        return b.append_column("pkey", pa.array(pkey, pa.int64()))

    def _group_pairs(g: pa.Table) -> pa.Table:
        df = pairs_fn(g)
        return pa.table({c: pa.array(df[c].to_numpy().astype(np.int64),
                                     pa.int64())
                         for c in df.columns})

    keyed = rows_ds.map_batches(_add_pkey, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
    return keyed.groupby("pkey").map_groups(_group_pairs,
                                            batch_format="pyarrow")


def _candidate_pairs(triples_ds, distributed: bool | None = None):
    """(doc_id, band, band_hash) Dataset -> unique candidate pairs.

    Returns a pandas DataFrame (driver path) or a Dataset (distributed
    path).  ``distributed=None`` auto-selects by triple count."""
    import ray
    import ray.data

    if distributed is False:
        tbl = pa.concat_tables(ray.get(triples_ds.to_arrow_refs()))
        return _pairs_from_triples(tbl)
    if distributed is None:
        triples_ds, tbl = _bounded_collect(triples_ds, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            return _pairs_from_triples(tbl)
    else:
        triples_ds = triples_ds.materialize()

    def _bucket_key(b: pa.Table) -> np.ndarray:
        band = b.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = b.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (band << np.uint64(48)) ^ bh

    # coarse hash-co-located groups + the same vectorized run-finder the
    # driver tier uses; duplicate pairs across bands are collapsed by
    # the hash aggregate at the head of _verify_pairs_join
    return _coarse_grouped_pairs(triples_ds, _bucket_key, _pairs_from_triples)


# --- pair verification ------------------------------------------------------

def _collect_needed(source_ds, id_col: str, val_col: str, need_ids) -> dict:
    """Broadcast the candidate id set, filter WORKER-side, collect only
    the matching (id, value) rows — the driver never streams the corpus."""
    import ray

    need_arr = pa.array(sorted(int(i) for i in need_ids), pa.int64())
    need_ref = ray.put(need_arr)

    def _filt(b: pa.Table) -> pa.Table:
        ns = ray.get(need_ref)
        mask = pc.is_in(b.column(id_col).cast(pa.int64()), value_set=ns)
        return b.filter(mask).select([id_col, val_col])

    small = source_ds.map_batches(_filt, batch_format="pyarrow", batch_size=None)
    # filtered/joined sources can surface schemaless empty blocks
    # (dedup.py:78 pattern) — drop them before the concat
    blocks = [b for b in ray.get(small.to_arrow_refs()) if b.num_columns > 0]
    if not blocks:
        return {}
    tbl = pa.concat_tables(blocks)
    return dict(zip(tbl.column(id_col).to_pylist(), tbl.column(val_col).to_pylist()))


def _verify_broadcast(cand: pd.DataFrame, source_ds, id_col: str, val_col: str,
                      pair_fn: Callable, out_col: str):
    """Verify candidates against a broadcast value lookup (``ray.put``
    once, read per task).  Holds while the candidate id set fits in one
    object; the join path takes over beyond that."""
    import ray
    import ray.data

    need = set(cand["a"]).union(cand["b"])
    ref = ray.put(_collect_needed(source_ds, id_col, val_col, need))

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        out_a, out_b, out_v = [], [], []
        for x, y in zip(batch["a"], batch["b"]):
            r = pair_fn(lookup.get(x), lookup.get(y))
            if r is not None:
                out_a.append(x)
                out_b.append(y)
                out_v.append(r)
        return pd.DataFrame({"a": out_a, "b": out_b, out_col: out_v})

    return ray.data.from_pandas(cand).map_batches(_verify, batch_format="pandas")


def _verify_pairs_join(pairs_ds, source_ds, id_col: str, val_col: str,
                       pair_fn: Callable, out_col: str,
                       num_partitions: int | None = None):
    """Distributed pair verification (the 100 TB path): each candidate
    is ONE (a, b) row; multi-band duplicates collapse in a hash
    AGGREGATE (not map_groups); the source is hash-joined twice —
    a-side then b-side — so both payloads land on the SAME row, and
    verification is a per-batch map over thousands of pairs at a time.
    No per-pair pandas group ever materializes (the round-1 simhash
    hang and the round-2 verdict's #2 were exactly that shape).

    ``num_partitions`` defaults to the cluster CPU count (the join's
    aggregator pool must fit the cluster or the stage starves upstream
    operators); at real corpus scale pass blocks-per-node x nodes."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    # Sanitize: a schema'd empty seed guards against 0-row NO-schema
    # blocks poisoning the hash ops (FieldRef unresolvable).  Then
    # materialize FIRST — candidate-sized — so (a) the partition-count
    # probe reads block metadata instead of executing the candidate
    # pipeline a second time, and (b) a zero-candidate corpus skips the
    # dedup aggregate and BOTH joins entirely.
    seed = ray.data.from_pandas(_empty_pairs())
    pairs_ds = seed.union(pairs_ds).materialize()
    if num_partitions is None:
        # scale partitions with DATA, not cluster size: each partition
        # costs a HashShuffleAggregator actor startup (see the measured
        # 19.9s -> 4.9s note in BASELINE.md for join.py's same fix)
        from .join import _size_based_partitions

        num_partitions = _size_based_partitions(pairs_ds, source_ds)
    if pairs_ds.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          out_col: pd.Series([], dtype="float64")}))
    # compact the many tiny map_groups blocks first: shuffle fixed cost
    # scales with BLOCKS x partitions (measured 16s -> 2.6s on a 146k-row
    # candidate set by going 65 -> 8 blocks), and the repartition itself
    # is candidate-sized
    pairs_ds = pairs_ds.repartition(num_partitions)
    # a pair colliding in d bands arrives d times; collapse in a hash
    # aggregate (candidate-sized exchange, vectorized reduce) so the
    # joins never ship a payload twice for the same pair
    pairs_ds = (pairs_ds.groupby(["a", "b"])
                .aggregate(Count(alias_name="_dup"))
                .select_columns(["a", "b"]))
    src = source_ds.select_columns([id_col, val_col])

    def _rename(ja: str, va: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns([ja, va])
        return f

    src_a = src.map_batches(_rename("_ja", "_va"), batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    src_b = src.map_batches(_rename("_jb", "_vb"), batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    # a member missing from the source drops its pairs (inner join) —
    # same "not verifiable" semantics as the broadcast tier
    from .join import _sane_blocks

    src_a = src_a.map_batches(_sane_blocks, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    src_b = src_b.map_batches(_sane_blocks, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    j = pairs_ds.join(src_a, "inner", num_partitions,
                      on=("a",), right_on=("_ja",))
    j = j.map_batches(_sane_blocks, batch_format="pyarrow",
                      batch_size=None, zero_copy_batch=True)
    j = j.join(src_b, "inner", num_partitions,
               on=("b",), right_on=("_jb",))

    def _verify_batch(b: pa.Table) -> pa.Table:
        oa, ob, ov = [], [], []
        for x, y, ta, tb in zip(b.column("a").to_pylist(),
                                b.column("b").to_pylist(),
                                b.column("_va").to_pylist(),
                                b.column("_vb").to_pylist()):
            r = pair_fn(ta, tb)
            if r is not None:
                oa.append(x)
                ob.append(y)
                ov.append(r)
        return pa.table({"a": pa.array(oa, pa.int64()),
                         "b": pa.array(ob, pa.int64()),
                         out_col: pa.array(ov, pa.float64())})

    return j.map_batches(_verify_batch, batch_format="pyarrow")


def _verify_pairs(cand, source_ds, id_col: str, val_col: str, pair_fn: Callable,
                  out_col: str, distributed: bool | None = None):
    """Route a candidate set (DataFrame or Dataset) through the broadcast
    or join verification path."""
    import ray.data

    if isinstance(cand, pd.DataFrame):
        if distributed or len(cand) > _DRIVER_PAIR_LIMIT:
            if len(cand) == 0:
                return ray.data.from_pandas(
                    pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                  "b": pd.Series([], dtype="int64"),
                                  out_col: pd.Series([], dtype="float64")}))
            return _verify_pairs_join(
                ray.data.from_pandas(cand[["a", "b"]]), source_ds,
                id_col, val_col, pair_fn, out_col)
        return _verify_broadcast(cand, source_ds, id_col, val_col, pair_fn, out_col)
    # Dataset input = edge rows from the distributed candidate path
    return _verify_pairs_join(cand, source_ds, id_col, val_col, pair_fn, out_col)


# --- MinHash-LSH near-dup ---------------------------------------------------

def minhash_dup_pairs(docs_ds, threshold: float = 0.8, text_col: str = "text",
                      distributed: bool | None = None):
    """MinHash-LSH near-duplicate pairs, Jaccard-verified.

    Returns Dataset[(a, b, jaccard)] with a < b, jaccard >= threshold.
    ``distributed=True`` forces the groupby candidate path and the
    edge-join verification (the corpus-scale shape)."""
    bands = docs_ds.map_batches(
        lambda b: minhash_bands_batch(b, text_col), batch_format="pyarrow",
        batch_size=None,
    )
    cand = _candidate_pairs(bands, distributed)

    def _jac(ta, tb):
        j = ngram_jaccard(ta or "", tb or "")
        return j if j >= threshold else None

    return _verify_pairs(cand, docs_ds, "doc_id", text_col, _jac, "jaccard",
                         distributed)


# --- exact n-gram Jaccard (inverted shingle index) --------------------------

def ngram_shingle_rows(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> pa.Table:
    """Explode each doc into (doc_id, sh, n_sh) rows: DISTINCT shingle
    hashes plus the doc's distinct-shingle count carried on every row
    (constant per doc), so pair assembly needs no second sizes join.

    Built on :func:`_shingle_hash_segments` (block-batched) with a
    vectorized per-segment unique (lexsort + neighbor-diff).  Docs with
    no tokens emit nothing — the inverted index can never pair them,
    matching the oracle semantics."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    cat, offs = _shingle_hash_segments(texts, k)
    if len(cat) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sh": pa.array([], pa.uint64()),
                         "n_sh": pa.array([], pa.int64())})
    seg = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(offs))
    order = np.lexsort((cat, seg))
    seg_s, cat_s = seg[order], cat[order]
    keep = np.ones(len(cat_s), dtype=bool)
    keep[1:] = (seg_s[1:] != seg_s[:-1]) | (cat_s[1:] != cat_s[:-1])
    seg_u, cat_u = seg_s[keep], cat_s[keep]
    counts = np.bincount(seg_u, minlength=len(texts))
    return pa.table({
        "doc_id": pa.array(ids[seg_u].astype(np.int64), pa.int64()),
        "sh": pa.array(cat_u, pa.uint64()),
        "n_sh": pa.array(counts[seg_u].astype(np.int64), pa.int64()),
    })


def _gram_census_driver(tbl: pa.Table) -> pa.Table:
    """Driver-tier census over collected (doc_id, g, cnt) gram rows:
    per-g row count IS the document frequency (rows are distinct per
    doc-gram), one bincount each for the per-doc totals and the df>=2
    positional sum.  Output sorted by doc_id (np.unique order)."""
    if tbl.num_columns == 0 or tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64()),
                         "n_dup_grams": pa.array([], pa.int64())})
    doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    g = tbl.column("g").to_numpy(zero_copy_only=False)
    cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)
    udoc, dinv = np.unique(doc, return_inverse=True)
    n_grams = np.bincount(dinv, weights=cnt).astype(np.int64)
    _, ginv, gc = np.unique(g, return_inverse=True, return_counts=True)
    dup_cnt = np.where(gc[ginv] >= 2, cnt, 0)
    n_dup = np.bincount(dinv, weights=dup_cnt).astype(np.int64)
    return pa.table({"doc_id": pa.array(udoc, pa.int64()),
                     "n_grams": pa.array(n_grams, pa.int64()),
                     "n_dup_grams": pa.array(n_dup, pa.int64())})


def positional_gram_count_rows(batch: pa.Table, text_col: str = "text",
                               id_col: str = "doc_id",
                               k: int = 8) -> pa.Table:
    """Explode each doc into (doc_id, g, cnt) rows: ``g`` = word k-gram
    hash (bit-reinterpreted to int64 — uint64 > 2^63 overflows in Ray's
    shuffle rebuild), ``cnt`` = how many POSITIONS in the doc start that
    gram (within-doc repeats are counted, unlike the distinct-set
    :func:`ngram_shingle_rows`).  Docs with fewer than k tokens emit
    nothing (``whole_doc_short=False``) — the strict sliding-window
    semantics the SQL oracle's generate_series(1, len-k+1) produces."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    cat, offs = _shingle_hash_segments(texts, k, whole_doc_short=False)
    if len(cat) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "g": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    seg = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(offs))
    order = np.lexsort((cat, seg))
    seg_s, cat_s = seg[order], cat[order]
    starts = np.ones(len(cat_s), dtype=bool)
    starts[1:] = (seg_s[1:] != seg_s[:-1]) | (cat_s[1:] != cat_s[:-1])
    idx = np.flatnonzero(starts)
    run_len = np.diff(np.append(idx, len(cat_s)))
    return pa.table({
        "doc_id": pa.array(ids[seg_s[idx]].astype(np.int64), pa.int64()),
        "g": pa.array(cat_s[idx].view(np.int64), pa.int64()),
        "cnt": pa.array(run_len.astype(np.int64), pa.int64()),
    })


def dup_ngram_spans(docs_ds, k: int = 8, text_col: str = "text",
                    id_col: str = "doc_id",
                    distributed: bool | None = None):
    """Cross-document duplicated k-gram span census — the exact-substring
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"): for every doc with >= k tokens, how many
    of its token positions start a word k-gram that ALSO occurs in at
    least one other document.

    Returns Dataset[(doc_id, n_grams, n_dup_grams)] with n_grams =
    tokens-k+1 (the position count) and n_dup_grams = positions whose
    gram's document frequency >= 2; n_dup_grams/n_grams is the doc's
    duplicated-span fraction, the usual removal/score signal.

    Tiers: under _DRIVER_TRIPLE_LIMIT collected gram rows (24 B each,
    bounded DECISION via _bounded_collect) the census is one numpy pass
    on the driver; above it — or with ``distributed=True`` — the
    distributed plan runs three keyed exchanges, all on compact rows:
    (1) the per-(doc, gram) combiner partials (<= tokens rows/doc) into
    a grouped doc-frequency count, (2) a semi-join of the gram rows
    against the df>=2 gram set (auto broadcast tier when the dup-gram
    set is driver-small, hash join otherwise), (3) ONE per-doc sum over
    the union of dup counts and totals (join-free: totals cover every
    doc, so no outer join is needed).  No step materializes pairs or
    full texts; the totals side is a separate cheap Arrow-kernel scan
    (count_substring_regex) rather than a second gram explode, and the
    auto tier's over-limit fall-through reuses the already-materialized
    gram rows.
    """
    from functools import partial

    from .join import grouped_agg, semi_join

    rows = docs_ds.map_batches(
        partial(positional_gram_count_rows, text_col=text_col,
                id_col=id_col, k=k),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    # bounded driver tier (default): gram rows are 24 B each, so small
    # corpora census in one numpy pass instead of paying three keyed
    # exchanges of fixed shuffle cost; the tier DECISION materializes
    # rows into the object store first, so an over-limit fall-through
    # reuses those blocks (no re-explode) for the distributed path.
    if distributed is not True:
        mrows, tbl = _bounded_collect(rows, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            import ray.data

            return ray.data.from_arrow(_gram_census_driver(tbl))
        rows = mrows

    # gram document-frequency (rows are distinct per (doc, gram), so
    # count-per-gram == doc frequency); two-phase so only per-block
    # distinct grams shuffle.  materialize(): the dup-gram set is
    # bounded by DISTINCT duplicated grams (spillable 8 B keys, tiny vs
    # the corpus) and semi_join consumes it twice (tier-decision count
    # + key collect / join side) — unmaterialized, Ray re-runs the
    # whole explode+aggregate lineage per consumer.
    df = grouped_agg(rows.select_columns(["g"]), ["g"], [], count_name="df")
    dup_grams = (df.filter(expr="df >= 2").select_columns(["g"])
                 .materialize())

    # shuffle fixed cost scales with blocks x partitions: the semi-join
    # survivors and the union below are tiny rows spread over every
    # input block — compact them to a block count that scales with the
    # input's read granularity before the keyed aggregates (the
    # measured 16s -> 2.6s repartition pattern).
    try:
        n_in = docs_ds.num_blocks() or 64
    except Exception:
        n_in = 64
    nparts = max(4, n_in // 8)

    dup_rows = semi_join(rows, dup_grams, on="g", distributed=distributed)
    dup_counts = grouped_agg(
        dup_rows.select_columns(["doc_id", "cnt"]).repartition(nparts),
        ["doc_id"], ["cnt"], count_name="_nr")

    # merge with the per-doc totals by UNION + sum rather than an outer
    # join: every doc appears on the totals side, so no join is needed —
    # and a corpus with zero duplicated grams leaves dup_counts with no
    # blocks at all (unknown schema), which Ray's hash-shuffle join
    # cannot take as a right side but union handles trivially.
    def _as_dup(b: pa.Table):
        if b.num_columns:  # empty groupbys emit schemaless blocks
            zero = pa.array(np.zeros(b.num_rows, np.int64), pa.int64())
            yield pa.table({"doc_id": b.column("doc_id"),
                            "n_grams": zero,
                            "n_dup_grams": b.column("cnt")})

    dup_counts = dup_counts.map_batches(_as_dup, batch_format="pyarrow",
                                        batch_size=None)

    def _totals(b: pa.Table) -> pa.Table:
        nt = pc.count_substring_regex(b.column(text_col), r"\S+")
        ng = pc.max_element_wise(
            pc.subtract(pc.cast(nt, pa.int64()), pa.scalar(k - 1, pa.int64())),
            pa.scalar(0, pa.int64()))
        t = pa.table({"doc_id": pc.cast(b.column(id_col), pa.int64()),
                      "n_grams": ng,
                      "n_dup_grams": pa.array(
                          np.zeros(len(ng), np.int64), pa.int64())})
        return t.filter(pc.greater(t.column("n_grams"), 0))

    totals = docs_ds.map_batches(_totals, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)

    from ray.data.aggregate import Sum

    out = (totals.union(dup_counts).repartition(nparts)
           .groupby("doc_id").aggregate(
               Sum("n_grams", alias_name="n_grams"),
               Sum("n_dup_grams", alias_name="n_dup_grams")))
    return out.sort("doc_id")


def _pair_score_jaccard(c, na, nb):
    """|A∩B| / |A∪B| — symmetric set similarity (numpy-vectorizable)."""
    return c / (na + nb - c)


def _pair_score_containment(c, na, nb):
    """|A∩B| / min(|A|, |B|) — max-containment: near-SUBSET detection
    (a short doc quoted whole inside a long one scores 1.0 here but low
    Jaccard)."""
    return c / np.minimum(na, nb)


def _jaccard_pairs_local(tbl: pa.Table, threshold: float,
                         score=_pair_score_jaccard,
                         out_col: str = "jaccard") -> pd.DataFrame:
    """Exact set-similarity pairs from collected (doc_id, sh, n_sh)
    rows: sort by shingle, find runs, count shared shingles per pair,
    score with ``score(shared, na, nb)`` (vectorized)."""
    from collections import Counter

    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    sh = tbl.column("sh").to_numpy(zero_copy_only=False)
    n_sh = tbl.column("n_sh").to_numpy(zero_copy_only=False)
    sizes = dict(zip(ids.tolist(), n_sh.tolist()))
    order = np.argsort(sh, kind="stable")
    sh_s, ids_s = sh[order], ids[order]
    boundaries = np.flatnonzero(sh_s[1:] != sh_s[:-1]) + 1
    starts = np.concatenate(([0], boundaries))
    stops = np.concatenate((boundaries, [len(sh_s)]))
    shared: Counter = Counter()
    for s, e in zip(starts, stops):
        if e - s < 2:
            continue
        run = np.sort(ids_s[s:e])  # per-doc distinct => run ids distinct
        for i in range(len(run)):
            for j in range(i + 1, len(run)):
                shared[(int(run[i]), int(run[j]))] += 1
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          out_col: pd.Series([], dtype="float64")})
    if not shared:
        return empty
    pairs = sorted(shared)
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    c = np.array([shared[p] for p in pairs], dtype=np.float64)
    na = np.array([sizes[x] for x in a.tolist()], dtype=np.float64)
    nb = np.array([sizes[x] for x in b.tolist()], dtype=np.float64)
    sc = score(c, na, nb)
    m = sc >= threshold
    if not m.any():
        return empty
    return pd.DataFrame({"a": a[m], "b": b[m], out_col: sc[m]})


def ngram_jaccard_dup_pairs(docs_ds, threshold: float = 0.6, k: int = 3,
                            text_col: str = "text",
                            distributed: bool | None = None,
                            score=_pair_score_jaccard,
                            out_col: str = "jaccard"):
    """EXACT all-pairs n-gram Jaccard near-dup pairs via an inverted
    shingle index — the textbook set-similarity join: only docs sharing
    at least one shingle ever pair, so no candidate can be missed (unlike
    the banded MinHash estimate).

    Returns Dataset[(a, b, jaccard)] with a < b, jaccard >= threshold.

    Scale shape: the shuffle payload is (doc_id, shingle_hash64, n_sh)
    triples (24 B/row, ~|tokens| rows/doc); shared-shingle counting is a
    groupby(sh) pair emission + groupby(a, b) count — the same exchange
    DuckDB's plan does for the oracle SQL.  Skew note: a shingle present
    in m docs emits m(m-1)/2 pairs; natural-language 3-gram buckets are
    heavy-tailed but bounded (stopword 3-grams repeat within, not
    across, docs after the per-doc distinct); the 100-TB mitigation is
    prefix filtering — implemented as
    :func:`ngram_jaccard_dup_pairs_prefix`, which produces the
    identical exact answer with a prefix-only index.

    Jaccard over 64-bit shingle hashes equals Jaccard over the shingle
    strings unless blake2b+splitmix64 collide (P ~ n_shingles^2 / 2^64;
    ~1e-10 at sf0.1) — the oracle gate would catch a collision."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    rows = docs_ds.map_batches(
        lambda b: ngram_shingle_rows(b, text_col, k=k),
        batch_format="pyarrow", batch_size=None,
    )
    if distributed is False:
        tbl = pa.concat_tables(ray.get(rows.to_arrow_refs()))
        return ray.data.from_pandas(
            _jaccard_pairs_local(tbl, threshold, score, out_col))
    if distributed is None:
        rows, tbl = _bounded_collect(rows, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            return ray.data.from_pandas(
                _jaccard_pairs_local(tbl, threshold, score, out_col))
    if distributed:
        rows = rows.materialize()

    def _sh_key(b: pa.Table) -> np.ndarray:
        return b.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)

    def _jaccard_group_partials(t: pa.Table) -> pd.DataFrame:
        # partial shared-shingle counts for the group's buckets, with
        # each member's distinct-shingle size looked up vectorized
        # (constant per doc, carried on every index row)
        df = _pair_counts_from_keyed_rows(t, "sh")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        ns = t.column("n_sh").to_numpy(zero_copy_only=False)
        uids, first = np.unique(ids, return_index=True)
        sizes = ns[first]
        df["na"] = sizes[np.searchsorted(uids, df["a"].to_numpy())]
        df["nb"] = sizes[np.searchsorted(uids, df["b"].to_numpy())]
        return df

    pairs = _coarse_grouped_pairs(rows, _sh_key, _jaccard_group_partials)
    agg = pairs.groupby(["a", "b"]).aggregate(
        Sum("n", alias_name="shared"),
        Max("na", alias_name="na"), Max("nb", alias_name="nb"),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 out_col: pd.Series([], dtype="float64")})
        sc = score(df["shared"].to_numpy(dtype="float64"),
                   df["na"].to_numpy(dtype="float64"),
                   df["nb"].to_numpy(dtype="float64"))
        out = pd.DataFrame({"a": df["a"].astype("int64"),
                            "b": df["b"].astype("int64"), out_col: sc})
        return out[out[out_col] >= threshold]

    return agg.map_batches(_finish, batch_format="pandas", batch_size=None)


def ngram_prefix_rows(batch: pa.Table, text_col: str = "text",
                      k: int = 3, threshold: float = 0.6) -> pa.Table:
    """PPJoin prefix filter: per doc, keep only the
    p = n - ceil(t*n) + 1 smallest shingle hashes (hash value = the
    global total order).  Theorem (prefix filtering): two sets with
    Jaccard >= t MUST share at least one prefix element under any
    agreed total order, so candidate generation over prefixes alone has
    full recall — the index shrinks by the factor t/(1+t)-ish while the
    answer stays exact after verification."""
    import math

    t = ngram_shingle_rows(batch, text_col, k=k)
    if len(t) == 0:
        return t
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    sh = t.column("sh").to_numpy(zero_copy_only=False)
    n_sh = t.column("n_sh").to_numpy(zero_copy_only=False)
    order = np.lexsort((sh, ids))
    ids_s = ids[order]
    starts = np.flatnonzero(np.concatenate(([True], ids_s[1:] != ids_s[:-1])))
    run_id = np.cumsum(np.concatenate(([0], (ids_s[1:] != ids_s[:-1])
                                       .astype(np.int64))))
    rank = np.arange(len(ids_s)) - starts[run_id]
    n_run = n_sh[order]
    p = n_run - np.ceil(threshold * n_run).astype(np.int64) + 1
    keep = order[rank < p]
    return t.take(pa.array(np.sort(keep)))


def _pairs_from_keyed_rows(tbl: pa.Table, key_col: str) -> pd.DataFrame:
    """Candidate (a, b) pairs from collected (doc_id, key) rows: sort by
    key, find runs, expand multi-member runs (the single-key sibling of
    :func:`_pairs_from_triples`)."""
    key = tbl.column(key_col).to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key))
    key, ids = key[order], ids[order]
    boundaries = np.flatnonzero(np.diff(key) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    stops = np.concatenate((boundaries, [len(key)]))
    return _expand_runs_to_pairs(ids, starts, stops)


def ngram_containment_pairs(docs_ds, threshold: float = 0.75, k: int = 3,
                            text_col: str = "text",
                            distributed: bool | None = None):
    """Asymmetric near-SUBSET detection: max-containment
    C(a,b) = |A∩B| / min(|A|,|B|) over distinct k-gram shingles — the
    dedup lens Jaccard misses (a short doc quoted verbatim inside a
    long one has low Jaccard but containment 1.0; standard in web-
    corpus curation for quote/boilerplate inclusion).  Same inverted-
    index exchange as :func:`ngram_jaccard_dup_pairs` — only the final
    vectorized score differs."""
    return ngram_jaccard_dup_pairs(docs_ds, threshold, k, text_col,
                                   distributed,
                                   score=_pair_score_containment,
                                   out_col="containment")


def sorted_neighborhood_pairs(docs_ds, window: int = 2, key_chars: int = 30,
                              threshold: float = 0.6, k: int = 3,
                              text_col: str = "text",
                              distributed: bool | None = None):
    """Sorted-neighborhood (SNM) blocking dedup — the SORT-based
    blocking paradigm next to the hash (exact/normalized) and
    LSH/inverted-index families: rank every doc by a domain sort key
    (its first ``key_chars`` characters, doc_id tiebreak), take as
    candidates exactly the pairs within ``window`` ranks of each other,
    and verify exact k-gram Jaccard.

    Scale shape: ONE global range-partitioned sort (the exchange
    ``Dataset.sort`` already does) + a candidate set that is ≤
    window x n rows by construction — linear and skew-FREE regardless
    of key distribution (a hot prefix just occupies a contiguous rank
    range; it never explodes a bucket the way a hot shingle does).
    Recall depends on the sort key placing near-dups adjacently — the
    standard SNM trade (documented; prefix-edited dups need the
    multi-key extension).

    Candidate generation without a self-join: each rank-r doc emits
    band rows (j = r + i, i) for i in 0..window; within a j-group the
    i = 0 member (rank j) pairs with every other member (ranks
    j-window..j-1).  A pair (r1 < r2) forms ONLY in group j = r2, so
    pairs are unique by construction — no cross-group dedup pass."""
    from .asof import running_total

    def _prep(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "sk": pc.utf8_slice_codeunits(b.column(text_col), 0, key_chars),
            "g": pa.array(np.zeros(n, np.int64)),
            "one": pa.array(np.ones(n, np.int64)),
        })

    slim = docs_ds.map_batches(_prep, batch_format="pyarrow",
                               batch_size=None)
    ranked = running_total(slim, "g", ["sk", "doc_id"], "one", "r")

    def _band(df: pd.DataFrame) -> pa.Table:
        r = df["r"].to_numpy(dtype=np.int64)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        j = np.concatenate([r + i for i in range(window + 1)])
        ii = np.repeat(np.arange(window + 1, dtype=np.int64), len(r))
        dd = np.tile(ids, window + 1)
        return pa.table({"j": pa.array(j, pa.int64()),
                         "i": pa.array(ii, pa.int64()),
                         "doc_id": pa.array(dd, pa.int64())})

    rows = ranked.map_batches(_band, batch_format="pandas",
                              batch_size=None)

    def _pairs(t: pa.Table) -> pd.DataFrame:
        j = t.column("j").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, j))
        j_s, i_s, d_s = j[order], i[order], d[order]
        start_mask = np.ones(len(j_s), dtype=bool)
        start_mask[1:] = j_s[1:] != j_s[:-1]
        run_id = np.cumsum(start_mask) - 1
        starts = np.flatnonzero(start_mask)
        head_ok = i_s[starts] == 0          # group has its rank-j member
        heads = d_s[starts]
        tail = ~start_mask & head_ok[run_id]
        if not tail.any():
            return _empty_pairs()
        x = heads[run_id[tail]]
        y = d_s[tail]
        return pd.DataFrame({"a": np.minimum(x, y).astype(np.int64),
                             "b": np.maximum(x, y).astype(np.int64)})

    def _jac(ta, tb):
        jc = ngram_jaccard(ta or "", tb or "", k)
        return jc if jc >= threshold else None

    import ray

    if distributed is False:
        tbl = pa.concat_tables(ray.get(rows.to_arrow_refs()))
        return _verify_pairs(_pairs(tbl), docs_ds, "doc_id", text_col,
                             _jac, "jaccard", distributed)
    if distributed is None:
        rows, tbl = _bounded_collect(rows, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            return _verify_pairs(_pairs(tbl), docs_ds, "doc_id", text_col,
                                 _jac, "jaccard", distributed)
    else:
        rows = rows.materialize()

    def _j_key(b: pa.Table) -> np.ndarray:
        return b.column("j").to_numpy(zero_copy_only=False).astype(np.uint64)

    cand = _coarse_grouped_pairs(rows, _j_key, _pairs)
    return _verify_pairs(cand, docs_ds, "doc_id", text_col, _jac,
                         "jaccard", distributed)


def ngram_jaccard_dup_pairs_prefix(docs_ds, threshold: float = 0.6,
                                   k: int = 3, text_col: str = "text",
                                   distributed: bool | None = None):
    """The 100-TB shape of :func:`ngram_jaccard_dup_pairs`: PPJoin
    prefix-filtered candidate generation (full recall by the prefix
    theorem) + exact per-pair Jaccard verification through the shared
    broadcast/edge-join machinery.  Same exact answer, but the inverted
    index holds only each doc's (1-t)-ish prefix, so hot-shingle buckets
    shrink quadratically.  Ordering the universe by hash value (uniform)
    needs no global frequency pass; rarity-first ordering would prune
    harder at the cost of one extra count pass."""
    import ray
    import ray.data

    rows = docs_ds.map_batches(
        lambda b: ngram_prefix_rows(b, text_col, k, threshold),
        batch_format="pyarrow", batch_size=None,
    )

    def _jac(ta, tb):
        j = ngram_jaccard(ta or "", tb or "", k)
        return j if j >= threshold else None

    if distributed is False:
        tbl = pa.concat_tables(ray.get(rows.to_arrow_refs()))
        cand = _pairs_from_keyed_rows(tbl, "sh")
        return _verify_pairs(cand, docs_ds, "doc_id", text_col, _jac,
                             "jaccard", distributed)
    if distributed is None:
        rows, tbl = _bounded_collect(rows, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            cand = _pairs_from_keyed_rows(tbl, "sh")
            return _verify_pairs(cand, docs_ds, "doc_id", text_col, _jac,
                                 "jaccard", distributed)
    if distributed:
        rows = rows.materialize()

    def _sh_key(b: pa.Table) -> np.ndarray:
        return b.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)

    pairs = _coarse_grouped_pairs(rows, _sh_key,
                                  lambda t: _pairs_from_keyed_rows(t, "sh"))
    return _verify_pairs(pairs, docs_ds, "doc_id", text_col, _jac,
                         "jaccard", distributed)


# --- exact dedup -----------------------------------------------------------

def exact_dedup_groups(docs_ds, text_col: str = "text"):
    """Hash-partitioned exact dedup summary:
    Dataset[(content_md5, keep_doc_id, n_dupes)] — keep = lowest doc_id."""
    from ray.data.aggregate import Count, Min

    from .text import fingerprint_batch

    hashed = docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow"
    )
    return hashed.groupby("content_md5").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dupes")
    )


def normalized_dedup_groups(docs_ds, text_col: str = "text"):
    """Case/whitespace-insensitive exact dedup (the RefinedWeb-style
    normalize-then-hash pass): ASCII-fold + collapse whitespace runs +
    trim, md5 the canonical form, then the same hash-partitioned
    groupby as :func:`exact_dedup_groups`.

    Folding is ASCII-ONLY (``pc.ascii_lower``) by design — the fp16
    precedent (text.fingerprint_batch): Unicode case tables vary by
    library, so the SQL oracle mirrors with an explicit A-Z
    ``translate`` rather than locale-dependent ``lower()``.  The
    whitespace collapse is RE2 ``\\s+`` on both engines."""
    import hashlib

    from ray.data.aggregate import Count, Min

    def _norm(b: pa.Table) -> pa.Table:
        s = pc.ascii_lower(b.column(text_col))
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim(s, " ")
        texts = s.cast(pa.binary()).to_pylist()
        md5s = [None if t is None else hashlib.md5(t).hexdigest()
                for t in texts]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "norm_md5": pa.array(md5s, pa.string()),
        })

    hashed = docs_ds.map_batches(_norm, batch_format="pyarrow",
                                 batch_size=None)
    return hashed.groupby("norm_md5").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dupes")
    )


def exact_dedup(docs_ds, text_col: str = "text"):
    """Deduplicated dataset: one row (lowest doc_id) per content hash.
    Shuffle key = content hash (uniform — no skew by construction).

    Two-phase: a groupby MIN aggregate picks the keeper id per hash,
    then a semi-join keeps those rows — no per-group Python (a
    map_groups here also emits schema-less empty blocks that poison
    downstream hash joins; see test_curate_corpus_end_to_end_planted)."""
    from ray.data.aggregate import Min

    from .join import semi_join
    from .text import fingerprint_batch

    hashed = docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow"
    )
    keep = hashed.groupby("content_md5").aggregate(
        Min("doc_id", alias_name="keep_id"))
    return semi_join(hashed, keep, on="doc_id", right_key="keep_id")


def dedup_turns(transcripts_ds, driver_limit: int = 5_000_000):
    """Exact dedup on the transcript key (conv_id, turn_idx) — the
    resume-idempotence helper (SURVEY.md §2.3): re-ingesting an already
    processed shard cannot double rows downstream.  First row per key
    wins (rows with the same key are identical by construction).

    Two-phase: an in-block dedup shrinks each block first; the surviving
    rows merge on the driver when they fit (pandas drop_duplicates),
    else through the hash-partition groupby shuffle (the corpus-scale
    path)."""
    import ray
    import ray.data

    compact = transcripts_ds.map_batches(
        lambda df: df.drop_duplicates(["conv_id", "turn_idx"]),
        batch_format="pandas",
        batch_size=None,
    )
    tbl = pa.concat_tables(ray.get(compact.to_arrow_refs()))
    if len(tbl) <= driver_limit:
        pdf = tbl.to_pandas().drop_duplicates(["conv_id", "turn_idx"])
        return ray.data.from_pandas(pdf.reset_index(drop=True))

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return compact.groupby(["conv_id", "turn_idx"]).map_groups(
        _first, batch_format="pandas"
    )


# --- SimHash ---------------------------------------------------------------

_TOKEN_CACHE_MD5: dict[str, int] = {}


def _token_hashes_md5(toks: list[str]) -> np.ndarray:
    """Per-token md5 digest bytes [8:16] little-endian — bit-identical
    to DuckDB ``md5_number_lower``, so the simhash signature (and hence
    the exact pair oracle) is SQL-replayable.  Same per-worker
    distinct-token cache as :func:`_token_hashes`."""
    cache = _TOKEN_CACHE_MD5
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) >= _TOKEN_CACHE_MAX:
                cache.clear()
            h = cache[t] = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
        out[i] = h
    return out


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = _token_hashes_md5(toks)
    bits = np.unpackbits(hs.view(np.uint8)).reshape(len(hs), 64)
    # +1 for set bits, -1 for unset — SIGNED: the uint64 sum would wrap
    # on 2c < n and turn "minority" into "set" (caught by the oracle:
    # a single-token simhash must equal the token hash)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hs)
    out = np.packbits((votes > 0).astype(np.uint8))
    return int.from_bytes(out.tobytes(), "little")


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(np.array(vals, dtype=np.uint64)))


def simhash_dup_pairs(docs_ds, max_hamming: int = 3, text_col: str = "text",
                      distributed: bool | None = None):
    """SimHash near-dups: 4x16-bit chunk banding, Hamming-verified.
    Returns Dataset[(a, b, hamming)].  Verification attaches the 64-bit
    signatures (not the text) to each candidate — the cheapest possible
    join payload.

    Exactness: for max_hamming < 4, recall is 1 by pigeonhole (k
    differing bits touch at most k of the 4 chunks, so at least one
    16-bit band matches exactly) and the signature uses md5 token
    hashes — the full output set is therefore SQL-expressible and the
    `simhash_dup_pairs` oracle recomputes it end-to-end."""

    # ONE signature pass: the per-doc simhash loop is this operator's
    # dominant cost, so materialize the (doc_id, simhash) table and
    # derive BOTH the banding keys and the verification source from it
    sig_ds = docs_ds.map_batches(
        simhash_batch, batch_format="pyarrow", batch_size=None
    ).select_columns(["doc_id", "simhash"]).materialize()

    def _chunks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = np.arange(4, dtype=np.uint64) * np.uint64(16)
        keys = (sigs[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), len(ids))),
                "band_hash": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )

    chunks = sig_ds.map_batches(_chunks, batch_format="pyarrow", batch_size=None)
    cand = _candidate_pairs(chunks, distributed)

    # VECTORIZED verification: a simhash is 8 bytes, so the full
    # (doc_id -> signature) map is bounded by #docs (not #pairs) — 16 GB
    # at 10^9 docs; broadcast it once and popcount whole candidate
    # batches with numpy.  On template-heavy corpora the candidate set
    # grows quadratically (~6M pairs at sf0.1) and the generic per-pair
    # verification (Python loop / per-group assemble) became the
    # bottleneck; this path is linear vectorized in |candidates|.
    import ray
    import ray.data

    sig_tbl = pa.concat_tables(ray.get(sig_ds.to_arrow_refs()))
    ids_arr = sig_tbl.column("doc_id").to_numpy(zero_copy_only=False)
    sig_arr = sig_tbl.column("simhash").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    order = np.argsort(ids_arr, kind="stable")
    sig_ref = ray.put((ids_arr[order], sig_arr[order]))

    def _popcount64(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8) \
            .sum(axis=1).astype(np.int64)

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        ids_s, sig_s = ray.get(sig_ref)
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        sa = sig_s[np.searchsorted(ids_s, a)]
        sb = sig_s[np.searchsorted(ids_s, b)]
        ham = _popcount64(sa ^ sb)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": a[keep], "b": b[keep],
                             "hamming": ham[keep]})

    if isinstance(cand, pd.DataFrame):
        cand_ds = ray.data.from_pandas(cand[["a", "b"]]) if len(cand) else \
            ray.data.from_pandas(_empty_pairs())
    else:
        # distributed candidate path emits edge rows (a pair repeats per
        # colliding band): reduce to unique pairs with a sort-based
        # aggregate (vectorized C++), never per-pair map_groups
        from ray.data.aggregate import Count

        cand_ds = cand.groupby(["a", "b"]).aggregate(
            Count(alias_name="_dup")).drop_columns(["_dup"])
    return cand_ds.map_batches(_verify, batch_format="pandas",
                               batch_size=None)


# --- winnowing (rolling-hash document fingerprints) ------------------------

_WIN_BASE = np.uint64(1000003)


def winnow_fingerprints(text: str, k: int = 8, w: int = 16) -> np.ndarray:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken): rolling
    polynomial hash over byte k-grams, keep the minimum of each
    w-window (rightmost on ties), dedupe consecutive picks.  Guarantee:
    two documents sharing any substring of length >= w + k - 1 share at
    least one fingerprint.  Fully vectorized (sliding_window_view)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        return np.unique(_mix64(np.frombuffer(
            hashlib.blake2b(bytes(b), digest_size=8).digest(), dtype=np.uint64)))
    with np.errstate(over="ignore"):
        powers = _WIN_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        grams = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        hashes = _mix64((grams * powers).sum(axis=1, dtype=np.uint64))
    if len(hashes) <= w:
        return np.unique(hashes[[int(hashes.argmin())]])
    wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost minimum per window: argmin on the reversed window
    rev_arg = wins[:, ::-1].argmin(axis=1)
    pick = np.arange(len(wins)) + (w - 1 - rev_arg)
    return np.unique(hashes[np.unique(pick)])


def _winnow_explode(batch: pa.Table, text_col: str, k: int, w: int) -> pa.Table:
    ids, fps = [], []
    for i, t in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        for fp in winnow_fingerprints(t or "", k=k, w=w):
            ids.append(i)
            fps.append(fp)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "fp": pa.array(np.array(fps, dtype=np.uint64))})


def winnow_dup_pairs(docs_ds, min_shared: int = 3, k: int = 8, w: int = 16,
                     text_col: str = "text", distributed: bool | None = None):
    """Fingerprint-overlap near-dup pairs: docs sharing >= ``min_shared``
    winnowing fingerprints.  Shuffle payload = (doc_id, fingerprint)
    pairs only.  Counting shared fingerprints per candidate pair runs on
    the collected triples below ``_DRIVER_TRIPLE_LIMIT``; above it (or
    with ``distributed=True``) the scale path runs: hash-partition by
    fingerprint, emit the per-bucket pairs, count per (a, b) with a
    two-phase groupby — no driver materialization anywhere."""
    import collections

    import ray
    import ray.data

    exploded = docs_ds.map_batches(
        lambda b: _winnow_explode(b, text_col, k, w),
        batch_format="pyarrow", batch_size=None,
    )

    if not distributed:
        if distributed is False:
            tbl = pa.concat_tables(ray.get(exploded.to_arrow_refs()))
        else:
            exploded, tbl = _bounded_collect(exploded, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            fp = tbl.column("fp").to_numpy(zero_copy_only=False)
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, fp))
            fp, ids = fp[order], ids[order]
            bounds = np.flatnonzero(np.diff(fp) != 0) + 1
            cnt: collections.Counter = collections.Counter()
            for s, e in zip(np.concatenate(([0], bounds)),
                            np.concatenate((bounds, [len(fp)]))):
                if e - s < 2:
                    continue
                run = np.unique(ids[s:e])
                for i in range(len(run)):
                    for j in range(i + 1, len(run)):
                        cnt[(int(run[i]), int(run[j]))] += 1
            rows = [(a, b, n) for (a, b), n in sorted(cnt.items()) if n >= min_shared]
            if not rows:
                return ray.data.from_items([])
            a, b, n = zip(*rows)
            return ray.data.from_pandas(
                pd.DataFrame({"a": a, "b": b, "shared_fps": n}).astype(
                    {"a": "int64", "b": "int64", "shared_fps": "int64"}
                )
            )
        # fall through to the distributed path above the driver limit
    from ray.data.aggregate import Sum

    if distributed:
        exploded = exploded.materialize()

    def _fp_key(b: pa.Table) -> np.ndarray:
        return b.column("fp").to_numpy(zero_copy_only=False).astype(np.uint64)

    # coarse co-located groups emit PARTIAL shared-fp counts (a pair's
    # co-occurrences in every bucket of the group sum locally); the hash
    # aggregate finishes the count — never a per-bucket pandas group
    pairs = _coarse_grouped_pairs(exploded, _fp_key,
                                  lambda t: _pair_counts_from_keyed_rows(t, "fp"))
    counts = pairs.groupby(["a", "b"]).aggregate(Sum("n", alias_name="shared_fps"))
    out = counts.filter(expr=f"shared_fps >= {min_shared}")
    return out.map_batches(
        lambda df: df[["a", "b", "shared_fps"]].astype(
            {"a": "int64", "b": "int64", "shared_fps": "int64"}),
        batch_format="pandas",
    )


# --- embedding cosine near-dup --------------------------------------------

def _pair_cosine(va, vb) -> float | None:
    """dot / sqrt(|a|^2 * |b|^2) — same op order as the ANN operator
    (bit-compatible with DuckDB's list_cosine_similarity)."""
    va = np.asarray(va, dtype=np.float64)
    vb = np.asarray(vb, dtype=np.float64)
    denom = np.sqrt((va * va).sum() * (vb * vb).sum())
    if denom == 0:
        return None
    return float(va @ vb / denom)


def embedding_dup_pairs(emb_ds, threshold: float = 0.98, n_bands: int = 16,
                        bits_per_band: int = 8, seed: int = 42,
                        round_to: int | None = 6,
                        distributed: bool | None = None):
    """Multi-band random-hyperplane LSH over an embedding column ->
    bucket pairs -> exact cosine verify.  Returns Dataset[(a, b, cosine)]
    with a < b, unrounded cosine >= threshold (output rounded to
    ``round_to`` to match the SQL oracle).

    Recall is governed by OR-amplification across ``n_bands``
    independent bands of ``bits_per_band`` hyperplane sign bits each
    (ADVICE r1: a single band of 16 bits had ~18% recall at cosine
    0.95).  With the 16x8 default, a pair at cosine c collides in one
    band with p = (1 - arccos(c)/pi)^8, so miss probability is
    (1-p)^16: ~1.9e-4 at c=0.95, ~1e-12 at c=0.99.  False-positive
    candidates (c~0) survive a band with p=2^-8 and are discarded by the
    exact cosine verification."""
    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bands * bits_per_band))
    import ray

    planes_ref = ray.put(planes)
    weights = (np.uint64(1) << np.arange(bits_per_band, dtype=np.uint64))

    def _bands(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = list_column_matrix(batch["embedding"])
        bits = (vecs @ pl) > 0  # (n, n_bands*bits_per_band)
        keys = (bits.reshape(len(vecs), n_bands, bits_per_band).astype(np.uint64)
                * weights).sum(axis=2)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), len(ids))),
                "band_hash": pa.array(keys.reshape(-1)),
            }
        )

    buckets = emb_ds.map_batches(_bands, batch_format="pyarrow", batch_size=None)
    cand = _candidate_pairs(buckets, distributed)

    def _cos(va, vb):
        if va is None or vb is None:
            return None
        c = _pair_cosine(va, vb)
        if c is None or c < threshold:
            return None
        return round(c, round_to) if round_to is not None else c

    if isinstance(cand, pd.DataFrame) and not distributed \
            and len(cand) <= _DRIVER_PAIR_LIMIT:
        return _verify_broadcast(cand, emb_ds, "vec_id", "embedding", _cos,
                                 "cosine")

    # join path, TWO-STAGE (VERDICT r4 #4 — the one-stage join shipped
    # candidates x 2 full float64 vectors, ~1 GiB at sf0.1 because the
    # bands are loose by design).  Stage 1 joins candidates with int16
    # QUANTIZED sketches (8-byte scale header + d x int16: ~3.8x
    # smaller at d=64) and prunes with an EXACT angular error bound —
    # a pair survives iff quantized cosine + bound >= threshold, so no
    # true pair can be pruned (each vector's quantization radius r
    # deviates its direction by at most arcsin(r/|q|)).  Stage 2
    # re-fetches FULL vectors for surviving ids only (semi-join) and
    # verifies exactly: the full-precision exchange is bounded by the
    # near-dup volume, not the candidate volume.  (acero's hash join
    # rejects list-typed payloads, hence the binary blobs.)
    def _pack_q(b: pa.Table) -> pa.Table:
        vecs = list_column_matrix(b["embedding"])
        s = np.abs(vecs).max(axis=1)
        s[s == 0] = 1.0
        step = (s / 32767.0).astype(np.float64)
        q = np.round(vecs / step[:, None]).astype(np.int16)
        return pa.table({
            "vec_id": b["vec_id"],
            "qvb": pa.array([st.tobytes() + x.tobytes()
                             for st, x in zip(step, q)], pa.binary()),
        })

    def _cos_q_gate(ba, bb):
        if ba is None or bb is None:
            return None
        sa = np.frombuffer(ba, np.float64, count=1)[0]
        qa = np.frombuffer(ba, np.int16, offset=8).astype(np.float64) * sa
        sb = np.frombuffer(bb, np.float64, count=1)[0]
        qb = np.frombuffer(bb, np.int16, offset=8).astype(np.float64) * sb
        na = np.sqrt((qa * qa).sum())
        nb = np.sqrt((qb * qb).sum())
        if na == 0.0 or nb == 0.0:
            return 1.0  # degenerate: defer to the exact stage
        d = len(qa)
        ra = sa * 0.5 * np.sqrt(d)
        rb = sb * 0.5 * np.sqrt(d)
        if ra >= na or rb >= nb:
            return 1.0
        bound = float(np.arcsin(ra / na) + np.arcsin(rb / nb))
        c = float(qa @ qb / (na * nb))
        return c if c + bound >= threshold else None

    def _pack(b: pa.Table) -> pa.Table:
        vecs = list_column_matrix(b["embedding"])
        return pa.table({
            "vec_id": b["vec_id"],
            "vecb": pa.array([v.tobytes() for v in vecs], pa.binary()),
        })

    def _cos_packed(ba, bb):
        if ba is None or bb is None:
            return None
        return _cos(np.frombuffer(ba, dtype=np.float64),
                    np.frombuffer(bb, dtype=np.float64))

    if isinstance(cand, pd.DataFrame):
        if len(cand) == 0:
            import ray.data

            return ray.data.from_pandas(
                pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")}))
        import ray.data

        cand = ray.data.from_pandas(cand[["a", "b"]])

    from .join import semi_join

    packed_q = emb_ds.map_batches(_pack_q, batch_format="pyarrow",
                                  batch_size=None)
    # materialize: survivors feed BOTH the id semi-join and the stage-2
    # pair join (two consumers); size is survivor-bounded
    surv = _verify_pairs_join(cand, packed_q, "vec_id", "qvb",
                              _cos_q_gate, "qcos").materialize()

    def _surv_ids(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return pa.table({"_sid": pa.array([], pa.int64())})
        return pa.table({"_sid": pa.array(np.concatenate(
            [b.column("a").to_numpy(zero_copy_only=False),
             b.column("b").to_numpy(zero_copy_only=False)]).astype(
                 np.int64), pa.int64())})

    def _surv_pairs(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return b.select(["a", "b"])

    packed = emb_ds.map_batches(_pack, batch_format="pyarrow",
                                batch_size=None)
    packed = semi_join(packed, surv.map_batches(
        _surv_ids, batch_format="pyarrow", batch_size=None),
        on="vec_id", right_key="_sid")
    return _verify_pairs_join(surv.map_batches(
        _surv_pairs, batch_format="pyarrow", batch_size=None),
        packed, "vec_id", "vecb", _cos_packed, "cosine")


def semantic_dedup(emb_ds, threshold: float = 0.95, k: int = 8,
                   iterations: int = 2, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   distributed: bool | None = None):
    """SemDeDup-style cluster-scoped semantic dedup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space with the fixed-point
    k-means (``similarity.kmeans_assign`` — bit-exact vs the unrolled
    SQL), then inside each cluster drop every vector that has a
    SMALLER-id cluster-mate at exact cosine >= ``threshold``.  Returns
    Dataset[(id_col, cluster)] of the KEPT rows, sorted by id.

    Semantics are deliberately non-transitive (the paper's rule:
    compare against all cluster members, not only survivors): v drops
    iff EXISTS u, cluster(u) == cluster(v), u.id < v.id,
    cosine(u, v) >= threshold.  Cluster scoping is what makes the op
    cheap at scale — candidate generation reuses the full-recall LSH +
    two-stage verify of :func:`embedding_dup_pairs` (recall argument
    there), and pair volume is near-dup-bounded, so the only
    corpus-sized exchanges are the label pass (shuffle-free) and the
    final anti-join.

    Tiers: the label map collects to the driver under
    ``_DRIVER_TRIPLE_LIMIT`` rows (16 B each) and the census is one
    numpy pass; above it — or ``distributed=True`` — pairs join their
    endpoint labels (pairs side is small), same-cluster survivors feed
    a distributed anti-join on the label Dataset.
    """
    from .join import anti_join, hash_join
    from .similarity import kmeans_assign

    # materialize: consumed twice (pair labelling + final anti-join);
    # unmaterialized, Ray re-runs the Lloyd train per consumer
    assign = kmeans_assign(emb_ds, k=k, iterations=iterations,
                           id_col=id_col, emb_col=emb_col).materialize()
    pairs = embedding_dup_pairs(emb_ds, threshold=threshold,
                                distributed=distributed)
    mpairs, ptbl = _bounded_collect(pairs, _DRIVER_PAIR_LIMIT)

    if distributed is not True:
        massign, atbl = _bounded_collect(assign, _DRIVER_TRIPLE_LIMIT)
        if atbl is not None and ptbl is not None:
            import ray.data

            ids = atbl.column(id_col).to_numpy(zero_copy_only=False)
            cl = atbl.column("cluster").to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids, cl = ids[order], cl[order]
            if ptbl.num_rows and ptbl.num_columns:
                a = ptbl.column("a").to_numpy(zero_copy_only=False)
                b = ptbl.column("b").to_numpy(zero_copy_only=False)
                same = (cl[np.searchsorted(ids, a)]
                        == cl[np.searchsorted(ids, b)])
                keep_mask = ~np.isin(ids, np.unique(b[same]))
            else:
                keep_mask = np.ones(len(ids), bool)
            return ray.data.from_arrow(pa.table({
                id_col: pa.array(ids[keep_mask], pa.int64()),
                "cluster": pa.array(cl[keep_mask], pa.int64())}))
        assign = massign

    # distributed tier: label both pair endpoints (pairs side is the
    # small one), keep same-cluster pairs, anti-join the drop ids.
    # zero-block guard: Ray's hash-shuffle join can't take an empty
    # no-schema side (dup_ngram_spans precedent) — and count() here is
    # metadata-cheap on the already-materialized pairs.
    if mpairs.count() == 0:
        return assign.sort(id_col)

    def _as_a(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column(id_col), "ca": t.column("cluster")})

    def _as_b(t: pa.Table) -> pa.Table:
        return pa.table({"b": t.column(id_col), "cb": t.column("cluster")})

    def _ab(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"])

    lab_a = assign.map_batches(_as_a, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    lab_b = assign.map_batches(_as_b, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    j = hash_join(mpairs.map_batches(_ab, batch_format="pyarrow",
                                     batch_size=None), lab_a, on="a")
    j = hash_join(j, lab_b, on="b")

    def _same(t: pa.Table) -> pa.Table:
        return (t.filter(pc.equal(t.column("ca"), t.column("cb")))
                .select(["b"]))

    drops = j.map_batches(_same, batch_format="pyarrow", batch_size=None)
    kept = anti_join(assign, drops, on=id_col, right_key="b",
                     distributed=distributed)
    return kept.sort(id_col)


# --- dup-cluster resolution (connected components) --------------------------

_CC_DRIVER_EDGE_LIMIT = 2_000_000  # graph.py's pagerank bound


def connected_components(nodes_ds, edges_ds, node_col: str = "doc_id",
                         max_iter: int = 50,
                         distributed: bool | None = None):
    """Resolve near-dup PAIRS into canonical clusters: every node gets
    ``cluster_id`` = the smallest node id reachable through the edge
    set (singletons keep their own id).  This is the step that turns a
    dup-pair list into "keep one document per cluster".

    Iterative min-label propagation, Ray-Data-first: per round, one
    hash join (edge dst -> current labels), one groupby-min (smallest
    neighbor label per src), one left join back, until no label
    changes.  Rounds = graph diameter — near-dup clusters are
    near-cliques (diameter 1-2); for adversarial long chains the
    classic large-star/small-star doubling would cut rounds to
    O(log d) (documented, not needed for dup graphs).  The driver
    holds only the per-round changed-row count; edges and labels stay
    in the object store (edge table is candidate-sized, labels are
    O(nodes x 16B))."""
    import ray
    import ray.data
    from ray.data.aggregate import Min, Sum

    from .join import hash_join

    def _undir(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, bb]), pa.int64()),
                         "dst": pa.array(np.concatenate([bb, a]), pa.int64())})

    seed_e = ray.data.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                           "dst": pa.array([], pa.int64())}))
    edges = seed_e.union(
        edges_ds.map_batches(_undir, batch_format="pyarrow",
                             batch_size=None)).materialize()

    def _init(b: pa.Table) -> pa.Table:
        n = b.column(node_col).cast(pa.int64())
        return pa.table({"node": n, "label": n})

    labels = nodes_ds.map_batches(_init, batch_format="pyarrow",
                                  batch_size=None).materialize()
    if edges.count() == 0:
        return labels.map_batches(
            lambda b: pa.table({node_col: b.column("node"),
                                "cluster_id": b.column("label")}),
            batch_format="pyarrow", batch_size=None)

    # driver tier: each distributed round below costs seconds of fixed
    # exchange overhead, which dwarfs the near-clique dup graphs this
    # resolves (measured 15.5 s for 68 edges).  Under the edge bound the
    # min-labels come from a vectorized numpy relax + pointer-jump over
    # the collected EDGE list only — nodes are never collected; labels
    # broadcast once and apply per node block.  Above the bound (or
    # ``distributed=True``) the exchange path below is unchanged.
    if not distributed:
        if distributed is False:
            # forced-driver: collect WITHOUT the bound — the caller
            # explicitly opted out of the exchange path, so honor it
            # (mirrors the `distributed is False` branches above)
            etbl = pa.concat_tables(ray.get(edges.to_arrow_refs()))
        else:
            edges, etbl = _bounded_collect(edges, _CC_DRIVER_EDGE_LIMIT)
        if etbl is not None and etbl.num_rows:
            src = etbl.column("src").to_numpy(zero_copy_only=False)
            dst = etbl.column("dst").to_numpy(zero_copy_only=False)
            uids, inv = np.unique(np.concatenate([src, dst]),
                                  return_inverse=True)
            lab = np.arange(len(uids), dtype=np.int64)
            si, di = inv[: len(src)], inv[len(src):]
            for _ in range(max_iter):
                new = lab.copy()
                np.minimum.at(new, si, lab[di])
                while True:  # pointer jumping: chase labels to roots
                    nn = new[new]
                    if np.array_equal(nn, new):
                        break
                    new = nn
                if np.array_equal(new, lab):
                    break
                lab = new
            # uids ascend, so the min label INDEX is the min node id
            final = uids[lab]
            ref = ray.put((uids, final))

            def _apply(b: pa.Table) -> pa.Table:
                u, f = ray.get(ref)
                n = b.column("node").to_numpy(zero_copy_only=False)
                pos = np.minimum(np.searchsorted(u, n), len(u) - 1)
                inb = u[pos] == n
                out = np.where(inb, f[pos], n)
                return pa.table({node_col: pa.array(n, pa.int64()),
                                 "cluster_id": pa.array(out, pa.int64())})

            return labels.map_batches(_apply, batch_format="pyarrow",
                                      batch_size=None)

    for _ in range(max_iter):
        # smallest neighbor label per src (neighbor = edge dst)
        nbr = hash_join(edges, labels, on=("dst",), right_on=("node",))
        mins = nbr.groupby("src").aggregate(Min("label", alias_name="minlab"))
        joined = hash_join(labels, mins, on=("node",), right_on=("src",),
                           join_type="left_outer")

        def _update(b: pa.Table) -> pa.Table:
            lab = b.column("label")
            # singletons (no neighbor) keep their label; pyarrow kernels
            new = pc.min_element_wise(lab, pc.coalesce(b.column("minlab"),
                                                       lab))
            return pa.table({"node": b.column("node"), "label": new,
                             "_changed": pc.cast(pc.not_equal(new, lab),
                                                 pa.int64())})

        updated = joined.map_batches(_update, batch_format="pyarrow",
                                     batch_size=None).materialize()
        n_changed = updated.map_batches(
            lambda b: pa.table({"c": pa.array(
                [int(pc.sum(b.column("_changed")).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow", batch_size=None).to_pandas()["c"].sum()
        labels = updated.select_columns(["node", "label"]).materialize()
        if n_changed == 0:
            break

    return labels.map_batches(
        lambda b: pa.table({node_col: b.column("node"),
                            "cluster_id": b.column("label")}),
        batch_format="pyarrow", batch_size=None)


# --- TF-IDF weighted cosine similarity join ---------------------------------

def tfidf_token_rows(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Explode each doc into (doc_id, th, tf) rows: word-token hash64 +
    in-doc term frequency.  Tokenization is the shingle rule at k=1
    (whitespace split, empties dropped), so the SQL oracle replays it
    with ``regexp_split_to_array(text, '\\s+')``.  Docs with no tokens
    emit nothing (they cannot pair)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    cat, offs = _shingle_hash_segments(texts, 1)
    if len(cat) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "th": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    seg = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(offs))
    order = np.lexsort((cat, seg))
    seg_s, cat_s = seg[order], cat[order]
    new = np.ones(len(cat_s), dtype=bool)
    new[1:] = (seg_s[1:] != seg_s[:-1]) | (cat_s[1:] != cat_s[:-1])
    starts = np.flatnonzero(new)
    tf = np.diff(np.concatenate((starts, [len(cat_s)])))
    # hash rides BIT-REINTERPRETED as int64: Ray's groupby/join shuffle
    # round-trips uint64 > 2^63 through Python ints and overflows the
    # rebuilt int64 column; the view keeps the 1:1 token mapping
    return pa.table({
        "doc_id": pa.array(ids[seg_s[starts]].astype(np.int64), pa.int64()),
        "th": pa.array(cat_s[starts].view(np.int64), pa.int64()),
        "tf": pa.array(tf.astype(np.int64), pa.int64()),
    })


def _pair_products_from_keyed_rows(tbl: pa.Table, key_col: str,
                                   val_col: str) -> pd.DataFrame:
    """(doc_id, key, val) rows -> (a, b, dot) partial sums of va*vb over
    shared keys — the weighted sibling of _pair_counts_from_keyed_rows.
    Ids are distinct within a key by construction (one row per (doc,
    token)); within-run ids sort ascending so a < b by packing."""
    key = tbl.column(key_col).to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    vals = tbl.column(val_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key))
    key, ids, vals = key[order], ids[order], vals[order]
    boundaries = np.flatnonzero(np.diff(key) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    stops = np.concatenate((boundaries, [len(key)]))
    empty = _empty_pairs().assign(dot=pd.Series([], dtype="float64"))
    if len(ids) and (ids.max() >= (1 << 32) or ids.min() < 0):
        # same escape hatch as _expand_runs_to_pair_counts: ids beyond
        # the uint64 pack bound take a dict accumulator (tested, slow)
        acc: dict = {}
        for s, e in zip(starts, stops):
            if e - s < 2:
                continue
            u, v = ids[s:e], vals[s:e]
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    p = (int(u[i]), int(u[j]))
                    acc[p] = acc.get(p, 0.0) + float(v[i] * v[j])
        if not acc:
            return empty
        ks = sorted(acc)
        return pd.DataFrame({"a": [k[0] for k in ks],
                             "b": [k[1] for k in ks],
                             "dot": [acc[k] for k in ks]})
    u64 = ids.astype(np.uint64)
    key_chunks, prod_chunks = [], []
    for s, e in zip(starts, stops):
        m = e - s
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, k=1)
        key_chunks.append((u64[s:e][ii] << np.uint64(32)) | u64[s:e][jj])
        prod_chunks.append(vals[s:e][ii] * vals[s:e][jj])
    if not key_chunks:
        return empty
    keys_cat = np.concatenate(key_chunks)
    prods = np.concatenate(prod_chunks)
    uk, inv = np.unique(keys_cat, return_inverse=True)
    dots = np.zeros(len(uk), dtype=np.float64)
    np.add.at(dots, inv, prods)
    return pd.DataFrame({"a": (uk >> np.uint64(32)).astype(np.int64),
                         "b": (uk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                         "dot": dots})


_TFIDF_VOCAB_BROADCAST_LIMIT = 5_000_000


def tfidf_cosine_pairs(docs_ds, threshold: float = 0.5,
                       max_df_frac: float = 0.5, text_col: str = "text",
                       distributed: bool | None = None):
    """All-pairs TF-IDF weighted cosine similarity join: pairs (a, b,
    cosine) with a < b and cosine >= threshold, where each doc is the
    sparse vector w(d, t) = tf(d, t) * ln(N / df(t)) over whitespace
    word tokens, N = docs with >= 1 token.  The WEIGHTED counterpart of
    the n-gram Jaccard join: shared rare terms dominate, boilerplate
    stopwords are damped by idf and the df cap.

    Tokens with df > max_df_frac * N are dropped (the standard stopword
    cap) — also the SKEW BOUND: a token in m docs emits m(m-1)/2
    partial products, so the cap bounds the hottest bucket; the
    threshold then prunes the aggregate.  The comparison runs UNROUNDED
    on both sides (same protocol as embedding_dup_pairs — valid when no
    pair sits within float noise of the threshold); output cosine is
    rounded to 6dp (ln/sum-order last-ulp protocol).

    Scale shape: one token-row exchange for df (vocab-bounded result,
    broadcast under _TFIDF_VOCAB_BROADCAST_LIMIT, hash-join above), one
    doc-keyed exchange for norms, one token-keyed coarse-grouped pair
    expansion (co-located buckets, vectorized products, never a
    per-pair Python loop), one (a, b) aggregate of reduced rows."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    rows = docs_ds.map_batches(
        lambda b: tfidf_token_rows(b, text_col),
        batch_format="pyarrow", batch_size=None)

    def _local(tbl: pa.Table) -> pd.DataFrame:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        th = tbl.column("th").to_numpy(zero_copy_only=False)
        tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        if len(ids) == 0:
            return _empty_pairs().assign(cosine=pd.Series([], dtype="float64"))
        n_docs = len(np.unique(ids))
        uth, inv, df = np.unique(th, return_inverse=True, return_counts=True)
        keep = df[inv] <= max_df_frac * n_docs
        ids, th, tf, inv = ids[keep], th[keep], tf[keep], inv[keep]
        w = tf * np.log(n_docs / df[inv])
        uid, dinv = np.unique(ids, return_inverse=True)
        norm2 = np.zeros(len(uid))
        np.add.at(norm2, dinv, w * w)
        nw = w / np.sqrt(norm2)[dinv]
        sub = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "th": pa.array(th, pa.int64()),
                        "nw": pa.array(nw, pa.float64())})
        out = _pair_products_from_keyed_rows(sub, "th", "nw")
        out = out[out["dot"] >= threshold]
        return pd.DataFrame({"a": out["a"].to_numpy(),
                             "b": out["b"].to_numpy(),
                             "cosine": np.round(out["dot"].to_numpy(), 6)})

    if distributed is False:
        tbl = pa.concat_tables(ray.get(rows.to_arrow_refs()))
        return ray.data.from_pandas(_local(tbl))
    if distributed is None:
        rows, tbl = _bounded_collect(rows, _DRIVER_TRIPLE_LIMIT)
        if tbl is not None:
            return ray.data.from_pandas(_local(tbl))
    else:
        rows = rows.materialize()

    # ---- distributed tier ----
    # N: token rows are generated per block, so a doc's rows never span
    # blocks — per-block distinct doc counts sum exactly
    n_docs = int(sum(
        r["nd"] for r in rows.map_batches(
            lambda b: pa.table({"nd": pa.array(
                [len(np.unique(b.column("doc_id").to_numpy(
                    zero_copy_only=False)))], pa.int64())}),
            batch_format="pyarrow", batch_size=None).take_all()))
    df_ds = rows.groupby("th").count()

    df_ds, df_tbl = _bounded_collect(df_ds, _TFIDF_VOCAB_BROADCAST_LIMIT)
    cap = max_df_frac * n_docs
    if df_tbl is not None:
        dth = df_tbl.column("th").to_numpy(zero_copy_only=False)
        dcnt = df_tbl.column("count()").to_numpy(zero_copy_only=False)
        o = np.argsort(dth)
        dth, dcnt = dth[o], dcnt[o]
        ref = ray.put((dth, dcnt))

        def _weight(b: pa.Table) -> pa.Table:
            vth, vdf = ray.get(ref)
            th = b.column("th").to_numpy(zero_copy_only=False)
            tf = b.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
            dfv = vdf[np.searchsorted(vth, th)]
            keep = dfv <= cap
            w = tf[keep] * np.log(n_docs / dfv[keep])
            return pa.table({"doc_id": b.column("doc_id").filter(
                                 pa.array(keep)),
                             "th": b.column("th").filter(pa.array(keep)),
                             "w": pa.array(w, pa.float64())})

        w_rows = rows.map_batches(_weight, batch_format="pyarrow",
                                  batch_size=None)
    else:
        from .join import hash_join

        def _idf(b: pa.Table) -> pa.Table:
            cnt = b.column("count()").to_numpy(zero_copy_only=False)
            keep = cnt <= cap
            return pa.table({
                "_jth": b.column("th").filter(pa.array(keep)),
                "idf": pa.array(np.log(n_docs / cnt[keep]), pa.float64())})

        idf_ds = df_ds.map_batches(_idf, batch_format="pyarrow",
                                   batch_size=None)
        joined = hash_join(rows, idf_ds, on="th", right_on="_jth")

        def _mul(b: pa.Table) -> pa.Table:
            tf = b.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
            idf = b.column("idf").to_numpy(zero_copy_only=False)
            return pa.table({"doc_id": b.column("doc_id"),
                             "th": b.column("th"),
                             "w": pa.array(tf * idf, pa.float64())})

        w_rows = joined.map_batches(_mul, batch_format="pyarrow",
                                    batch_size=None)

    w_rows = w_rows.materialize()

    def _n2(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b.column("doc_id"),
                         "w2": pa.array(w * w, pa.float64())})

    norms = w_rows.map_batches(_n2, batch_format="pyarrow",
                               batch_size=None) \
        .groupby("doc_id").aggregate(Sum(on="w2", alias_name="n2")) \
        .map_batches(lambda b: pa.table({
            "_jdoc": b.column("doc_id"),
            "norm": pa.array(np.sqrt(
                b.column("n2").to_numpy(zero_copy_only=False)),
                pa.float64())}),
            batch_format="pyarrow", batch_size=None)

    from .join import hash_join as _hj

    nw_rows = _hj(w_rows, norms, on="doc_id", right_on="_jdoc")

    def _norm(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        nm = b.column("norm").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b.column("doc_id"),
                         "th": b.column("th"),
                         "nw": pa.array(w / nm, pa.float64())})

    nw_rows = nw_rows.map_batches(_norm, batch_format="pyarrow",
                                  batch_size=None).materialize()

    # coarse-grouped weighted pair expansion (a th bucket never splits);
    # a float dot column rules out reusing _coarse_grouped_pairs' int64
    # output contract
    from ..functions.hashing import mix64

    n = nw_rows.count()
    n_groups = max(32, min(4096, n // _COARSE_GROUP_ROWS + 1))

    def _add_pkey(b: pa.Table) -> pa.Table:
        key = b.column("th").to_numpy(zero_copy_only=False).astype(np.uint64)
        pkey = (mix64(key) % np.uint64(n_groups)).astype(np.int64)
        return b.append_column("pkey", pa.array(pkey, pa.int64()))

    def _group_pairs(g: pa.Table) -> pa.Table:
        df = _pair_products_from_keyed_rows(g, "th", "nw")
        return pa.table({
            "a": pa.array(df["a"].to_numpy().astype(np.int64), pa.int64()),
            "b": pa.array(df["b"].to_numpy().astype(np.int64), pa.int64()),
            "dot": pa.array(df["dot"].to_numpy(), pa.float64())})

    partial = nw_rows.map_batches(_add_pkey, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True) \
        .groupby("pkey").map_groups(_group_pairs, batch_format="pyarrow")
    # many tiny map_groups blocks -> repartition before the aggregate
    # (the measured 16s -> 2.6s shuffle-fixed-cost lesson)
    partial = partial.repartition(max(2, n_groups // 16))
    summed = partial.groupby(["a", "b"]).aggregate(
        Sum(on="dot", alias_name="cos"))

    def _fin(b: pa.Table) -> pa.Table:
        cos = b.column("cos").to_numpy(zero_copy_only=False)
        keep = cos >= threshold
        return pa.table({
            "a": b.column("a").filter(pa.array(keep)),
            "b": b.column("b").filter(pa.array(keep)),
            "cosine": pa.array(np.round(cos[keep], 6), pa.float64())})

    return summed.map_batches(_fin, batch_format="pyarrow",
                              batch_size=None)

"""Deduplication operators over the ``documents`` table.

Five families, each expressed Ray-Data-first:

* exact: content-hash -> hash-partitioned groupby, keep lowest doc_id.
* MinHash + LSH: shingle -> minhash signature -> banded bucket groupby ->
  candidate pairs -> exact-Jaccard verification.
* SimHash: 64-bit signatures -> chunk-banded buckets -> Hamming verify.
* n-gram Jaccard: exact similarity on candidate pairs.
* embedding cosine: random-hyperplane LSH buckets -> cosine verify.

Partitioning assumptions (documented per north-rule): candidate
generation shuffles only (band_id, band_hash, doc_id) triples — tiny vs
the corpus; pair verification here rehydrates text/embeddings from a
broadcast lookup (``ray.put`` once), which holds while the *candidate*
id set fits in memory; at 100 TB swap the broadcast for a bucket join on
doc_id (hash-partition both sides on doc_id, verify per bucket) — the
band structure is unchanged.

All hashing is explicit (blake2b / seeded numpy), never Python ``hash``
(PYTHONHASHSEED varies across Ray workers).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows


def _hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle -> uint64 hash array (deterministic)."""
    toks = text.split()
    if len(toks) < k:
        src: Iterable[str] = [" ".join(toks)] if toks else []
    else:
        src = (" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    hs = [_hash64(s.encode("utf-8")) for s in src]
    return np.unique(np.array(hs, dtype=np.uint64))


_PERM_SEEDS = np.random.default_rng(42).integers(
    0, np.iinfo(np.uint64).max, size=_N_PERM, dtype=np.uint64
)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a cheap uniform permutation family (the
    minhash estimate only needs per-seed pseudo-random orderings)."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def minhash_signature(text: str) -> np.ndarray:
    """64-permutation minhash signature (uint64[64])."""
    hs = _shingle_hashes(text)
    if len(hs) == 0:
        return np.zeros(_N_PERM, dtype=np.uint64)
    return _mix64(hs[None, :] ^ _PERM_SEEDS[:, None]).min(axis=1)


def minhash_bands_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Explode each doc into (doc_id, band, band_hash) rows — the ONLY
    payload that enters the LSH shuffle."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_id, out_band, out_hash = [], [], []
    rows_per_band = _N_PERM // _BANDS
    for i, t in zip(ids, texts):
        sig = minhash_signature(t or "")
        for b in range(_BANDS):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            out_id.append(i)
            out_band.append(b)
            out_hash.append(_hash64(chunk.tobytes()))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
        }
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band, band_hash) bucket."""
    ids = sorted(set(group["doc_id"].tolist()))
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
    return pd.DataFrame({"a": list(a), "b": list(b)})


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    ha = _shingle_hashes(text_a, k)
    hb = _shingle_hashes(text_b, k)
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = len(ha) + len(hb) - inter
    return inter / union if union else 0.0


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
    out = set()
    for s, e in zip(starts, stops):
        if e - s < 2:
            continue
        run = np.unique(ids[s:e])
        for i in range(len(run)):
            for j in range(i + 1, len(run)):
                out.add((int(run[i]), int(run[j])))
    if not out:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    a, b = zip(*sorted(out))
    return pd.DataFrame({"a": list(a), "b": list(b)})


# below this many (doc, band) triples the candidate generation collects
# them to the driver (24B/row) and runs the numpy run-finder; above it,
# fall back to the distributed groupby (the 100TB path: triples are the
# ONLY payload shuffled)
_DRIVER_TRIPLE_LIMIT = 20_000_000


def minhash_dup_pairs(docs_ds, threshold: float = 0.8, text_col: str = "text"):
    """MinHash-LSH near-duplicate pairs, Jaccard-verified.

    Returns Dataset[(a, b, jaccard)] with a < b, jaccard >= threshold.
    """
    import ray
    import ray.data

    bands = docs_ds.map_batches(
        lambda b: minhash_bands_batch(b, text_col), batch_format="pyarrow",
        batch_size=None,
    )
    triples = pa.concat_tables(ray.get(bands.to_arrow_refs()))
    if len(triples) <= _DRIVER_TRIPLE_LIMIT:
        cand = _pairs_from_triples(triples)
    else:  # distributed path for corpus-scale runs
        pairs = bands.groupby(["band", "band_hash"]).map_groups(
            _bucket_pairs, batch_format="pandas"
        )
        cand = pairs.to_pandas().drop_duplicates().astype({"a": "int64", "b": "int64"})
    if len(cand) == 0:
        return ray.data.from_items([])
    # verification: broadcast the candidate docs' texts once (scale path:
    # bucket join on doc_id instead — see module docstring)
    need = set(cand["a"]).union(cand["b"])
    texts = {}
    for b in docs_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for i, t in zip(b["doc_id"].to_pylist(), b[text_col].to_pylist()):
            if i in need:
                texts[i] = t
    ref = ray.put(texts)
    cand_ds = ray.data.from_pandas(cand)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        jac = [
            ngram_jaccard(lookup.get(x, ""), lookup.get(y, ""))
            for x, y in zip(batch["a"], batch["b"])
        ]
        batch = batch.assign(jaccard=jac)
        return batch[batch["jaccard"] >= threshold]

    return cand_ds.map_batches(_verify, batch_format="pandas")


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


def exact_dedup(docs_ds, text_col: str = "text"):
    """Deduplicated dataset: one row (lowest doc_id) per content hash.
    Shuffle key = content hash (uniform — no skew by construction)."""
    from .text import fingerprint_batch

    hashed = docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow"
    )

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "doc_id")

    return hashed.groupby("content_md5").map_groups(_first, batch_format="pandas")


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

def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = np.array([_hash64(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    bits = np.unpackbits(hs.view(np.uint8)).reshape(len(hs), 64)
    votes = bits.sum(axis=0) * 2 - len(hs)  # +1 for set bits, -1 for unset
    out = np.packbits((votes > 0).astype(np.uint8))
    return int.from_bytes(out.tobytes(), "little")


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(np.array(vals, dtype=np.uint64)))


def simhash_dup_pairs(docs_ds, max_hamming: int = 3, text_col: str = "text"):
    """SimHash near-dups: 4x16-bit chunk banding, Hamming-verified.
    Returns Dataset[(a, b, hamming)]."""
    import ray.data

    def _chunks(batch: pa.Table) -> pa.Table:
        ids, bands, keys, sigs = [], [], [], []
        for i, t in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
            sh = simhash64(t or "")
            for c in range(4):
                ids.append(i)
                bands.append(c)
                keys.append((sh >> (16 * c)) & 0xFFFF)
                sigs.append(sh)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(keys, pa.int64()),
                "sig": pa.array(np.array(sigs, dtype=np.uint64)),
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"], g["sig"])))
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if ham <= max_hamming:
                    out.append((rows[i][0], rows[j][0], ham))
        return pd.DataFrame(out, columns=["a", "b", "hamming"]).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )

    chunks = docs_ds.map_batches(_chunks, batch_format="pyarrow", batch_size=None)
    import ray

    tbl = pa.concat_tables(ray.get(chunks.to_arrow_refs()))
    if len(tbl) <= _DRIVER_TRIPLE_LIMIT:
        cand = _pairs_from_triples(tbl)
        sig = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("sig").to_pylist()))
        rows = [
            (a, b, bin(int(sig[a]) ^ int(sig[b])).count("1"))
            for a, b in zip(cand["a"], cand["b"])
        ]
        pdf = pd.DataFrame(rows, columns=["a", "b", "hamming"]).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )
        pdf = pdf[pdf.hamming <= max_hamming]
    else:  # distributed path for corpus-scale runs
        pairs = chunks.groupby(["band", "band_hash"]).map_groups(
            _pairs, batch_format="pandas"
        )
        pdf = pairs.to_pandas().drop_duplicates(subset=["a", "b"])
    return ray.data.from_pandas(pdf) if len(pdf) else ray.data.from_items([])


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


def winnow_dup_pairs(docs_ds, min_shared: int = 3, k: int = 8, w: int = 16,
                     text_col: str = "text"):
    """Fingerprint-overlap near-dup pairs: docs sharing >= ``min_shared``
    winnowing fingerprints.  Shuffle payload = (doc_id, fingerprint)
    pairs only; counting shared fingerprints per candidate pair runs on
    the collected triples (documented scale path: hash-partition by
    fingerprint, count per bucket, merge)."""
    import collections

    import ray
    import ray.data

    def _explode(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, t in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
            for fp in winnow_fingerprints(t or "", k=k, w=w):
                ids.append(i)
                fps.append(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(np.array(fps, dtype=np.uint64))})

    tbl = pa.concat_tables(ray.get(
        docs_ds.map_batches(_explode, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()
    ))
    fp = tbl.column("fp").to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, fp))
    fp, ids = fp[order], ids[order]
    bounds = np.flatnonzero(np.diff(fp) != 0) + 1
    cnt: collections.Counter = collections.Counter()
    for s, e in zip(np.concatenate(([0], bounds)), np.concatenate((bounds, [len(fp)]))):
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


# --- embedding cosine near-dup --------------------------------------------

def embedding_dup_pairs(emb_ds, threshold: float = 0.98, n_planes: int = 16, seed: int = 42):
    """Random-hyperplane LSH over an embedding column -> bucket pairs ->
    cosine verify.  Returns Dataset[(a, b, cosine)] with a < b."""
    import ray
    import ray.data

    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def _sign_buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = np.vstack(batch["embedding"].to_pylist()).astype(np.float64)
        bits = (vecs @ pl) > 0
        key = np.packbits(bits, axis=1, bitorder="little")[:, :2].copy().view(np.uint16)[:, 0]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(key.astype(np.int64)),
            }
        )

    buckets = emb_ds.map_batches(_sign_buckets, batch_format="pyarrow", batch_size=None)
    tbl = pa.concat_tables(ray.get(buckets.to_arrow_refs()))
    cand = _pairs_from_triples(
        pa.table(
            {
                "doc_id": tbl.column("vec_id"),
                "band": pa.array(np.zeros(len(tbl), np.int32)),
                "band_hash": tbl.column("bucket").cast(pa.uint64()),
            }
        )
    )
    if len(cand) == 0:
        return ray.data.from_items([])
    need = set(cand["a"]).union(cand["b"])
    vecs = {}
    for b in emb_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for i, v in zip(b["vec_id"].to_pylist(), b["embedding"].to_pylist()):
            if i in need:
                vecs[i] = np.asarray(v, dtype=np.float64)
    ref = ray.put(vecs)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        cos = []
        for x, y in zip(batch["a"], batch["b"]):
            va, vb = lookup[x], lookup[y]
            cos.append(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12)))
        batch = batch.assign(cosine=cos)
        return batch[batch["cosine"] >= threshold]

    import ray.data

    return ray.data.from_pandas(cand).map_batches(_verify, batch_format="pandas")

"""Incremental inverted text index: document increments exploded to
term postings and appended to a term-hash-partitioned store, probed
with QUERY-TERM scan pruning — the text-search side of the ingest-store
family (dedup_store / upsert_store / ann_store), for the "search the
corpus as it arrives" workflow (quality forensics, contamination
lookups, ad-hoc corpus search) a training-data pipeline needs.

Store layout (the :mod:`store_fold` marker-gated contract)::

    store_dir/_index.json             # {n_buckets} metadata
    store_dir/term=<b>/inc<id>.parquet       # term, doc_id, tf, dl,
                                             #   positions (list<int64>)
    store_dir/term=<b>/compact<upto>.parquet # folded increments
    store_dir/term=<n_buckets>/...           # doc-length partition: one
                                             #   (doc_id, dl) row per doc
                                             #   (reserved bucket — term
                                             #   hashes are % n_buckets,
                                             #   so probes never open it)
    store_dir/_deletes/del<id>.parquet       # tombstoned doc_ids
    store_dir/_deletes/_done_del<id>.json    # delete marker + stats delta
    store_dir/_done_inc<id>.json      # marker + {n_docs, n_tokens}
    store_dir/_compact.json           # compaction watermark

Postings are DENORMALIZED — each (term, doc) row carries the doc's
token count ``dl`` — so a BM25 probe is self-contained: it never joins
back to a doc-length sidecar, it reads ONLY the query terms' hash
buckets (``probe_files`` is the testable pruning contract, the
ann_store pattern).  Corpus-level stats (N, total tokens — needed for
idf and avgdl) ride the completeness markers, so they are metadata
reads, not scans.  Term -> bucket routing uses the md5-derived
:func:`sample.content_hash64` — NEVER Python's per-process-randomized
``hash()`` (CLAUDE.md bucketing rule), so every worker and every later
increment agrees on the bucket of a term.

Scale shape: ingest is one ``map_batches`` explode (the vectorized
``term_tf_rows`` factorize kernel) + ONE hash shuffle by bucket per
increment; each bucket task writes its file independently and no
driver state scales with the data.  The probe's df reduce is bounded
by |query terms|; scoring is a per-row broadcast-scalar kernel + one
``groupby(doc_id)`` over candidate docs only.

Append-only contract: a doc_id is ingested by exactly ONE increment
(the dedup_ingest store is the upstream that guarantees novelty), so a
term's df is a plain row count and no cross-increment merge of a doc's
postings is ever needed.  Rerun idempotence / crash windows / the
compaction watermark are the shared :mod:`store_fold` discipline.

Deletion (right-to-be-forgotten): :func:`index_delete` tombstones a
doc_id batch — it resolves the batch against the doc-length partition
(dropping never-ingested and already-deleted ids so stats deltas never
double-count), writes the id list + an exact (n_docs, n_tokens) delta,
and from that moment every probe masks the docs LOGICALLY (an
anti-join on the tombstones, broadcast/hash-tiered) and corrects
N/avgdl/df from the deltas.  :func:`compact_text_index` purges them
PHYSICALLY (the fold's ``drop_fn`` hook) — compaction is already the
moment every surviving row is rewritten, so the purge is free.
Tombstone files/deltas are retained after the purge (they keep the
marker-summed stats honest and re-masking purged ids is a no-op).  A
tombstoned doc_id is deleted FOREVER: re-ingesting it is a contract
violation (probes would mask its rows while ingest markers count it).

BM25 parity: idf and the per-term contribution reuse the exact IEEE op
order of :func:`text.bm25_scores` (ln((N-df+0.5)/(df+0.5)+1),
tf*(k1+1) / (tf + k1*((1-b) + (b*dl)/avgdl))); only the cross-term sum
order differs from the SQL left-fold, absorbed by the 6dp rounding
both sides (the BM25/ANN ln-ulp protocol)."""

from __future__ import annotations

import glob
import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .sample import content_hash64
from .store_fold import (atomic_json, atomic_write, check_watermark,
                         fold_marker_complete)


def _term_buckets(terms, n_buckets: int) -> np.ndarray:
    """Stable term -> bucket routing (md5 low bits, process-invariant)."""
    return (content_hash64(list(terms)) % np.uint64(n_buckets)) \
        .astype(np.int64)


def _load_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, "_index.json")) as f:
        return json.load(f)


def index_ingest(docs_ds, store_dir: str, inc_id: int,
                 n_buckets: int = 32, text_col: str = "text",
                 id_col: str = "doc_id", positions: bool = True) -> pa.Table:
    """Ingest one document increment (``doc_id``, ``text``).  Eager
    (files + marker on disk on return); returns the per-bucket stats
    table (bucket, n_rows).

    ONE pass over the increment: the postings explode + one hash
    shuffle by bucket.  The marker's (n_docs, n_tokens) corpus stats —
    N counts EMPTY docs too, exactly like ``bm25_scores``'s oracle —
    are summed from the just-written doc-length partition file, not a
    second text scan.

    ``positions=False`` drops the per-posting position lists (~35%
    smaller postings files, measured at sf0.1 x32 — BM25 and AND
    probes are unaffected either way because they column-prune
    positions at the read; only :func:`index_phrase_docs` needs them,
    and it raises a clear error on a positions-less store).  The
    choice is persisted and enforced across increments, like
    ``n_buckets``."""
    os.makedirs(store_dir, exist_ok=True)
    check_watermark(store_dir, inc_id)

    mpath = os.path.join(store_dir, "_index.json")
    if os.path.exists(mpath):
        meta = _load_meta(store_dir)
        if int(meta["n_buckets"]) != n_buckets:
            raise ValueError(
                f"store was created with n_buckets={meta['n_buckets']},"
                f" got {n_buckets}: term routing would diverge between "
                "increments and probes would miss postings.")
        if bool(meta.get("positions", True)) != positions:
            raise ValueError(
                f"store was created with positions="
                f"{meta.get('positions', True)}, got {positions}: "
                "increments would disagree on the postings schema.")
    else:
        atomic_json(mpath, {"n_buckets": int(n_buckets),
                            "positions": bool(positions)})

    def _postings(batch: pa.Table) -> pa.Table:
        # doc-length rows for EVERY doc (empty ones too — they count in
        # N and must be resolvable by index_delete), routed to the
        # reserved bucket n_buckets that no term can hash to
        import pandas as pd

        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = batch.column(text_col).to_pylist()
        tok_lists = [(t or "").split() for t in texts]
        lens = np.fromiter((len(tl) for tl in tok_lists),
                           dtype=np.int64, count=len(tok_lists))
        doclen = pa.table({
            "bucket": pa.array(np.full(len(ids), n_buckets, np.int64)),
            "term": pa.array([None] * len(ids), pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "tf": pa.array(np.zeros(len(ids), np.int64)),
            "dl": pa.array(lens, pa.int64()),
            "positions": pa.array([[]] * len(ids),
                                  pa.list_(pa.int64())),
            # source increment: constant per file (RLE ~free) but it
            # SURVIVES compaction folds, which file names don't —
            # index_delete splits its stats deltas by it so as_of
            # probes subtract only deletes of docs inside the horizon
            "_inc": pa.array(np.full(len(ids), inc_id, np.int64))})
        flat = [w for tl in tok_lists for w in tl]
        if not flat:
            return doclen.drop_columns(["positions"]) \
                if not positions else doclen
        # positional postings (the term_tf_rows factorize kernel plus a
        # per-(doc, term) position list for phrase queries): one stable
        # sort by (doc, term-code) groups each posting's token slots
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        offs = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            np.cumsum(lens[:-1], out=offs[1:])
        pos = np.arange(len(flat), dtype=np.int64) - offs[doc_idx]
        key = doc_idx * np.int64(len(uniques)) + codes
        order = np.argsort(key, kind="stable")
        uk, counts = np.unique(key, return_counts=True)
        list_offs = np.zeros(len(uk) + 1, dtype=np.int64)
        np.cumsum(counts, out=list_offs[1:])
        pos_lists = pa.ListArray.from_arrays(
            pa.array(list_offs, pa.int32()),
            pa.array(pos[order], pa.int64()))
        post_doc = ids[(uk // len(uniques))]
        terms_arr = uniques[uk % len(uniques)]
        post = pa.table({
            "bucket": pa.array(_term_buckets(terms_arr.tolist(),
                                             n_buckets)),
            "term": pa.array(terms_arr, pa.string()),
            "doc_id": pa.array(post_doc.astype(np.int64), pa.int64()),
            "tf": pa.array(counts.astype(np.int64), pa.int64()),
            "dl": pa.array(lens[(uk // len(uniques))], pa.int64()),
            "positions": pos_lists,
            "_inc": pa.array(np.full(len(uk), inc_id, np.int64))})
        out = pa.concat_tables([post, doclen])
        return out.drop_columns(["positions"]) if not positions else out

    def _one_bucket(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        b = int(g.column("bucket")[0].as_py())
        bdir = os.path.join(store_dir, f"term={b}")
        os.makedirs(bdir, exist_ok=True)
        out = g.drop_columns(["bucket"]).sort_by("term")
        atomic_write(os.path.join(bdir, f"inc{inc_id}.parquet"),
                     lambda p: pq.write_table(out, p))
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "n_rows": pa.array([g.num_rows], pa.int64())})

    stats = (docs_ds
             .map_batches(_postings, batch_format="pyarrow",
                          batch_size=None)
             .groupby("bucket")
             .map_groups(_one_bucket, batch_format="pyarrow")
             .to_pandas())
    dlpath = os.path.join(store_dir, f"term={n_buckets}",
                          f"inc{inc_id}.parquet")
    if os.path.exists(dlpath):
        dl = pq.read_table(dlpath, columns=["dl"]).column("dl")
        n_docs, n_tokens = len(dl), int(pc.sum(dl).as_py() or 0)
    else:                                   # empty increment
        n_docs = n_tokens = 0
    # marker LAST (store_fold contract): carries the increment's corpus
    # stats so probes read metadata, never a doc-length scan
    atomic_json(os.path.join(store_dir, f"_done_inc{inc_id}.json"),
                {"n_docs": n_docs, "n_tokens": n_tokens,
                 "buckets": int(len(stats))})
    return pa.Table.from_pandas(stats, preserve_index=False)


def corpus_stats(store_dir: str,
                 as_of: int | None = None) -> tuple[int, int]:
    """(N docs, total tokens) across every marker-complete increment —
    markers survive compaction, so this is exact at any point.
    ``as_of`` restricts to increments <= that horizon."""
    n_docs = n_tokens = 0
    for f in glob.glob(os.path.join(store_dir, "_done_inc*.json")):
        inc = int(os.path.basename(f)[len("_done_inc"):-len(".json")])
        if as_of is not None and inc > as_of:
            continue
        with open(f) as fh:
            m = json.load(fh)
        n_docs += int(m["n_docs"])
        n_tokens += int(m["n_tokens"])
    return n_docs, n_tokens


def _check_as_of(store_dir: str, as_of: int | None) -> None:
    from .store_fold import check_as_of

    check_as_of(store_dir, as_of)


def _doclen_files(store_dir: str) -> list[str]:
    d = os.path.join(store_dir,
                     f"term={int(_load_meta(store_dir)['n_buckets'])}")
    return sorted(glob.glob(os.path.join(d, "inc*.parquet"))
                  + glob.glob(os.path.join(d, "compact*.parquet")))


def _delete_files(store_dir: str, exclude: int | None = None) -> list[str]:
    """Marker-COMPLETE tombstone files (a crash-window del file without
    its marker is invisible, exactly like an unmarked ingest)."""
    ddir = os.path.join(store_dir, "_deletes")
    out = []
    for f in glob.glob(os.path.join(ddir, "_done_del*.json")):
        did = int(os.path.basename(f)[len("_done_del"):-len(".json")])
        if exclude is not None and did == exclude:
            continue
        p = os.path.join(ddir, f"del{did}.parquet")
        if os.path.exists(p):
            out.append(p)
    return sorted(out)


def deleted_stats(store_dir: str,
                  as_of: int | None = None) -> tuple[int, int]:
    """(docs, tokens) removed by marker-complete deletes — exact deltas
    computed at delete time, so probes never rescan.  With ``as_of``,
    only the deltas of docs whose SOURCE increment is <= the horizon
    count (the marker's ``by_inc`` breakdown): a tombstoned doc
    ingested after the horizon was never in that snapshot."""
    n_docs = n_tokens = 0
    for f in glob.glob(os.path.join(store_dir, "_deletes",
                                    "_done_del*.json")):
        with open(f) as fh:
            m = json.load(fh)
        if as_of is None:
            n_docs += int(m["n_docs"])
            n_tokens += int(m["n_tokens"])
        else:
            for inc, (nd, nt) in m["by_inc"].items():
                if int(inc) <= as_of:
                    n_docs += int(nd)
                    n_tokens += int(nt)
    return n_docs, n_tokens


def index_delete(store_dir: str, doc_ids, del_id: int) -> dict:
    """Tombstone a batch of doc_ids (right-to-be-forgotten).  Resolves
    the batch against the doc-length partition — never-ingested ids and
    already-tombstoned ids are dropped, so the (n_docs, n_tokens) stats
    delta can never double-count no matter how often an id is
    submitted.  Logical effect is immediate (probes anti-join the
    tombstones and correct N/avgdl/df from the deltas); the physical
    purge rides the next :func:`compact_text_index`.

    Idempotence: deterministic ``del<id>.parquet`` name written tmp ->
    rename, marker LAST; a crash-recovery rerun recomputes the same
    delta because prior-delete resolution excludes ``del_id`` itself
    and the doc-length rows it resolves against still exist — the
    purge can never have consumed an UNMARKED tombstone
    (:func:`compact_text_index` folds marker-complete deletes only),
    so the rerun window always sees them.
    The resolved id list is collected on the driver — bounded by the
    delete-batch size, which the CALLER controls (split a mass purge
    into several del_ids).  Single-writer, like the other stores."""
    import ray.data

    from .join import anti_join, semi_join

    if not isinstance(doc_ids, ray.data.Dataset):
        doc_ids = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(sorted(set(int(i) for i in doc_ids)),
                               pa.int64())}))
    dl_files = _doclen_files(store_dir)
    ddir = os.path.join(store_dir, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "dl": pa.array([], pa.int64()),
                      "_inc": pa.array([], pa.int64())})
    if dl_files:
        cand = semi_join(
            ray.data.read_parquet(dl_files,
                                  columns=["doc_id", "dl", "_inc"]),
            doc_ids, on="doc_id")
        prior = _delete_files(store_dir, exclude=del_id)
        if prior:
            cand = anti_join(cand,
                             ray.data.read_parquet(prior,
                                                   columns=["doc_id"]),
                             on="doc_id")
        kept = [t for t in ray.get(cand.to_arrow_refs())
                if t.num_columns > 0]
        eff = pa.concat_tables(kept) if kept else empty
    else:
        eff = empty
    n_docs = eff.num_rows
    n_tokens = int(pc.sum(eff.column("dl")).as_py() or 0)
    # per-source-increment delta breakdown: as_of probes subtract only
    # the deletes of docs INSIDE their horizon (deleted_stats)
    by_inc = {}
    if n_docs:
        grouped = (eff.select(["_inc", "dl"]).append_column(
            "n", pa.array(np.ones(n_docs, np.int64)))
            .group_by("_inc").aggregate([("n", "sum"), ("dl", "sum")]))
        by_inc = {str(int(i)): [int(n), int(d)] for i, n, d in zip(
            grouped.column("_inc").to_pylist(),
            grouped.column("n_sum").to_pylist(),
            grouped.column("dl_sum").to_pylist())}
    out = eff.select(["doc_id"]).sort_by("doc_id")
    atomic_write(os.path.join(ddir, f"del{del_id}.parquet"),
                 lambda p: pq.write_table(out, p))
    atomic_json(os.path.join(ddir, f"_done_del{del_id}.json"),
                {"n_docs": n_docs, "n_tokens": n_tokens,
                 "by_inc": by_inc})
    return {"requested": doc_ids.count(), "deleted": n_docs,
            "tokens": n_tokens}


def probe_files(store_dir: str, terms,
                as_of: int | None = None) -> list[str]:
    """A query's read set: every increment + compact file of the query
    terms' hash buckets ONLY (factored out so the pruning contract is
    directly testable, the ann_store pattern).  ``as_of`` drops inc
    files above the horizon (compact files are always included — the
    caller has already refused an as_of below the watermark, and every
    fold's upto is <= the watermark)."""
    n_buckets = int(_load_meta(store_dir)["n_buckets"])
    out = []
    for b in sorted(set(_term_buckets(list(terms), n_buckets).tolist())):
        bdir = os.path.join(store_dir, f"term={b}")
        from .store_fold import filter_inc_files

        incs = filter_inc_files(
            glob.glob(os.path.join(bdir, "inc*.parquet")), as_of)
        out.extend(sorted(incs + glob.glob(os.path.join(
            bdir, "compact*.parquet"))))
    return out


def _pruned_postings(store_dir: str, terms, columns,
                     as_of: int | None = None):
    """Shared probe front end: pruned read of the query terms' buckets
    (inc files cut at ``as_of``), is_in term filter, tombstone
    anti-join (ALL tombstones, regardless of as_of — a forgotten doc
    is not resurrectable by time travel).  Returns a Dataset or None
    when nothing can match."""
    import ray.data

    _check_as_of(store_dir, as_of)
    files = probe_files(store_dir, terms, as_of=as_of)
    if not files:
        return None
    term_arr = pa.array(sorted(set(terms)), pa.string())
    postings = (ray.data
                .read_parquet(files, columns=columns)
                .map_batches(
                    lambda t: t.filter(pc.is_in(t.column("term"),
                                                value_set=term_arr)),
                    batch_format="pyarrow", batch_size=None))
    del_files = _delete_files(store_dir)
    if del_files:
        # logical delete mask: tombstoned docs leave df, scores and the
        # candidate set immediately (broadcast/hash-tiered anti-join);
        # physically purged ids make this a no-op, which is fine
        from .join import anti_join

        postings = anti_join(
            postings,
            ray.data.read_parquet(del_files, columns=["doc_id"]),
            on="doc_id")
    return postings


def index_query_bm25(store_dir: str, terms, k1: float = 1.2,
                     b: float = 0.75, round_to: int | None = 6,
                     k: int | None = None, as_of: int | None = None):
    """Okapi BM25 over the accumulated store for a bag-of-words query:
    open ONLY the query terms' buckets, df-reduce the pruned postings
    (bounded by |terms|), broadcast {term -> idf}, score per posting
    row and sum per doc.  Returns Dataset[(doc_id, bm25)] over docs
    containing >= 1 query term (zero-tf terms contribute exactly 0.0,
    so absent docs are exactly the score-0 ones); ``k`` adds a
    descending top-k cut (ties broken by doc_id asc).

    ``as_of`` = snapshot read at an ingest horizon: only increments <=
    as_of are scanned and N/avgdl/df come from that horizon's markers
    (refused below the compaction watermark — folded snapshots no
    longer exist).  Tombstones still apply in full: right-to-be-
    forgotten wins over time travel, and the per-increment deltas the
    delete markers carry keep the stats exact (a tombstoned doc
    ingested AFTER the horizon subtracts nothing)."""
    import ray
    import ray.data

    terms = list(terms)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "bm25": pa.array([], pa.float64())})
    n_docs, n_tokens = corpus_stats(store_dir, as_of=as_of)
    n_del, tok_del = deleted_stats(store_dir, as_of=as_of)
    n_docs, n_tokens = n_docs - n_del, n_tokens - tok_del
    postings = _pruned_postings(store_dir, terms,
                                ["term", "doc_id", "tf", "dl"],
                                as_of=as_of)
    if postings is None or n_docs <= 0:
        return ray.data.from_arrow(empty)
    avgdl = float(n_tokens) / float(n_docs)

    # df reduce: one tiny partial per block (append-only contract means
    # one posting row per (term, doc) store-wide, so df = row count)
    def _df_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(t.column("term").to_pylist(),
                                    dtype=object), return_counts=True)
        return pa.table({"term": pa.array(u.astype(str)),
                         "df": pa.array(c.astype(np.int64))})

    # schemaless zero-column blocks appear when the is_in filter empties
    # a block (dedup.py:78 pattern) — drop them before the concat
    kept = [t for t in ray.get(
                postings.map_batches(_df_partial, batch_format="pyarrow",
                                     batch_size=None).to_arrow_refs())
            if t.num_columns > 0]
    if not kept:           # no query term occurs anywhere in the store
        return ray.data.from_arrow(empty)
    parts = pa.concat_tables(kept)
    merged = parts.group_by("term").aggregate([("df", "sum")])
    dfs = dict(zip(merged.column("term").to_pylist(),
                   merged.column("df_sum").to_pylist()))
    idf = {t: math.log(((n_docs - dfs.get(t, 0)) + 0.5)
                       / (dfs.get(t, 0) + 0.5) + 1.0) for t in terms}
    ref = ray.put(idf)

    def _contrib(t: pa.Table) -> pa.Table:
        w_map = ray.get(ref)
        w = np.fromiter((w_map[x] for x in t.column("term").to_pylist()),
                        dtype=np.float64, count=t.num_rows)
        tf = t.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # the exact per-term expression of text.bm25_scores._score
        denom_base = k1 * ((1.0 - b) + (b * dl) / avgdl)
        part = w * ((tf * (k1 + 1)) / (tf + denom_base))
        # block-local combine before the shuffle (aggregate.py shape):
        # the exchange carries one row per (block, doc), not per posting
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, part)
        return pa.table({"doc_id": pa.array(uniq.astype(np.int64),
                                            pa.int64()),
                         "part": pa.array(acc, pa.float64())})

    from ray.data.aggregate import Sum

    scored = (postings
              .map_batches(_contrib, batch_format="pyarrow",
                           batch_size=None)
              .groupby("doc_id")
              .aggregate(Sum("part", alias_name="part")))

    def _finish(t: pa.Table) -> pa.Table:
        s = t.column("part").to_numpy(zero_copy_only=False)
        if round_to is not None:
            s = np.round(s, round_to)
        return pa.table({"doc_id": t.column("doc_id"),
                         "bm25": pa.array(s, pa.float64())})

    out = scored.map_batches(_finish, batch_format="pyarrow",
                             batch_size=None)
    if k is not None:
        out = out.sort(["bm25", "doc_id"],
                       descending=[True, False]).limit(k)
    return out


def index_match_docs(store_dir: str, terms, as_of: int | None = None):
    """Boolean AND retrieval over the store: doc_ids containing EVERY
    query term.  Same pruned read as the BM25 probe (only the query
    terms' buckets open, tombstones masked, same ``as_of`` snapshot
    semantics); a doc qualifies when its distinct-term posting count
    equals |terms| — postings are unique per (term, doc) store-wide
    (append-only contract), so a per-doc row count after the term
    filter is the distinct-term count.  Returns Dataset[(doc_id,)]."""
    import ray
    import ray.data

    terms = sorted(set(terms))
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    postings = _pruned_postings(store_dir, terms, ["term", "doc_id"],
                                as_of=as_of)
    if postings is None:
        return ray.data.from_arrow(empty)

    def _hits(t: pa.Table) -> pa.Table:
        # block-local combine (the BM25 _contrib shape)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(doc, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq.astype(np.int64),
                                            pa.int64()),
                         "hits": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum

    need = len(terms)
    counted = (postings
               .map_batches(_hits, batch_format="pyarrow",
                            batch_size=None)
               .groupby("doc_id")
               .aggregate(Sum("hits", alias_name="hits")))

    def _all_terms(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("hits"),
                                 need)).select(["doc_id"])

    return counted.map_batches(_all_terms, batch_format="pyarrow",
                               batch_size=None)


def index_phrase_docs(store_dir: str, phrase, as_of: int | None = None):
    """Exact phrase retrieval over the store: doc_ids containing the
    consecutive token sequence ``phrase``.  Positional postings make
    this pruned like every other probe (only the phrase terms' buckets
    open, tombstones masked, same ``as_of`` snapshot semantics).

    Vectorized slot-shift shape — no per-doc Python verification: slot
    ``i`` explodes term_i's position lists (Arrow ``list_flatten`` +
    ``list_parent_indices``) and emits (doc_id, p = pos - i); a phrase
    instance starting at p contributes one row from EVERY slot, so a
    (doc, p) group with exactly |phrase| rows is a hit (positions are
    unique per (term, doc), so no slot can double-emit — repeated
    phrase words are separate slots and still count once each; a
    (doc, p) short of slot 0 can never reach |phrase| rows, so
    negative/stale starts die in the HAVING).  The exchange volume is
    the phrase terms' total position count — term-frequency-bounded,
    like the BM25 probe.  Returns Dataset[(doc_id,)]."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    phrase = list(phrase)
    k = len(phrase)
    if not _load_meta(store_dir).get("positions", True):
        raise ValueError(
            "this store was ingested with positions=False (35% smaller "
            "postings); phrase retrieval needs position lists — rebuild "
            "the store with positions=True.")
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    postings = _pruned_postings(store_dir, set(phrase),
                                ["term", "doc_id", "positions"],
                                as_of=as_of)
    if postings is None or k == 0:
        return ray.data.from_arrow(empty)

    def _slots(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        terms = t.column("term").to_pylist()
        docs_out, p_out = [], []
        for i, ti in enumerate(phrase):
            mask = pa.array([x == ti for x in terms])
            sub = t.filter(mask)
            if sub.num_rows == 0:
                continue
            plist = sub.column("positions").combine_chunks()
            flat = pc.list_flatten(plist).to_numpy(zero_copy_only=False)
            parent = pc.list_parent_indices(plist) \
                .to_numpy(zero_copy_only=False)
            doc = sub.column("doc_id").to_numpy(zero_copy_only=False)
            docs_out.append(doc[parent])
            p_out.append(flat - i)
        if not docs_out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(docs_out).astype(np.int64),
                               pa.int64()),
            "p": pa.array(np.concatenate(p_out), pa.int64())})

    starts = (postings
              .map_batches(_slots, batch_format="pyarrow",
                           batch_size=None)
              .groupby(["doc_id", "p"])
              .aggregate(Count(alias_name="n")))

    def _hits(t: pa.Table) -> pa.Table:
        return (t.filter(pc.equal(t.column("n"), k))
                .select(["doc_id"]))

    # distinct doc_ids (a doc may hold several phrase instances)
    return (starts
            .map_batches(_hits, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Count(alias_name="_c"))
            .map_batches(lambda t: t.select(["doc_id"]),
                         batch_format="pyarrow", batch_size=None))


def compact_text_index(store_dir: str, purge_deletes: bool = True) -> dict:
    """Bound the per-bucket file count — the shared marker-gated fold
    over the ``term=`` dirs (the doc-length partition folds with them);
    duplicate postings from a crash window double a doc's contribution
    for the affected terms until the next compaction folds them away
    (bounded staleness, same trade as the other stores).

    With ``purge_deletes`` (default), tombstoned doc_ids are dropped
    from every rewritten file — the PHYSICAL right-to-be-forgotten
    purge, free because compaction rewrites every surviving row anyway.
    Each partition task re-reads the tombstone files (deletes are
    assumed small vs the corpus; a mass-purge regime would partition
    the tombstones by bucket the same way).  Tombstone files + deltas
    are retained: the ingest markers still count the deleted docs, so
    the deltas must keep correcting probe-time stats forever."""
    drop_fn = None
    if purge_deletes:
        del_files = _delete_files(store_dir)
        if del_files:
            def drop_fn(tbl: pa.Table) -> pa.Table:
                ids = pa.concat_tables(
                    [pq.read_table(f, columns=["doc_id"])
                     for f in del_files]).column("doc_id").combine_chunks()
                return tbl.filter(
                    pc.invert(pc.is_in(tbl.column("doc_id"),
                                       value_set=ids)))
    return fold_marker_complete(store_dir, "term=*", drop_fn=drop_fn)

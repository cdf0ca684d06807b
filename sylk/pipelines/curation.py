"""End-to-end corpus curation — the training-data counterpart of the
flagship syslog pipeline.

Composes the engine's curation operators into the sequence a real
100-TB pre-training corpus goes through before tokenization:

    exact dedup (content hash)                 -- dedup.exact_dedup
      -> near-dup clustering, keep reps        -- ngram pairs + components
      -> repetition / length quality filter    -- curate kernels
      -> eval-set decontamination              -- curate.decontaminate
      -> kept doc ids

Every stage is a Dataset->Dataset transform (hash-partitioned joins on
doc_id, per-block kernels for the text work), so the composition
streams end-to-end; nothing materializes the corpus on the driver.  The
whole pipeline has a single-statement SQL oracle
(queries.py `curated_corpus`), which is the point: even the composed
curation flow stays exactly verifiable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _quality_filter_batch(batch: pa.Table, min_tokens: int,
                          max_dup_frac: float) -> pa.Table:
    """Keep docs with >= min_tokens whitespace tokens AND a duplicate
    word-2-gram fraction <= max_dup_frac (Gopher-style repetition
    gate).  Row-aligned with the input block."""
    from ..stages.curate import repetition_scores_batch

    sc = repetition_scores_batch(batch)
    frac = sc.column("dup_2gram_frac").to_numpy()
    texts = batch.column("text").to_pylist()
    ntok = np.fromiter((len((t or "").split()) for t in texts),
                       dtype=np.int64, count=len(texts))
    mask = (ntok >= min_tokens) & (frac <= max_dup_frac)
    return batch.filter(pa.array(mask))


def curate_corpus(docs_ds, bench_ds, *, jaccard_threshold: float = 0.6,
                  min_tokens: int = 20, max_dup_frac: float = 0.05,
                  decon_k: int = 8):
    """Run the full curation sequence; returns a Dataset with the kept
    ``doc_id`` rows.  ``bench_ds`` is the eval set to decontaminate
    against (its own docs are excluded from the output too)."""
    from ..stages.curate import decontaminate
    from ..stages.dedup import (connected_components, exact_dedup,
                                ngram_jaccard_dup_pairs)
    from ..stages.join import anti_join, semi_join

    # 1. exact dedup: one representative per content hash
    d1 = exact_dedup(docs_ds).select_columns(["doc_id", "text"])

    # 2. near-dup clusters -> keep the smallest doc_id per component
    pairs = ngram_jaccard_dup_pairs(d1, threshold=jaccard_threshold)
    nodes = d1.select_columns(["doc_id"])
    clustered = connected_components(nodes, pairs, node_col="doc_id")

    def _reps(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b.column("doc_id"),
                                 b.column("cluster_id"))) \
                .select(["doc_id"])

    reps = clustered.map_batches(_reps, batch_format="pyarrow")
    d2 = semi_join(d1, reps, on="doc_id")

    # 3. repetition / length quality gate (pure per-block map)
    d3 = d2.map_batches(
        lambda b: _quality_filter_batch(b, min_tokens, max_dup_frac),
        batch_format="pyarrow")

    # 4. decontamination: drop the eval docs themselves, then every doc
    #    sharing a word k-gram with the eval set
    d3_clean = anti_join(d3, bench_ds.select_columns(["doc_id"]),
                         on="doc_id")
    hits = decontaminate(d3_clean, bench_ds, k=decon_k)
    kept = anti_join(d3_clean.select_columns(["doc_id"]), hits,
                     on="doc_id")
    return kept

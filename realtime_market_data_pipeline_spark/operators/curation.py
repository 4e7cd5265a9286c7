"""End-to-end training-data curation pipeline: the composition a user of the
reference would run to turn a raw document corpus into model-ready chunks.

quality gate → exact dedup → near-dup removal (minhash-LSH + Jaccard verify)
→ fixed-token chunking → deterministic train/eval split — every stage one of
the already-oracle-checked operators, composed as pure DataFrame -> DataFrame
functions, so the whole pipeline is one lazy Catalyst plan.

Shuffle budget at 100 TB (the reason the stages are ordered this way):
quality gate is shuffle-free (per-row expressions) and prunes first; exact
dedup shuffles 16-byte md5 keys, not text; the minhash stages reuse one
doc_id partitioning (see operators/dedup.py); chunking is row-expanding but
shuffle-free, so it runs AFTER every pruning stage; the split is a pure
per-row hash. Result: three keyed exchanges end-to-end regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.dedup import (
    exact_dedup_keepers,
    jaccard_from_sets,
    lsh_candidate_pairs,
    minhash_sig_sets,
)
from realtime_market_data_pipeline_spark.operators.text import (
    chunk_documents,
    quality_score,
    with_split_assignment,
)


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    chunk_tokens: int = 100,
    stride: int | None = None,
    train_pct: int = 90,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Curate (doc_id, text) into chunk rows
    (doc_id, chunk_idx, chunk_text, n_chunk_tokens, bucket, split).

    Keeper policy is lowest-doc_id at every dedup stage: exact duplicates
    keep the min id per text-md5 group; near-duplicate pairs (Jaccard ≥
    threshold after LSH candidate generation) drop the higher id. A doc can
    only be dropped in favor of a surviving lower id, so the output is
    deterministic and order-insensitive."""
    # 1. quality gate as a per-row filter expression — no score table, no
    # join-back, zero shuffles; prune before anything keyed
    kept = docs.filter(quality_score() >= min_quality)

    # 2. exact dedup: one row per distinct text, min id wins
    keepers = exact_dedup_keepers(kept).select(
        F.col("keeper_id").alias("doc_id")
    )
    exact_kept = kept.join(keepers, "doc_id")

    # 3. near-dup removal: LSH candidates → exact Jaccard → drop higher ids.
    # Signature and shingle set come from ONE aggregate (minhash_sig_sets);
    # the banding branch and both Jaccard join sides hang off the identical
    # subplan, so ReuseExchange computes the shingle scan once per job.
    sigsets = minhash_sig_sets(exact_kept, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(
        sigsets, num_hashes=num_hashes, band_size=band_size
    )
    near_dup_ids = (
        jaccard_from_sets(sigsets, cand)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    near_kept = exact_kept.join(near_dup_ids, "doc_id", "left_anti")

    # 4. chunk (row-expanding, shuffle-free — after all pruning)
    chunks = chunk_documents(near_kept, chunk_tokens=chunk_tokens, stride=stride)

    # 5. deterministic hash split (pure per-row function of doc_id)
    return with_split_assignment(chunks, train_pct=train_pct)

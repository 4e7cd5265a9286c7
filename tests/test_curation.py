"""Invariant tests for the end-to-end curation pipeline (rows-only query —
these assertions are its correctness contract; each constituent stage is
separately oracle-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark import queries as Q
from realtime_market_data_pipeline_spark.operators.curation import curate_documents
from tests.conftest import SF_SMALL


def test_curation_pipeline_invariants(spark):
    docs = Q._neardup_corpus(spark, SF_SMALL).cache()
    n_docs = docs.count()
    out = curate_documents(docs).cache()

    kept_ids = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    planted = {r.doc_id for r in docs.filter(F.col("doc_id") >= 100000).collect()}
    originals = {r.doc_id for r in docs.filter(F.col("doc_id") < 100000).collect()}

    # near-dup removal drops the planted truncated copies (LSH recall at
    # jaccard≈0.8 with 16 hashes / 4 bands is ~0.88 — require most, not all)
    planted_kept = kept_ids & planted
    assert len(planted_kept) <= len(planted) * 0.3, (
        f"{len(planted_kept)}/{len(planted)} planted dups survived"
    )
    # keeper policy prefers lower ids, and planted copies always carry the
    # higher id — so a planted copy can never displace its original: every
    # original that passes the quality gate and has no lower-id near-dup
    # twin among the originals is retained. Weak-form check: the minimum
    # quality-passing id survives (nothing can outrank it).
    quality_ids = {
        r.doc_id
        for r in Q.tx.with_quality_scores(docs)
        .filter(F.col("quality_score") >= 0.3)
        .select("doc_id")
        .collect()
    }
    assert min(quality_ids) in kept_ids
    # exact-dedup contract: every kept doc has a distinct text
    kept_docs = docs.join(
        out.select("doc_id").distinct(), "doc_id"
    )
    assert (
        kept_docs.select("text").distinct().count() == len(kept_ids)
    )

    # chunk shape: bounded size, contiguous indices from 0 per doc
    assert out.filter(F.col("n_chunk_tokens") > 100).count() == 0
    per_doc = out.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"), F.countDistinct("chunk_idx").alias("n")
    )
    assert per_doc.filter(F.col("lo") != 0).count() == 0

    # split: pure function of doc_id (one split per doc), roughly 90/10
    assert out.groupBy("doc_id").agg(
        F.countDistinct("split").alias("k")
    ).filter(F.col("k") > 1).count() == 0
    frac_train = (
        out.select("doc_id", "split").distinct().filter(F.col("split") == "train").count()
        / len(kept_ids)
    )
    assert 0.8 < frac_train < 0.97, frac_train

    # deterministic: a second run produces the identical row set
    again = curate_documents(docs)
    assert again.exceptAll(out).count() == 0 and out.exceptAll(again).count() == 0
    assert n_docs > 0

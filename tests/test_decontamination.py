"""Invariant tests for benchmark decontamination (the oracle-checked query
`decontamination_8gram` pins exact values; these pin the semantics on a
hand-built corpus where contamination is known by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.text import (
    decontaminate_against_eval,
    split_bucket,
    with_split_assignment,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_contamination_detected(spark):
    # find one id per split so the planted overlap is guaranteed cross-split
    ids = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), split_bucket().alias("b")
    )
    eval_id = ids.filter(F.col("b") >= 204).head()[0]
    train_id = ids.filter(F.col("b") < 204).head()[0]
    clean_id = ids.filter((F.col("b") < 204) & (F.col("doc_id") != train_id)).head()[0]

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    docs = _corpus(
        spark,
        [
            (eval_id, f"eval prefix {shared} eval suffix"),
            (train_id, f"train lead-in {shared} and a tail"),
            (clean_id, "totally different words with no overlap at all here ok"),
        ],
    )
    out = {r.doc_id: r for r in decontaminate_against_eval(docs).collect()}
    # only train-split docs appear
    assert set(out) == {train_id, clean_id}
    assert out[train_id].contaminated and out[train_id].n_shared_ngrams == 1
    assert not out[clean_id].contaminated and out[clean_id].n_shared_ngrams == 0


def test_short_docs_and_counts_are_distinct_ngrams(spark):
    ids = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), split_bucket().alias("b")
    )
    eval_id = ids.filter(F.col("b") >= 204).head()[0]
    t_ids = [r.doc_id for r in ids.filter(F.col("b") < 204).head(2)]

    nine = "a b c d e f g h i"  # 9 tokens -> two 8-grams
    docs = _corpus(
        spark,
        [
            (eval_id, nine),
            # repeats the same window twice -> shared 8-grams still distinct
            (t_ids[0], f"{nine} {nine}"),
            (t_ids[1], "too short for any eight gram"),  # < 8 tokens
        ],
    )
    out = {r.doc_id: r for r in decontaminate_against_eval(docs).collect()}
    # doc 0 shares exactly the distinct 8-grams of the doubled window (the
    # doubling adds new cross-boundary 8-grams but they don't exist in eval;
    # the two of `nine` plus boundary ones that match... only 8-grams also in
    # eval count: eval has exactly 2)
    assert out[t_ids[0]].n_shared_ngrams == 2
    # sub-k docs are still reported, uncontaminated
    assert out[t_ids[1]].n_shared_ngrams == 0 and not out[t_ids[1]].contaminated


def test_split_agreement_with_split_assignment(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.lit("one two three four five six seven eight nine ten").alias("text"),
    )
    out_ids = {r.doc_id for r in decontaminate_against_eval(docs).collect()}
    train_ids = {
        r.doc_id
        for r in with_split_assignment(docs, train_pct=80)
        .filter(F.col("split") == "train")
        .collect()
    }
    assert out_ids == train_ids


def test_fuzzy_decontamination_flags_near_copies_not_verbatim_only(spark):
    """late r11: the fuzzy sweep flags train docs that are NEAR
    duplicates of eval items — a truncated benchmark copy (which shares
    most but not all 8-grams) and a verbatim copy both flag; an
    unrelated doc stays clean; n_similar_eval counts the matching eval
    docs and max_jaccard is the exact verified value."""
    from realtime_market_data_pipeline_spark.operators import dedup as dd

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen")
    eval_df = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    prefix = " ".join(base.split()[:14])  # 14/18-token truncated copy
    train = spark.createDataFrame(
        [
            (10, base),        # verbatim copy of eval 1
            (11, prefix),      # near copy (J ~= 12/16 = 0.75 on 3-shingles)
            (12, "totally different words about ships sailing the sea "
                 "with wind and salt and gulls overhead at dusk"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dd.decontaminate_fuzzy(train, eval_df, threshold=0.5)
        .collect()
    }
    assert out[10].contaminated and out[10].max_jaccard == 1.0
    assert out[10].n_similar_eval == 1
    assert out[11].contaminated and 0.5 <= out[11].max_jaccard < 1.0
    assert not out[12].contaminated and out[12].n_similar_eval == 0
    assert out[12].max_jaccard is None
    # exact check of the near copy's Jaccard: distinct 3-shingles
    sh = lambda s: {tuple(s.split()[i:i+3]) for i in range(len(s.split())-2)}
    a, b = sh(prefix), sh(base)
    want = round(len(a & b) / len(a | b), 6)
    assert abs(out[11].max_jaccard - want) < 1e-9

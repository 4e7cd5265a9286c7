"""Hand-computed checks for the bigram-LM quality scorer (the oracle query
`doc_lm_scores` pins full-corpus values; these pin the smoothing math on a
corpus small enough to verify by hand)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.text import (
    bigram_lm_scores,
    split_bucket,
)


def _split_ids(spark, n=400):
    ids = spark.range(0, n).select(F.col("id").alias("doc_id"), split_bucket().alias("b"))
    train = [r.doc_id for r in ids.filter(F.col("b") < 204).head(2)]
    eval_ = ids.filter(F.col("b") >= 204).head()[0]
    return train, eval_


def test_smoothed_probabilities_by_hand(spark):
    (t0, t1), ev = _split_ids(spark)
    # train corpus: one doc "a b a b" -> bigrams: (a b) x2, (b a) x1
    # vocab {a, b} -> V=2; heads: c(a·)=2, c(b·)=1
    docs = spark.createDataFrame(
        [(t0, "a b a b"), (ev, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    # train doc: P(b|a)=(2+1)/(2+2)=0.75 twice, P(a|b)=(1+1)/(1+2)=2/3
    exp = -(2 * round(math.log(0.75), 9) + round(math.log(2 / 3), 9)) / 3
    assert out[t0].n_bigrams == 3
    assert out[t0].known_bigram_ratio == 1.0
    assert abs(out[t0].avg_neg_logp - exp) < 1e-6
    # eval doc scored against the SAME train-fitted LM:
    # (a b): (2+1)/(2+2); (b c) unseen: (0+1)/(1+2)
    exp_ev = -(round(math.log(0.75), 9) + round(math.log(1 / 3), 9)) / 2
    assert out[ev].n_bigrams == 2
    assert out[ev].known_bigram_ratio == 0.5
    assert abs(out[ev].avg_neg_logp - exp_ev) < 1e-6


def test_oov_head_uses_vocab_only_denominator(spark):
    (t0, t1), _ = _split_ids(spark)
    docs = spark.createDataFrame(
        [(t0, "x y"), (t1, "q z")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    # both docs in train; vocab {x,y,q,z} V=4; heads c(x·)=1, c(q·)=1
    # doc t0: bigram (x y) seen once -> (1+1)/(1+4)
    exp = -round(math.log(2 / 5), 9)
    assert abs(out[t0].avg_neg_logp - exp) < 1e-6 and out[t0].known_bigram_ratio == 1.0


def test_single_token_docs_yield_no_row(spark):
    (t0, t1), _ = _split_ids(spark)
    docs = spark.createDataFrame(
        [(t0, "lonely"), (t1, "two tokens")], "doc_id long, text string"
    )
    rows = bigram_lm_scores(docs).collect()
    assert {r.doc_id for r in rows} == {t1}

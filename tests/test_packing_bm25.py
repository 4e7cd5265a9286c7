"""Hand-computed checks for sequence packing and BM25 (oracle queries pin
full-corpus values; these pin the math on corpora small enough to verify by
hand)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.text import pack_documents
from realtime_market_data_pipeline_spark import queries as Q


def test_pack_documents_by_hand(spark):
    # four 100-token docs in one source: starts 0/100/200/300 -> seqs 0,0,0,1
    text = " ".join(["w"] * 100)
    docs = spark.createDataFrame(
        [(i, "s1", text) for i in range(4)] + [(9, "s2", "a b c")],
        "doc_id long, source string, text string",
    )
    out = {
        (r.source, r.seq_id): r for r in pack_documents(docs, ctx_tokens=256).collect()
    }
    assert out[("s1", 0)].n_docs == 3 and out[("s1", 0)].n_tokens == 300
    assert out[("s1", 1)].n_docs == 1 and out[("s1", 1)].n_tokens == 100
    assert out[("s2", 0)].n_docs == 1 and out[("s2", 0)].n_tokens == 3
    assert len(out) == 3


def test_pack_documents_order_is_by_doc_id(spark):
    # insertion order scrambled; offsets must follow doc_id order: doc 1
    # (5 tokens) starts at 0, doc 2 (300 tokens) starts at 5 -> seq 0,
    # doc 3 starts at 305 -> seq 1
    docs = spark.createDataFrame(
        [
            (3, "s", "x y"),
            (1, "s", "a b c d e"),
            (2, "s", " ".join(["t"] * 300)),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.seq_id: r for r in pack_documents(docs, ctx_tokens=256).collect()}
    assert out[0].n_docs == 2 and out[0].n_tokens == 305
    assert out[1].n_docs == 1 and out[1].n_tokens == 2


def test_bm25_single_term_by_hand(spark, tmp_path):
    # corpus: d0 has 'hash' twice in 4 tokens, d1 has it once in 2 tokens,
    # d2 none in 2 tokens. N=3, total=8, avgdl=8/3. df(hash)=2.
    docs = spark.createDataFrame(
        [
            (0, "hash a hash b"),
            (1, "hash c"),
            (2, "d e"),
        ],
        "doc_id long, text string",
    )
    p = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(p)

    out = {r.doc_id: r.bm25 for r in Q.QUERIES["bm25_top20"](spark, str(tmp_path)).collect()}

    def score(tf, dl, df, n=3, total=8):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return round(
            round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl * n / total))), 9), 6
        )

    assert set(out) == {0, 1}
    assert abs(out[0] - score(2, 4, 2)) < 1e-9
    assert abs(out[1] - score(1, 2, 2)) < 1e-9
    # more occurrences in a not-much-longer doc must rank higher
    assert out[0] > out[1]

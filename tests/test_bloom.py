"""Bloom-filter join pruning (operators/bloom.py, r8): membership math,
no-false-negatives contract, FPR sizing, and the plan properties that
make it a shuffle reducer at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark import queries as Q
from realtime_market_data_pipeline_spark.io import load_table
from realtime_market_data_pipeline_spark.operators import bloom
from realtime_market_data_pipeline_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_fpr(spark):
    """Every built key must pass (bloom contract — this is what makes
    prefilter+join ≡ join); disjoint keys pass at ≈FPR, pinned under 3%
    for the default sizing at this key count."""
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    bm = bloom.bloom_build(keys, "k")
    hits = keys.filter(
        bloom.bloom_might_contain(bm, F.col("k"), 1 << 17)
    ).count()
    assert hits == 2000  # no false negatives, ever
    others = spark.range(100_000, 120_000).select(F.col("id").alias("k"))
    fp = others.filter(
        bloom.bloom_might_contain(bm, F.col("k"), 1 << 17)
    ).count()
    assert fp / 20_000 < 0.03, f"FPR {fp / 20_000:.4f} above sizing bound"


def test_bloom_bitmap_signed_longs_roundtrip(spark):
    """Bit 63 of a word maps to a NEGATIVE python long (signed packing) —
    it must still round-trip through the Spark long-array literal and
    test positive. Build keys until some word has bit 63 set, then
    verify membership of the full key set."""
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    m = 1 << 10  # small bitmap: 16 words, dense -> bit 63 certainly set
    bm = bloom.bloom_build(keys, "k", m_bits=m, k=3)
    assert any(w < 0 for w in bm), "expected a signed-wrapped word"
    hits = keys.filter(
        bloom.bloom_might_contain(bm, F.col("k"), m, k=3)
    ).count()
    assert hits == 5000


def test_bloom_build_collects_only_set_bits(spark):
    """The driver receives distinct bit positions, never keys: the
    bitmap's popcount is bounded by min(k*n, m) and the build plan
    carries a distinct aggregate (server-side reduction)."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bm = bloom.bloom_build(keys, "k", m_bits=1 << 12, k=4)
    popcount = sum(bin(w & ((1 << 64) - 1)).count("1") for w in bm)
    assert 4 <= popcount <= 400


def test_bloom_prefilter_join_matches_plain_join(spark):
    """prefilter+join ≡ plain join, row for row (inner and semi); outer
    variants are rejected as unsound."""
    cust = (
        load_table(spark, SF, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"), "c_nationkey")
    )
    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    got = sorted(
        tuple(r)
        for r in bloom.bloom_prefilter_join(orders, cust, "custkey").collect()
    )
    want = sorted(tuple(r) for r in orders.join(cust, "custkey").collect())
    assert got == want
    with pytest.raises(ValueError, match="unsound"):
        bloom.bloom_prefilter_join(orders, cust, "custkey", how="left")


def test_bloom_predicate_composes_with_streaming(spark, tmp_path):
    """The membership test is a pure Column, so the same bloom prunes a
    STREAM against a static key set with zero extra machinery — the
    stream-static enrichment prefilter (drop non-matching events before
    the stream-static join or sink). Stream output must equal the batch
    filter of the same data."""
    d = str(tmp_path / "bloom_stream")
    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    bm = bloom.bloom_build(keys, "k", m_bits=1 << 12, k=4)
    rows = [(i,) for i in range(0, 200, 3)]
    spark.createDataFrame(rows, "k long").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    got: set[int] = set()

    def writer(batch_df, _bid):
        got.update(
            r["k"]
            for r in batch_df.filter(
                bloom.bloom_might_contain(bm, F.col("k"), 1 << 12, k=4)
            ).collect()
        )

    q = (
        spark.readStream.schema("k long")
        .parquet(d)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    batch = {
        r["k"]
        for r in spark.createDataFrame(rows, "k long")
        .filter(bloom.bloom_might_contain(bm, F.col("k"), 1 << 12, k=4))
        .collect()
    }
    assert got == batch
    assert {k for k, in rows if k < 50} <= got  # true members always pass


def test_decontamination_bloom_equals_broadcast_form(spark):
    """r8: the bloom-prefiltered decontamination is result-identical to
    the plain form (no false negatives + join re-verify), and its plan
    carries the bit probes in a Filter on the train side."""
    a = Q.QUERIES["decontamination_8gram"](spark, SF)
    b = Q.QUERIES["decontamination_bloom"](spark, SF)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    s = P.plan_string(b)
    assert "shiftright" in s and "Filter" in s


def test_bloom_query_plan_prefilters_before_exchange(spark):
    """The registered query's plan must evaluate the bloom bit tests in
    a Filter over the orders SCAN — below the join exchange — so at
    scale the shuffle only carries surviving rows; the bitmap rides as
    a plan literal (no extra exchange, no UDF)."""
    df = Q.QUERIES["bloom_prefilter_join"](spark, SF)
    s = P.plan_string(df)
    assert "shiftright" in s and "md5" in s, "bloom tests missing from plan"
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    # the bit tests must sit in a Filter node, and the prefilter adds no
    # exchange beyond the join + final agg
    assert "Filter" in s
    assert P.exchange_count(df) <= 3


def test_bloom_build_ignores_null_keys(spark):
    """r9 (advisor): NULL build keys hash to NULL positions and used to
    crash the int64 packing with NaN. They must be dropped — a null key
    never matches an inner/semi join — and the bitmap over the non-null
    keys must be identical to one built without the nulls present."""
    clean = spark.createDataFrame([(i,) for i in range(100)], "k long")
    dirty = clean.unionByName(
        spark.createDataFrame([(None,), (None,)], "k long")
    )
    bm_clean = bloom.bloom_build(clean, "k", m_bits=1 << 12, k=4)
    bm_dirty = bloom.bloom_build(dirty, "k", m_bits=1 << 12, k=4)
    assert bm_dirty == bm_clean


def test_bloom_prefilter_join_tolerates_null_keys_both_sides(spark):
    """r9 (advisor): null join keys on either side must neither crash
    the build nor change the result — prefilter+join stays ≡ plain join
    with nulls present (nulls never equi-match)."""
    probe = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (3, "d")], "k int, v string"
    )
    build = spark.createDataFrame(
        [(1, 10.0), (None, 20.0), (3, 30.0)], "k int, w double"
    )
    got = sorted(
        tuple(r)
        for r in bloom.bloom_prefilter_join(
            probe, build, "k", m_bits=1 << 12
        ).collect()
    )
    want = sorted(tuple(r) for r in probe.join(build, "k").collect())
    assert got == want and len(want) == 2


def test_bloom_autosize_scans_build_side_once(spark):
    """r9 (verdict #5): the auto-size path needs both a count() and the
    position explode over the distinct build keys; the distinct relation
    must be persisted across the two jobs (one scan of the build side)
    and released before the join returns."""
    # patch the runtime class: in pyspark 4 `pyspark.sql.DataFrame` is
    # the ABC and instances are classic.dataframe.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame

    persisted: list[DataFrame] = []
    orig = DataFrame.persist

    def spy(self, *a, **kw):
        persisted.append(self)
        return orig(self, *a, **kw)

    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    try:
        DataFrame.persist = spy
        out = bloom.bloom_prefilter_join(probe, build, "k")  # m_bits=None
        n = out.count()
    finally:
        DataFrame.persist = orig
    assert n == 500
    assert len(persisted) == 1, "distinct build keys must persist exactly once"
    lvl = persisted[0].storageLevel
    assert not (lvl.useMemory or lvl.useDisk), "build keys not released"

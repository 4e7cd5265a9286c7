"""Scale-pattern tests: salted joins/aggregates on skewed data, and bucketed
co-located joins (the zero-shuffle fact-fact join strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators import skew
from realtime_market_data_pipeline_spark.plans import inspect as P


def _skewed_events(spark, n=20_000, hot_fraction=0.9):
    """90% of rows share one hot key, the rest spread over 100 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 100).cast("long"))
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_events(spark)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    plain = fact.join(dim, ["k"]).groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = skew.salted_join(fact, dim, ["k"], num_salts=8).groupBy(
        "k", "label"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    fact = _skewed_events(spark, n=1000)
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("label"))
    plain = fact.join(dim, ["k"], "left")
    salted = skew.salted_join(fact, dim, ["k"], num_salts=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("label").isNull()).count()
        == salted.filter(F.col("label").isNull()).count()
    )


def test_salted_collect_set_equals_plain(spark):
    df = _skewed_events(spark, n=5000)
    plain = {
        r.k: set(r.vs)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("vs")).collect()
    }
    salted = {
        r.k: set(r.v_set)
        for r in skew.salted_collect_set(df, ["k"], "v", num_salts=8).collect()
    }
    assert plain == salted


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key makes the join exchange-free:
    each bucket pair joins in place — the strategy for repeated fact-fact
    joins at 100 TB (pay the shuffle once at write time)."""
    n = 10_000
    left = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("b")
    )
    try:
        left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_left")
        right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_right")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        assert P.exchange_count(joined) == 0, P.plan_string(joined, "simple")
        assert joined.count() == n
    finally:
        # managed tables: DROP removes the warehouse files too
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")

"""Tests for the pluggable gbm_ticks Python data source (PySpark 4
DataSource API): batch partitioning/determinism, streaming offset replay,
and compatibility with the engine's feature operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.features import compute_features
from realtime_market_data_pipeline_spark.sources.gbm_datasource import (
    register_gbm_source,
)


def _read(spark, **opts):
    register_gbm_source(spark)
    r = spark.read.format("gbm_ticks")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_partitions_per_symbol_and_determinism(spark):
    df = _read(spark, n_per_symbol=200, symbols="AAPL,MSFT,GOOG,TSLA")
    assert df.count() == 800
    assert df.rdd.getNumPartitions() == 4  # one generation task per symbol
    assert df.select("symbol").distinct().count() == 4
    assert df.filter(F.col("price") <= 0).count() == 0
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, n_per_symbol=200,
                                symbols="AAPL,MSFT,GOOG,TSLA").collect()))
    assert a == b


def test_batch_feeds_feature_operators(spark):
    # source-agnosticism: the same compute_features chain the parquet/Kafka
    # paths use runs unchanged on the pluggable source
    ticks = _read(spark, n_per_symbol=160, tps=48)
    feats = compute_features(ticks, window="10 seconds")
    rows = feats.collect()
    assert len(rows) > 0
    assert all(r.num_ticks > 0 and r.first_price > 0 for r in rows)


def test_stream_reader_emits_exactly_once(spark, tmp_path):
    register_gbm_source(spark)
    rows: list = []
    q = (
        spark.readStream.format("gbm_ticks")
        .option("ticks_per_batch", "40")
        .option("max_ticks", "80")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda d, b: rows.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_gbm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    # at least one 40-tick micro-batch across 3 symbols, no duplicate ticks
    assert len(rows) >= 120
    assert len({(r.symbol, r.event_time_ms) for r in rows}) == len(rows)


def test_stream_offset_replay_is_deterministic(spark):
    # read(start) must be a pure function of the offset: replaying the
    # initial offset yields the identical micro-batch (checkpoint recovery)
    from realtime_market_data_pipeline_spark.sources.gbm_datasource import (
        GbmStreamReader,
    )

    r1 = GbmStreamReader({"ticks_per_batch": "25"})
    r2 = GbmStreamReader({"ticks_per_batch": "25"})
    it1, end1 = r1.read(r1.initialOffset())
    it2, end2 = r2.read(r2.initialOffset())
    assert list(it1) == list(it2) and end1 == end2
    # and the NEXT batch continues the walk from the carried log-price
    it3, _ = r1.read(end1)
    batch2 = list(it3)
    assert batch2 and batch2[0][2] > 0  # event_time_ms advanced

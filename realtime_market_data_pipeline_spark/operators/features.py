"""The feature engine — windowed per-symbol market features.

Re-expresses the reference consumer's core computation
(/root/reference/src/consumer/spark_streaming.py:73-118) as pure
``DataFrame -> DataFrame`` operators that run identically over a batch
DataFrame or a Structured Streaming DataFrame (pass ``watermark=`` for
streaming).

Tick schema contract (FIXTURES.md §A):
    symbol string, price double, event_time timestamp, event_time_ms long

Scale notes (100 TB): the windowed groupBy is a single shuffle on
(window, symbol); Catalyst plans partial (map-side) aggregation before the
exchange, so per-executor state is bounded by distinct (window, symbol) keys,
not input rows. No Python UDFs anywhere — the whole plan stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from realtime_market_data_pipeline_spark.functions.core import (
    log_return,
    ms_to_timestamp,
    normalize_duration,
    volatility_proxy,
)

TICK_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("event_time_ms", T.LongType(), False),
    ]
)


def parse_ticks(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-shaped binary payload → typed tick rows.

    Mirrors reference parse_kafka (spark_streaming.py:57-70): cast value to
    string, ``from_json`` with the fixed 3-field StructType (no inference),
    flatten, derive ``event_time``.
    """
    return (
        raw.select(F.col(value_col).cast("string").alias("json"))
        .select(F.from_json("json", TICK_SCHEMA).alias("r"))
        .select("r.*")
        .withColumn("event_time", ms_to_timestamp("event_time_ms"))
    )


def ticks_from_events(events: DataFrame, symbol_col: str = "event_type") -> DataFrame:
    """Adapt the driver's ``events`` table to the tick contract
    (FIXTURES.md §D mapping: event_type↔symbol, value↔price, ts↔event_time)."""
    return events.select(
        F.col(symbol_col).alias("symbol"),
        F.col("value").alias("price"),
        F.col("ts").alias("event_time"),
        F.unix_millis("ts").alias("event_time_ms"),
    )


def compute_features(
    ticks: DataFrame,
    window: str = "60 seconds",
    slide: str | None = None,
    watermark: str | None = None,
    deterministic: bool = True,
) -> DataFrame:
    """Windowed per-symbol features (reference compute_features,
    spark_streaming.py:73-118), minus the nondeterministic ingest_ts /
    latency_ms columns (added separately by ``with_ingest_latency`` so the
    deterministic core stays oracle-checkable).

    deterministic=True (default) uses event-time-ordered ``min_by``/``max_by``
    for first/last price — the faithful *intent*. deterministic=False keeps
    the reference's arrival-order ``first()`` and lexicographic struct-max
    (bug-compatible; spark_streaming.py:82-88 — struct-max breaks event-time
    ties toward the higher price).

    Works in both batch and streaming: pass ``watermark`` (e.g. the window
    duration, as the reference hardcodes at spark_streaming.py:76) to enable
    streaming state eviction.
    """
    window = normalize_duration(window)
    slide = normalize_duration(slide) if slide else window

    if watermark is not None:
        ticks = ticks.withWatermark("event_time", normalize_duration(watermark))

    if deterministic:
        first_price: Column = F.min_by("price", "event_time")
        last_price: Column = F.max_by("price", "event_time")
    else:
        first_price = F.first("price")
        # argmax via lexicographic struct max — reference spark_streaming.py:83,87
        last_price = F.max(F.struct("event_time", "price"))["price"]

    agg = ticks.groupBy(
        F.window("event_time", window, slide).alias("window"),
        "symbol",
    ).agg(
        first_price.alias("first_price"),
        last_price.alias("last_price"),
        F.count("price").alias("num_ticks"),
        F.max("event_time_ms").alias("max_event_time_ms"),
    )

    lr = log_return(F.col("last_price"), F.col("first_price"))
    return agg.select(
        "symbol",
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "first_price",
        "last_price",
        lr.alias("log_return"),
        volatility_proxy(lr, F.col("num_ticks")).alias("volatility"),
        "num_ticks",
        "max_event_time_ms",
    )


def with_ingest_latency(features: DataFrame) -> DataFrame:
    """Append the reference's nondeterministic columns
    (spark_streaming.py:109-116): per-plan wall clock + end-to-end latency.
    Kept out of the oracle-hashed projection (FIXTURES.md §C note)."""
    ingest = F.current_timestamp()
    return features.withColumn("ingest_ts", ingest).withColumn(
        "latency_ms",
        (F.unix_millis(ingest) - F.col("max_event_time_ms")).cast("long"),
    )


def intra_window_volatility(
    ticks: DataFrame,
    window: str = "60 seconds",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Faithful-intent volatility the reference *skipped* (comment at
    spark_streaming.py:92-93): stddev of per-tick log returns inside each
    tumbling window.

    Two-step plan: an analytic ``lag`` over (symbol ordered by event_time)
    to expand per-tick returns, then the windowed groupBy. Both steps shuffle
    on symbol-derived keys; at 100 TB the lag step's sort is the cost — it is
    a single range-sort per symbol partition, no driver collection.

    Batch-only (streaming needs applyInPandasWithState / foreachBatch re-agg —
    see streaming.job).
    """
    window = normalize_duration(window)
    order = ["event_time"] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy("symbol").orderBy(*order)
    per_tick = ticks.withColumn("prev_price", F.lag("price").over(w)).withColumn(
        "tick_return",
        log_return(F.col("price"), F.col("prev_price")),
    )
    return (
        per_tick.groupBy(F.window("event_time", window).alias("window"), "symbol")
        .agg(
            F.stddev_samp("tick_return").alias("realized_vol"),
            F.count("tick_return").alias("num_returns"),
        )
        .select(
            "symbol",
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "realized_vol",
            "num_returns",
        )
    )

"""Tick sources — the reference's producer/backfill data paths, Spark-native.

Covers SURVEY.md §2.1:
- S2  CSV backfill scan  (reference src/backfill/publish_historical.py:30-37)
- S7  synthetic GBM tick generator (reference src/producer/synthetic_ticks.py:51-57,91-111)
- K3  Kafka-payload codec (reference src/producer/synthetic_ticks.py:64-71)
- S1  Kafka-shaped parse lives in operators.features.parse_ticks

Everything is expression-only (no Python UDFs): the generator derives its
Gaussian draws from ``xxhash64`` + Box-Muller instead of ``F.randn`` so the
output is deterministic regardless of partitioning — the same (seed, symbol,
tick index) always yields the same price on 4 cores or 4 000.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from realtime_market_data_pipeline_spark.functions.core import (
    ms_to_timestamp,
    normalize_symbol,
)
from realtime_market_data_pipeline_spark.io import local_rows_df

# Backfill CSV contract: samples/backfill_sample.csv:1 header
# ``symbol,price,event_time_ms`` (publish_historical.py:40,46-49).
TICK_CSV_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("event_time_ms", T.LongType(), False),
    ]
)

# Producer defaults: synthetic_ticks.py:74-80 / Makefile:16.
DEFAULT_SYMBOLS = ("AAPL", "MSFT", "GOOG")
DEFAULT_TPS = 50
DEFAULT_BASE_PRICE = 100.0
DEFAULT_DRIFT = 0.05
DEFAULT_VOL = 0.2


def read_tick_csv(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """CSV backfill → typed ticks (S2). The reference replays these rows into
    Kafka preserving ``event_time_ms`` (publish_historical.py:46-55) so they
    land in correct event-time windows; the batch engine instead reads them
    directly and callers ``unionByName`` with the live stream (§2.7 W5).

    Schema is fixed, not inferred — same stance as the consumer's explicit
    StructType. Symbols are normalized exactly like the backfill publisher
    (``strip().upper()``, publish_historical.py:47).

    ``keep_corrupt=True`` adds a ``_corrupt_record`` column holding each
    malformed line verbatim (PERMISSIVE mode) — at 100 TB, dirty rows get
    quarantined for inspection, never crash the job or silently vanish.
    """
    schema = TICK_CSV_SCHEMA
    if keep_corrupt:
        schema = T.StructType(
            [*TICK_CSV_SCHEMA.fields, T.StructField("_corrupt_record", T.StringType(), True)]
        )
    raw = spark.read.csv(
        path,
        header=True,
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    cols = [
        normalize_symbol("symbol").alias("symbol"),
        F.col("price"),
        F.col("event_time_ms"),
        ms_to_timestamp("event_time_ms").alias("event_time"),
    ]
    if keep_corrupt:
        cols.append(F.col("_corrupt_record"))
    return raw.select(*cols)


def to_kafka_payload(ticks: DataFrame) -> DataFrame:
    """Ticks → Kafka-producible frame (K3): ``key`` = symbol (keeps one
    symbol per partition, preserving per-symbol order like the reference's
    keyless-but-single-producer setup), ``value`` = the JSON object the
    producer emits (synthetic_ticks.py:66-71).

    Write with ``df.write.format("kafka")`` where a broker exists; the codec
    itself is broker-free and round-trips through operators.features.parse_ticks.
    """
    return ticks.select(
        F.col("symbol").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.col("symbol"),
                F.col("price"),
                F.col("event_time_ms"),
            )
        ).alias("value"),
    )


def _hash_uniform(*cols: Column, salt: str) -> Column:
    """Deterministic U(0,1) from xxhash64 of (salt, cols) — partition-order
    independent, unlike ``F.rand``. 2^-53 offset keeps it in (0,1) so
    log(u) below is finite."""
    h = F.xxhash64(F.lit(salt), *cols)
    # xxhash64 → signed 64-bit; fold to [0, 2^52) then scale.
    return (F.pmod(h, F.lit(2**52)).cast("double") + F.lit(0.5)) / F.lit(float(2**52))


def _hash_gaussian(*cols: Column, salt: str) -> Column:
    """N(0,1) via Box-Muller over two independent hash-uniforms."""
    u1 = _hash_uniform(*cols, salt=salt + ":u1")
    u2 = _hash_uniform(*cols, salt=salt + ":u2")
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)


def synthetic_ticks_batch(
    spark: SparkSession,
    n_per_symbol: int,
    symbols: Sequence[str] = DEFAULT_SYMBOLS,
    tps: int = DEFAULT_TPS,
    base_price: float = DEFAULT_BASE_PRICE,
    drift: float = DEFAULT_DRIFT,
    vol: float = DEFAULT_VOL,
    seed: int = 42,
    start_ms: int = 1_704_067_200_000,  # 2024-01-01T00:00:00Z
) -> DataFrame:
    """Batch GBM tick generator (S7): the reference's per-symbol price walk
    ``price *= exp((mu - sigma^2/2) dt + sigma sqrt(dt) z)``
    (synthetic_ticks.py:51-57) as a path-faithful DataFrame.

    The multiplicative walk is a cumulative sum of log-increments, expressed
    as a running-sum window per symbol — one range-sort per symbol, no driver
    loop. Tick pacing mirrors the producer: ``per_symbol_tps = max(1,
    tps // n_symbols)`` (synthetic_ticks.py:91-92), prices rounded to 4 dp at
    emission (synthetic_ticks.py:106).

    Scale note: the per-symbol ordered cumsum means one sorted partition per
    symbol; generators are bounded by symbols × ticks so this is fine — real
    100 TB inputs arrive from storage/Kafka, not this walk.
    """
    per_symbol_tps = max(1, tps // max(1, len(symbols)))
    dt = 1.0 / per_symbol_tps
    sym_df = local_rows_df(
        spark, [(s.strip().upper(),) for s in symbols], "symbol string"
    )
    idx = spark.range(n_per_symbol).withColumnRenamed("id", "tick_idx")
    grid = sym_df.crossJoin(idx)

    z = _hash_gaussian(F.col("symbol"), F.col("tick_idx"), salt=f"gbm:{seed}")
    increment = F.lit((drift - vol * vol / 2.0) * dt) + F.lit(vol * math.sqrt(dt)) * z
    w = (
        Window.partitionBy("symbol")
        .orderBy("tick_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    event_ms = (
        F.lit(start_ms) + (F.col("tick_idx") * F.lit(int(1000 * dt))).cast("long")
    )
    return (
        grid.withColumn("log_price_delta", increment)
        .withColumn(
            "price",
            F.round(F.lit(base_price) * F.exp(F.sum("log_price_delta").over(w)), 4),
        )
        .select(
            "symbol",
            "price",
            event_ms.alias("event_time_ms"),
            ms_to_timestamp(event_ms).alias("event_time"),
        )
    )


def synthetic_ticks_stream(
    spark: SparkSession,
    symbols: Sequence[str] = DEFAULT_SYMBOLS,
    tps: int = DEFAULT_TPS,
    base_price: float = DEFAULT_BASE_PRICE,
    drift: float = DEFAULT_DRIFT,
    vol: float = DEFAULT_VOL,
    seed: int = 42,
) -> DataFrame:
    """Streaming GBM tick source (S7): ``rate`` source → one tick per row,
    round-robin across symbols at the producer's total ``tps``
    (synthetic_ticks.py:91-111).

    A streaming operator cannot hold the walk's running sum without state, so
    each tick samples GBM's *closed-form marginal* at its elapsed time t:
    ``price_t = p0 * exp((mu - sigma^2/2) t + sigma sqrt(t) z)`` — the
    per-time distribution matches the reference's walk even though draws are
    independent across ticks. Stateless ⇒ scales to any rate with zero
    streaming state.
    """
    n = max(1, len(symbols))
    rate = spark.readStream.format("rate").option("rowsPerSecond", tps).load()
    sym_array = F.array(*[F.lit(s.strip().upper()) for s in symbols])
    symbol = sym_array[F.pmod(F.col("value"), F.lit(n)).cast("int")]
    tick_idx = F.expr(f"value div {n}")
    per_symbol_tps = max(1, tps // n)
    t_sec = tick_idx.cast("double") / F.lit(float(per_symbol_tps))
    z = _hash_gaussian(symbol, tick_idx, salt=f"gbm-stream:{seed}")
    price = F.round(
        F.lit(base_price)
        * F.exp(
            F.lit(drift - vol * vol / 2.0) * t_sec + F.lit(vol) * F.sqrt(t_sec) * z
        ),
        4,
    )
    event_ms = F.unix_millis(F.col("timestamp"))
    return rate.select(
        symbol.alias("symbol"),
        price.alias("price"),
        event_ms.alias("event_time_ms"),
        F.col("timestamp").alias("event_time"),
    )

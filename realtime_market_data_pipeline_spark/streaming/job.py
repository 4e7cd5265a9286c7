"""Streaming job assembly — the reference consumer end-to-end, Spark-native.

Mirrors the lifecycle traced in SURVEY.md §3.1: source → parse →
compute_features (watermark + sliding window) → foreachBatch sink with
checkpoint, but built from the same pure operators the batch engine uses, so
every transformation here is the one the DuckDB oracle already checked in
batch mode.

Covers §2.8 T1-T7: watermark (= window duration by default, as the reference
hardcodes at spark_streaming.py:76), sliding event-time windows, update/append
output modes, checkpointing, and the T8 latency column.

Kafka wiring (S1/K3) is provided but exercised only where a broker exists —
this container has none, so tests drive the identical plan through file and
rate sources instead; the transformation chain is source-agnostic by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from realtime_market_data_pipeline_spark.operators.features import (
    compute_features,
    parse_ticks,
    with_ingest_latency,
)
from realtime_market_data_pipeline_spark.streaming.sinks import BatchWriter


def read_kafka_ticks(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "ticks",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1: Kafka stream source → parsed ticks (reference
    spark_streaming.py:315-324). ``failOnDataLoss=false`` matches the
    reference's tolerance for compacted/expired offsets;
    ``max_offsets_per_trigger`` is the consumer-side backpressure knob (T9 —
    bounds per-batch work so one burst can't blow past executor memory).
    Requires the spark-sql-kafka package on the classpath (not bundled in
    this container)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_ticks(reader.load())


def read_socket_ticks(
    spark: SparkSession, host: str = "localhost", port: int = 9999
) -> DataFrame:
    """Live network PUSH source twin of the Kafka path (S1): Spark's
    built-in socket source delivers newline-delimited JSON tick payloads
    with the SAME ``value`` column contract a Kafka frame has, so
    ``parse_ticks`` drives the identical downstream plan — an unbounded
    source with no files and no replay, which is what distinguishes it
    from the parquet twin. Transport for tests/dev only (the socket
    source is not fault-tolerant; Kafka is the production transport);
    everything downstream is transport-agnostic by construction."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_ticks(raw)


def read_parquet_ticks_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Broker-free streaming source: a parquet directory consumed
    incrementally (one file per micro-batch by default — gives the
    multi-batch update-mode semantics the §2.2 trap needs, without Kafka).
    Schema is read from the files once at plan time."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def features_stream(
    ticks: DataFrame,
    window: str = "60 seconds",
    slide: str | None = None,
    watermark: str | None = None,
    with_latency: bool = True,
    deterministic: bool = True,
) -> DataFrame:
    """The streaming feature plan: identical operator chain to batch, plus
    watermark (defaulting to the window duration, spark_streaming.py:76) and
    the T8 ingest/latency columns."""
    out = compute_features(
        ticks,
        window=window,
        slide=slide,
        watermark=watermark if watermark is not None else window,
        deterministic=deterministic,
    )
    return with_ingest_latency(out) if with_latency else out


def dedup_ticks_stream(
    ticks: DataFrame,
    watermark: str = "60 seconds",
    keys: tuple[str, ...] = ("symbol", "event_time_ms"),
) -> DataFrame:
    """At-least-once → effectively-once ingest: drop replayed ticks with the
    same key seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``). Unlike plain ``dropDuplicates`` on a
    stream, state is bounded — keys older than the watermark are evicted, so
    this survives unbounded topics (the reference's T7 gap: a replayed Kafka
    batch double-inserts, spark_streaming.py:320,337 — this closes it at the
    source side; sinks.idempotent_parquet_writer closes it at the sink side).
    """
    return ticks.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str,
    lookahead: str = "0 seconds",
    watermark: str = "60 seconds",
    right_cols: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join constrained to a time interval:
    ``right_ts ∈ [left_ts − lookback, left_ts + lookahead]`` (the
    trades×quotes correlation shape). Both sides are watermarked so the join
    state store only retains rows inside the interval + watermark horizon —
    without the range condition a stream-stream join must buffer one side
    forever. Executes as one hash shuffle on the key; the range predicate
    both bounds state AND filters in-partition.

    ``how='left_outer'`` emits unmatched left rows with NULL right columns —
    but only once the watermark has passed the row's interval (the engine
    cannot know "no match will come" earlier). Consequence for bounded
    replays: rows inside the final watermark horizon at end-of-stream never
    flush; streams that must drain fully need a watermark-advancing sentinel
    (or a processing-time-based close). Same state-size bound as inner."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    if right_cols:
        r = r.select(key, right_ts, *right_cols).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lookahead}")
        )
    )
    return l.join(r, cond, how).select(
        "l.*",
        F.col(f"r.{right_ts}").alias(f"right_{right_ts}"),
        *[F.col(f"r.{c}").alias(f"right_{c}") for c in right_cols],
    )


def start_features_stream(
    features: DataFrame,
    writer: BatchWriter,
    checkpoint_dir: str,
    output_mode: str = "update",
    available_now: bool = False,
    processing_time: str | None = None,
) -> StreamingQuery:
    """K4: wire a feature stream to a foreachBatch sink with checkpointing
    (reference spark_streaming.py:334-341). ``available_now=True`` drains all
    currently-available input then stops — the batch-equivalence testing mode;
    ``processing_time`` sets a fixed-interval trigger (T5)."""
    w = (
        features.writeStream.outputMode(output_mode)
        .foreachBatch(writer)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()

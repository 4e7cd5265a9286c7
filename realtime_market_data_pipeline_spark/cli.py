"""Consumer CLI — the reference's ``python -m src.consumer.spark_streaming``
entry point (spark_streaming.py:299-341), Spark-native.

    python -m realtime_market_data_pipeline_spark.cli \
        --source synthetic --window 60s --slide 10s \
        --sink parquet:./data/features --checkpoint ./data/ckpt

Sources: ``kafka:<bootstrap>/<topic>`` (needs the spark-sql-kafka package),
``parquet:<dir>`` (incremental file stream — the broker-free twin),
``synthetic`` (rate-source GBM ticks). Sinks: ``parquet:<dir>`` (append),
``idempotent:<dir>`` (batch_id-partitioned, replay-safe),
``duckdb:<db-path>`` (reference K1 semantics), ``console``.

argparse instead of click (no third-party CLI dep); flags mirror the
reference: --window/--slide/--starting-offsets/--sink plus --watermark
(the reference hardcodes watermark = window, kept as the default here).
"""

from __future__ import annotations

import argparse

from realtime_market_data_pipeline_spark.session import get_spark
from realtime_market_data_pipeline_spark.sources.ticks import synthetic_ticks_stream
from realtime_market_data_pipeline_spark.streaming import job, sinks


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="realtime-market-data-pipeline-spark",
        description="Windowed per-symbol feature stream (reference consumer parity)",
    )
    p.add_argument("--source", default="synthetic",
                   help="kafka:<bootstrap>/<topic> | parquet:<dir> | synthetic"
                        " | gbm (pluggable gbm_ticks DataSource)")
    p.add_argument("--window", default="60s")
    p.add_argument("--slide", default="10s")
    p.add_argument("--watermark", default=None,
                   help="watermark delay (default: = window, as the reference)")
    p.add_argument("--starting-offsets", default="latest",
                   choices=["earliest", "latest"])
    p.add_argument("--sink", default="console",
                   help="parquet:<dir> | idempotent:<dir> | duckdb:<path> | "
                        "jdbc:<url> (append) | jdbc-merge:<url> (exactly-once "
                        "upsert; derby:<path> shorthand builds an embedded "
                        "Derby URL) | console")
    p.add_argument("--checkpoint", default="./data/checkpoints/features")
    p.add_argument("--output-mode", default="update", choices=["update", "append"])
    p.add_argument("--trigger", default=None,
                   help="processing-time interval, e.g. '10 seconds'")
    p.add_argument("--once", action="store_true",
                   help="drain available input then stop (availableNow)")
    return p


def make_source(spark, args):
    if args.source == "synthetic":
        return synthetic_ticks_stream(spark)
    if args.source == "gbm":
        from realtime_market_data_pipeline_spark.sources.gbm_datasource import (
            register_gbm_source,
        )

        register_gbm_source(spark)
        return spark.readStream.format("gbm_ticks").load()
    kind, _, rest = args.source.partition(":")
    if kind == "kafka":
        bootstrap, _, topic = rest.partition("/")
        return job.read_kafka_ticks(
            spark, bootstrap, topic or "ticks", starting_offsets=args.starting_offsets
        )
    if kind == "parquet":
        return job.read_parquet_ticks_stream(spark, rest)
    raise SystemExit(f"unknown source {args.source!r}")


def make_writer(args):
    kind, _, rest = args.sink.partition(":")
    if kind == "console":
        return lambda df, bid: df.show(20, truncate=False)
    if kind == "parquet":
        return sinks.parquet_append_writer(rest)
    if kind == "idempotent":
        return sinks.idempotent_parquet_writer(rest)
    if kind == "duckdb":
        sinks.ensure_duckdb_schema(rest)
        return sinks.duckdb_append_writer(rest)
    if kind in ("jdbc", "jdbc-merge"):
        url = rest
        props = {}
        if url.startswith("derby:"):
            url = sinks.derby_url(url.partition(":")[2])
            props = {"driver": sinks.DERBY_DRIVER}
        if kind == "jdbc":
            return sinks.jdbc_append_writer(url, properties=props)
        return sinks.jdbc_merge_writer(url, properties=props)
    raise SystemExit(f"unknown sink {args.sink!r}")


def run_backfill(spark, csv_path: str, target_dir: str) -> int:
    """Backfill parity (reference src/backfill/publish_historical.py): replay
    a historical CSV into the live pipeline's input. The reference publishes
    to the same Kafka topic; the file-stream twin appends the rows as a
    parquet file into the watched directory — the stream picks it up as a
    micro-batch with original event times, landing in correct event-time
    windows (subject to the watermark, README.md:137-140)."""
    from realtime_market_data_pipeline_spark.sources.ticks import read_tick_csv

    rows = read_tick_csv(spark, csv_path).select(
        "symbol", "price", "event_time_ms", "event_time"
    )
    rows.coalesce(1).write.mode("append").parquet(target_dir)
    return rows.count()


def main(argv: list[str] | None = None) -> None:
    parser = build_parser()
    parser.add_argument("--backfill", default=None,
                        help="csv-path: replay into --source parquet:<dir> and exit")
    args = parser.parse_args(argv)
    spark = get_spark(app_name="rtmdp-consumer")
    if args.backfill is not None:
        kind, _, rest = args.source.partition(":")
        if kind != "parquet":
            raise SystemExit("--backfill needs --source parquet:<dir>")
        n = run_backfill(spark, args.backfill, rest)
        print(f"backfilled {n} ticks into {rest}")
        return
    ticks = make_source(spark, args)
    feats = job.features_stream(
        ticks, window=args.window, slide=args.slide, watermark=args.watermark
    )
    q = job.start_features_stream(
        feats,
        make_writer(args),
        checkpoint_dir=args.checkpoint,
        output_mode=args.output_mode,
        available_now=args.once,
        processing_time=args.trigger,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()

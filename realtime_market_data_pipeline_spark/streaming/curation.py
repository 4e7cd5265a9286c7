"""Streaming curation — quality gating at ingestion time.

The batch quality operators (text.gopher_quality, text.quality_score)
answer "which documents in this corpus pass the structural filters". A
training-data ingestion pipeline wants the ONLINE form: gate every
micro-batch as it arrives, land keepers in the curated table and
rejects in an auditable quarantine table that records WHICH rule fired
— the same split-and-route shape as the media quarantine routers, at
the document level.

Writer contract (shared with streaming/dedup.py and streaming/sinks.py):
rows land in ``<dir>/batch_id=N`` via dynamic-partition overwrite, so a
replayed micro-batch rewrites itself (exactly-once landing). The gate
itself is pure per-row Column arithmetic — zero shuffle exchanges
(plan-pinned for the batch operator), so the stream's per-batch cost is
one scan of the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from realtime_market_data_pipeline_spark.streaming.sinks import BatchWriter


def quality_gate_writer(
    out_dir: str,
    rejects_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    **gopher_kwargs,
) -> BatchWriter:
    """foreachBatch writer: apply the Gopher quality rules
    (``text.gopher_quality``) to each micro-batch. Keepers — original
    text plus every signal column — land in ``out_dir/batch_id=N``;
    rejects land in ``rejects_dir`` (when given) with the per-rule
    booleans naming exactly why each document was cut, which is what a
    pipeline operator audits before retuning thresholds. Both writes
    are idempotent dynamic overwrites. ``gopher_kwargs`` pass through
    to ``gopher_quality`` (thresholds, required_words, ...)."""
    from realtime_market_data_pipeline_spark.operators.text import (
        gopher_quality,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        scored = gopher_quality(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            extra_cols=(text_col,),
            **gopher_kwargs,
        ).persist()
        try:
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            # NULL-text documents get NULL signals, so keep is NULL —
            # both filter(keep) and filter(~keep) would drop them from
            # BOTH tables, silently losing rows from the auditable
            # split (r12 advice fix). Route NULL keep to rejects: a
            # document with no text is a reject, and the NULL signal
            # columns record why.
            keep3 = F.coalesce(F.col("keep"), F.lit(False))
            try:
                (
                    scored.filter(keep3)
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .partitionBy("batch_id")
                    .parquet(out_dir)
                )
                if rejects_dir is not None:
                    (
                        scored.filter(~keep3)
                        .withColumn("batch_id", F.lit(batch_id))
                        .write.mode("overwrite")
                        .partitionBy("batch_id")
                        .parquet(rejects_dir)
                    )
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
        finally:
            scored.unpersist()

    return write

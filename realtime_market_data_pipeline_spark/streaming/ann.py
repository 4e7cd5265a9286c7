"""Streaming ANN search against a persisted index (r9).

The batch ANN operators (operators/similarity.py) answer "top-k corpus
neighbors of these query vectors" one job at a time; a retrieval service
over a 100 TB corpus gets its queries as a STREAM. This module is the
online form: query vectors arrive in micro-batches, each batch searches
the static corpus with the index that was trained ONCE and persisted
(``save_ann_index``/``load_ann_index`` — the r9 index lifecycle), and
results land batch_id-partitioned with dynamic overwrite so a replayed
batch rewrites itself (the ``minhash_dedup_writer`` exactly-once
pattern).

Scale shape per micro-batch: the query side is small (one batch), so
``ann_topk_ivf`` broadcasts it against the corpus assignment; the
corpus-side assignment is recomputed per batch here — at real scale the
corpus bucket assignment is itself precomputed next to the index (one
more parquet the index build step writes) and the per-batch cost drops
to |batch| x n_probe bucket joins. The index load happens ONCE at
writer construction (driver-bounded k x d doubles), not per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.similarity import (
    ann_topk_ivf,
    load_ann_index,
)
from realtime_market_data_pipeline_spark.streaming.sinks import BatchWriter


def ann_search_writer(
    spark,
    index_path: str,
    corpus_dir: str,
    out_dir: str,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> BatchWriter:
    """foreachBatch writer: search each micro-batch of query vectors
    against the parquet corpus using the PERSISTED IVF index (loaded
    once, here, at construction — bit-exact round-trip, so stream
    results equal the batch search with the trained centroids)."""
    centers = load_ann_index(spark, index_path)["centroids"]
    if not centers:
        raise ValueError(f"no centroids in index at {index_path}")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        corpus = sp.read.parquet(corpus_dir)
        hits = ann_topk_ivf(
            corpus,
            batch_df,
            centers,
            k=k,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
        )
        prev = sp.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                hits.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write

"""Mergeable sketch operators with deterministic, oracle-replayable output.

The KMV (k-minimum-values) bottom-k sketch estimates distinct counts from
the k smallest hash values of the key set — unlike HLL
(``approx_count_distinct``) the sketch CONTENT is a pure function of the
data (md5 order), so both the sample and the estimate replay exactly in
ANSI SQL: a strict-hash oracle can check it value-for-value, where HLL can
only be contract-checked. Bottom-k is also a uniform distinct-key sample
(the classic bottom-k sketch), and it merges: bottom-k(A ∪ B) =
bottom-k(bottom-k(A) ∪ bottom-k(B)) — the property the streaming twin
(streaming/stateful.kmv_stream) folds on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realtime_market_data_pipeline_spark.operators.text import sample_key48

KMV_SALT = "kmv:v1"


def bottomk_user_hashes(
    df: DataFrame,
    by: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k of the distinct ids' 48-bit md5 keys:
    (by, id, h48, rk ≤ k). One distinct exchange on (by, id), then a
    per-group window at distinct-key cardinality — the window never sees
    raw rows. Ties cannot occur (h48 collisions aside, rk breaks by id)."""
    d = df.select(by, id_col).distinct()
    h = d.select(
        by, id_col, sample_key48(id_col, salt=KMV_SALT).alias("h48")
    )
    w = Window.partitionBy(by).orderBy("h48", id_col)
    return h.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def kmv_distinct_estimate(
    df: DataFrame,
    by: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count estimate per group: est = (k−1)·2⁴⁸ / u_k where
    u_k is the k-th smallest 48-bit key; groups with fewer than k distinct
    ids are exact (est = k_used). The exact distinct count rides alongside
    with a |est−exact| ≤ 0.5·exact contract bool — at k=64 the KMV
    standard error is 1/√(k−2) ≈ 12.6%, so 50% is a ≈4σ bound.

    Every output is deterministic: integer hashes, a literal numerator
    ((k−1)·2⁴⁸ has ≤ 6 significant bits — exactly representable as a
    double), identical-operand division, 6-dp round. At 100 TB the
    bottom-k partial-aggregates per partition before the (by)-keyed
    exchange (the window input is already distinct-key cardinality)."""
    bk = bottomk_user_hashes(df, by=by, id_col=id_col, k=k)
    t = bk.groupBy(by).agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h48").alias("u_k")
    )
    exact = (
        df.select(by, id_col)
        .distinct()
        .groupBy(by)
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    numerator = float((k - 1) * (1 << 48))
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.round(F.lit(numerator) / F.col("u_k"), 6))
    j = t.join(F.broadcast(exact), by)
    return j.select(
        by,
        "k_used",
        "u_k",
        est.alias("est_distinct"),
        "exact_distinct",
        (
            F.abs(est - F.col("exact_distinct"))
            <= F.lit(0.5) * F.col("exact_distinct")
        ).alias("within_bound"),
    )

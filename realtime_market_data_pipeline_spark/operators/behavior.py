"""Behavioral / product analytics over the event log — ordered funnels and
cohort retention (the read-side questions an events pipeline's consumers ask
of the same table the feature engine reads; reference scope: read-side SQL
consumers, app/streamlit_app.py's query panels).

Scale shapes: the funnel is THREE stacked whole-partition window aggregates
over the same ``user_id`` partitioning — one exchange total, no ORDER BY
(whole-partition frames need no sort) — followed by a global roll-up that
partial-aggregates map-side. Retention is two user-keyed aggregations whose
shuffles share the ``user_id`` key family plus one broadcast of the
per-cohort sizes (cohort cardinality = number of weeks — tiny forever).
Neither shape has a join that grows super-linearly in users or events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_user_stages(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel state: (user, t_s1, t_s2, t_s3) — the first
    conversion time of each stage under the strict ordering rule (stage k
    counts only at/after the user's stage-(k−1) time). One row per user;
    NULL marks a stage not reached. This is the relation the streaming twin
    (streaming/stateful.funnel_stream) maintains incrementally.

    Each stage's first-conversion time is a conditional ``min`` over the
    user's whole partition; stage k's predicate references stage k−1's
    window value, so the three windows stack in one Exchange (same
    partitioning, no frame sort), and the per-user collapse reuses that
    partitioning (no second exchange)."""
    s1, s2, s3 = stages
    w = Window.partitionBy(user_col)
    t = F.col(ts_col)
    typ = F.col(type_col)
    with_1 = events.withColumn(
        "t_s1", F.min(F.when(typ == s1, t)).over(w)
    )
    with_2 = with_1.withColumn(
        "t_s2",
        F.min(F.when((typ == s2) & (t >= F.col("t_s1")), t)).over(w),
    )
    with_3 = with_2.withColumn(
        "t_s3",
        F.min(F.when((typ == s3) & (t >= F.col("t_s2")), t)).over(w),
    )
    # Collapse to one row per user: the groupBy key equals the window
    # partitioning, so this adds no exchange.
    return with_3.groupBy(user_col).agg(
        F.first("t_s1").alias("t_s1"),
        F.first("t_s2").alias("t_s2"),
        F.first("t_s3").alias("t_s3"),
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered three-stage funnel roll-up: one row with the users
    entering each stage plus 6-dp conversion ratios. Built on
    ``funnel_user_stages`` — the global roll-up needs only plain non-null
    counts (no multi-distinct Expand), and the partial aggregate ships one
    row per user-partition."""
    per_user = funnel_user_stages(events, stages, type_col, user_col, ts_col)
    agg = per_user.groupBy().agg(
        F.count("t_s1").alias("n_stage1"),
        F.count("t_s2").alias("n_stage2"),
        F.count("t_s3").alias("n_stage3"),
    )
    return agg.select(
        "n_stage1",
        "n_stage2",
        "n_stage3",
        F.round(F.col("n_stage2") / F.col("n_stage1"), 6).alias("conv_1_2"),
        F.round(F.col("n_stage3") / F.col("n_stage2"), 6).alias("conv_2_3"),
        F.round(F.col("n_stage3") / F.col("n_stage1"), 6).alias("conv_overall"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their first
    event, counted distinct in every week they were active. Emits
    (cohort_week, active_week, week_offset, n_active, cohort_size,
    retention) for offsets ≥ 0; retention is 6-dp n_active/cohort_size.

    Dataflow: (1) per-user first-event week — one user-keyed agg; (2) the
    user×active-week activity set — distinct on the same key family;
    (3) activity ⋈ cohort on user_id — co-partitioned shuffle join;
    (4) per-(cohort, week) distinct counts; (5) cohort sizes joined back
    via broadcast (rows = weeks in the corpus)."""
    cohort = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        events.select(
            user_col, F.date_trunc("week", ts_col).alias("active_week")
        ).distinct()
    )
    pairs = (
        active.join(cohort, user_col)
        .groupBy("cohort_week", "active_week")
        .agg(F.count_distinct(user_col).alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        pairs.join(F.broadcast(sizes), "cohort_week")
        .where(F.col("active_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            "active_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )

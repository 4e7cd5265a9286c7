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
    # guarded ratios: ANSI mode makes x/0 an ERROR, not NULL — an empty
    # funnel stage must yield a NULL rate, not a failed job
    def ratio(num, den, name):
        return F.when(
            F.col(den) > 0, F.round(F.col(num) / F.col(den), 6)
        ).alias(name)

    return agg.select(
        "n_stage1",
        "n_stage2",
        "n_stage3",
        ratio("n_stage2", "n_stage1", "conv_1_2"),
        ratio("n_stage3", "n_stage2", "conv_2_3"),
        ratio("n_stage3", "n_stage1", "conv_overall"),
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


def event_transitions(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the per-user event stream:
    (from_type, to_type, n, prob) where prob row-normalizes over from_type.
    The lead() window orders by (ts, tiebreak) so equal-timestamp neighbors
    are engine-independent.

    Scale shape: one user-keyed exchange for the lead() window (in-partition
    sort), then the pair counts partial-aggregate map-side down to
    |types|² rows; the row normalization is a window over that tiny
    aggregate — cardinality |types|², never data-sized."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm), 6).alias("prob"),
    )


def funnel_conversion_times(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    **kwargs,
) -> DataFrame:
    """Latency profile of the ordered funnel: over converted users, the
    mean and median milliseconds from first stage-1 to first stage-2 and to
    first stage-3. Built on ``funnel_user_stages`` (USER-cardinality input);
    deltas are exact epoch-ms integers, means are decimal-summed then
    rounded, medians are type-7 interpolated percentiles — all
    engine-identical."""
    per_user = funnel_user_stages(events, stages, **kwargs)
    d = per_user.select(
        (F.unix_millis("t_s2") - F.unix_millis("t_s1")).alias("ms_1_2"),
        (F.unix_millis("t_s3") - F.unix_millis("t_s1")).alias("ms_1_3"),
    )
    dec = "decimal(38,10)"

    # zero-converter guard: ANSI x/0 errors, so an unconverted funnel must
    # emit NULL means (the count/median aggregates already NULL out)
    def avg_of(col, name):
        return F.when(
            F.count(col) > 0,
            F.round(F.sum(F.col(col).cast(dec)).cast("double") / F.count(col), 6),
        ).alias(name)

    return d.groupBy().agg(
        F.count("ms_1_2").alias("n_converted_2"),
        F.count("ms_1_3").alias("n_converted_3"),
        avg_of("ms_1_2", "avg_ms_1_2"),
        avg_of("ms_1_3", "avg_ms_1_3"),
        F.round(F.percentile("ms_1_2", F.lit(0.5)), 6).alias("median_ms_1_2"),
        F.round(F.percentile("ms_1_3", F.lit(0.5)), 6).alias("median_ms_1_3"),
    )


def sequence_pattern_match(
    events: DataFrame,
    patterns: dict[str, str],
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching by composition: each
    user's event history becomes an ordered initial-letter string (one char
    per event — types here start with distinct letters), and every pattern
    is a regex over that string — 'v.*c.*p' is the ordered funnel, '^s'
    is signup-first. Output: one row per pattern with matched-user count
    and fraction.

    Determinism: the sequence string orders by (ts, event_id) via
    array_sort over structs — collect_list alone has no order guarantee.
    Regexes must stay in the Java∩RE2 subset (same discipline as the PII
    chain) so the oracle replays them. Scale shape: ONE user_id exchange;
    per-user strings are history-bounded, the flag aggregate collapses
    map-side to a single row, and the pattern fan-out is a stack() over
    that one row."""
    keys = list(patterns)
    seqs = events.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("seq")
    )
    flags = seqs.agg(
        F.count(F.lit(1)).alias("n_total_users"),
        *[
            F.sum(F.col("seq").rlike(patterns[k]).cast("long")).alias(f"m{i}")
            for i, k in enumerate(keys)
        ],
    )
    # Pattern names are caller-supplied: build the long form through the
    # Column API (explode over struct literals), never by interpolating the
    # keys into an F.expr string — a quoted/backslashed key would otherwise
    # produce a malformed (or injectable) stack() expression, and escaping
    # by hand is parser-conf-dependent (escapedStringLiterals).
    long = flags.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("pattern"),
                        F.col(f"m{i}").alias("n_users"),
                    )
                    for i, k in enumerate(keys)
                ]
            )
        ).alias("pn"),
        "n_total_users",
    ).select(
        F.col("pn.pattern").alias("pattern"),
        F.col("pn.n_users").alias("n_users"),
        "n_total_users",
    )
    return long.select(
        "pattern",
        "n_users",
        "n_total_users",
        F.round(
            F.col("n_users").cast("double") / F.col("n_total_users"), 6
        ).alias("frac"),
    )

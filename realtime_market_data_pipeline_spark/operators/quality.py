"""Data-quality operators: schema-contract validation and column profiling.

Validation re-expresses the reference's smoke test
(/root/reference/scripts/smoke_test.py:19-31 — consume messages, assert
``symbol``/``price``/``event_time_ms`` present and typed) as a distributed
aggregate over a payload column, so the same check that gated 10 Kafka
messages gates 100 TB of parquet.

Profiling is the training-data-pipeline staple: per-column completeness /
cardinality / range in one scan (count+distinct partial-aggregate per
column, unioned long-form).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.features import TICK_SCHEMA


def validate_tick_payloads(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Schema-contract counts over raw (Kafka-shaped) payloads: total rows,
    structurally valid ticks (JSON object with all three fields non-null
    after the fixed-StructType parse), and per-field missing counts.

    One scan, one 1-row final aggregate — the streaming form is the same
    expression under ``foreachBatch`` (alert when n_invalid > 0)."""
    parsed = raw.select(
        F.col(value_col).cast("string").alias("json")
    ).withColumn("r", F.from_json("json", TICK_SCHEMA))
    r = F.col("r")
    valid = (
        r.isNotNull()
        & r["symbol"].isNotNull()
        & r["price"].isNotNull()
        & r["event_time_ms"].isNotNull()
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(valid.cast("long")).alias("n_valid"),
        F.sum((~valid).cast("long")).alias("n_invalid"),
        F.sum((r.isNull() | r["symbol"].isNull()).cast("long")).alias("n_missing_symbol"),
        F.sum((r.isNull() | r["price"].isNull()).cast("long")).alias("n_missing_price"),
        F.sum((r.isNull() | r["event_time_ms"].isNull()).cast("long")).alias(
            "n_missing_event_time"
        ),
    )


def profile_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form numeric profile: one output row per column with row count,
    null count, distinct count, min/max and a 6-dp decimal-exact mean.

    Each column's profile is an independent full-scan aggregate; the union
    keeps one scan per column (Catalyst does not yet share scans across
    union branches) — for a many-column profile at 100 TB, run one wide
    aggregate instead; this long form is the readable API."""
    parts = []
    for c in cols:
        col = F.col(c)
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(col.isNull().cast("long")).alias("n_null"),
                F.countDistinct(col).alias("n_distinct"),
                F.round(F.min(col).cast("double"), 6).alias("min_val"),
                F.round(F.max(col).cast("double"), 6).alias("max_val"),
                F.round(
                    F.sum(col.cast("decimal(38,10)")).cast("double") / F.count(col),
                    6,
                ).alias("mean_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    by: str = "event_type",
    nbins: int = 20,
) -> DataFrame:
    """Per-group equi-width histogram: ``nbins`` buckets spanning each
    group's [min, max], top bucket closed (the max lands in bin nbins-1).
    The distribution readout of the profiling family (``profile_numeric``
    gives moments; this gives shape).

    Determinism: bin assignment is pure IEEE double arithmetic on identical
    operands — (max−min)/nbins then floor((v−min)/width) — so both engines
    compute bit-identical bins; counts are integers and edges are 6-dp
    rounded. A constant-valued group (width 0) collapses to bin 0 rather
    than dividing by zero.

    Scale shape: two scans (stats, histogram — Catalyst does not share
    scans across the broadcast), both fully partial-aggregated map-side;
    the per-group stats relation is |groups| rows and broadcast. Empty bins
    are not emitted (identically on both engines)."""
    stats = df.groupBy(by).agg(
        F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
    )
    j = (
        df.select(by, value_col)
        .where(F.col(value_col).isNotNull())
        .join(F.broadcast(stats), by)
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    bin_ = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("mn")) / width),
                F.lit(nbins - 1),
            )
        )
        .cast("int")
    )
    h = j.groupBy(F.col(by), bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("mn").alias("mn"),
        F.min("mx").alias("mx"),
    )
    w2 = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    return h.select(
        by,
        "bin",
        F.round(F.col("mn") + F.col("bin") * w2, 6).alias("bin_lo"),
        F.round(F.col("mn") + (F.col("bin") + F.lit(1)) * w2, 6).alias("bin_hi"),
        "n_rows",
    )


def value_drift_psi(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    by: str = "event_type",
    nbins: int = 10,
) -> DataFrame:
    """Population stability index per group between the corpus's earlier
    half (reference) and later half (current) — the drift monitor a
    training pipeline runs before trusting new data. Split point is the
    integer midpoint of [min ts, max ts] (epoch-µs floor-division —
    engine-exact); bins are equi-width over the REFERENCE window's
    [min, max] with out-of-range current values clamped into the edge
    bins; PSI = Σ (q−p)·ln(q/p) over bins populated on BOTH sides
    (zero-on-either-side bins are counted, not epsilon-fudged).

    Cross-engine exactness: bin assignment is identical-operand IEEE
    arithmetic; each bin's term is 9-dp-rounded then summed in exact
    DECIMAL (the bigram-LM pattern), so shuffle order can't move the sum;
    final PSI is 6-dp.

    Scale shape: three row-linear scans (global ts extent, per-group
    reference stats, binned conditional counts — a drift check is a
    maintenance job, not a hot path), each fully partial-aggregated;
    everything after runs at |groups|·nbins cardinality."""
    mid = df.agg(
        F.floor(
            (
                F.unix_micros(F.min(ts_col)) + F.unix_micros(F.max(ts_col))
            )
            / F.lit(2)
        )
        .cast("long")
        .alias("mid_us")
    )
    j0 = (
        df.select(by, value_col, F.unix_micros(F.col(ts_col)).alias("t_us"))
        .where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(mid))
    )
    is_ref = F.col("t_us") < F.col("mid_us")
    stats = (
        j0.where(is_ref)
        .groupBy(by)
        .agg(
            F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
        )
    )
    j = j0.join(F.broadcast(stats), by)
    width = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    bin_ = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor((F.col(value_col) - F.col("mn")) / width), F.lit(0)
                ),
                F.lit(nbins - 1),
            )
        )
        .cast("int")
    )
    counts = j.groupBy(F.col(by), bin_.alias("bin")).agg(
        F.sum(is_ref.cast("long")).alias("ref_cnt"),
        F.sum((~is_ref).cast("long")).alias("cur_cnt"),
    )
    from pyspark.sql.window import Window

    wt = Window.partitionBy(by)
    totals = counts.withColumn("ref_n", F.sum("ref_cnt").over(wt)).withColumn(
        "cur_n", F.sum("cur_cnt").over(wt)
    )
    p = F.col("ref_cnt").cast("double") / F.col("ref_n")
    q = F.col("cur_cnt").cast("double") / F.col("cur_n")
    both = (F.col("ref_cnt") > 0) & (F.col("cur_cnt") > 0)
    term = F.when(both, F.round((q - p) * F.log(q / p), 9)).otherwise(F.lit(0.0))
    return totals.groupBy(by).agg(
        F.max("ref_n").alias("ref_n"),
        F.max("cur_n").alias("cur_n"),
        F.sum(both.cast("long")).alias("n_bins_used"),
        F.sum((~both).cast("long")).alias("n_bins_skipped"),
        F.round(
            F.sum(term.cast("decimal(38,10)")).cast("double"), 6
        ).alias("psi"),
    )

"""Read-side query surface — the reference's Streamlit/notebook analytics
(/root/reference/app/streamlit_app.py, notebooks/viz_duckdb.ipynb) as Spark
operators.

The reference reads its sink with DuckDB SQL + pandas pivots; here the same
queries are DataFrame ops so they run distributed against the engine's own
sink table (or any DataFrame) instead of collecting to a single client.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realtime_market_data_pipeline_spark.functions.core import normalize_symbol


def time_range_filter(
    df: DataFrame,
    ts_col: str = "window_end",
    lower=None,
    upper=None,
    last_minutes: int | None = None,
) -> DataFrame:
    """Time-range predicate (streamlit_app.py:25-27 ``window_end > now() -
    INTERVAL n MINUTE``). Fixed bounds (lower/upper) are the deterministic,
    oracle-checkable form; ``last_minutes`` reproduces the wall-clock form.

    The predicate is a plain comparison on a timestamp column → Catalyst
    pushes it into the parquet scan (min/max row-group pruning), which is the
    scale path: a time-partitioned 100 TB sink reads only matching partitions.
    """
    c = F.col(ts_col)
    if last_minutes is not None:
        df = df.filter(c > F.current_timestamp() - F.expr(f"INTERVAL {int(last_minutes)} MINUTES"))
    if lower is not None:
        df = df.filter(c >= F.lit(lower))
    if upper is not None:
        df = df.filter(c < F.lit(upper))
    return df


def symbol_filter(df: DataFrame, symbols: Sequence[str], col: str = "symbol") -> DataFrame:
    """Membership filter with the reference's upper/strip normalization
    (streamlit_app.py:30-32)."""
    keep = [s.strip().upper() for s in symbols]
    return df.filter(normalize_symbol(col).isin(keep))


def kpi_summary(df: DataFrame, value_cols: Sequence[str] = ("latency_ms",)) -> DataFrame:
    """Global KPIs (streamlit_app.py:54-64): total rows + mean of each metric.
    Single full-aggregate — Catalyst does a partial agg per partition then a
    1-row final, so it is scan-bound, never shuffle-bound."""
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in value_cols:
        aggs.append(F.avg(c).alias(f"avg_{c}"))
    return df.agg(*aggs)


def pivot_last(
    df: DataFrame,
    index_col: str,
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Long → wide pivot taking the last value per cell — the reference's
    ``pivot_table(aggfunc='last')`` on ts-ordered rows (streamlit_app.py:69-79).

    pandas 'last' relies on input order; distributed Spark has no such order,
    so the deterministic equivalent is ``max_by(value, order_col)`` per cell.
    Passing ``pivot_values`` explicitly skips the extra distinct-values job
    Spark otherwise runs — required practice at scale.
    """
    agg = (
        F.max_by(value_col, order_col) if order_col is not None else F.last(value_col)
    )
    return (
        df.groupBy(index_col)
        .pivot(pivot_col, list(pivot_values))
        .agg(agg.alias(value_col))
    )


def dedup_last_write_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse the update-mode duplicate-rows trap (SURVEY.md §2.2): keep the
    newest row per key. ``row_number`` over (keys ordered by order_col desc)
    — one shuffle on keys; at scale prefer this over groupBy+struct-max when
    the full row (not one value) must survive."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Top-K rows per group via rank window (engine surface for the
    reference's keep-last-N pattern, streamlit_app.py:102-104).

    Catalyst plans this as a single hash-partition on group_cols + in-partition
    sort with a rank-limit pushdown (WindowGroupLimit) — no global sort, so it
    scales linearly in partitions."""
    direction = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [direction] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def top_k(df: DataFrame, order_col: str | Column, k: int, ascending: bool = False) -> DataFrame:
    """Global top-k: orderBy + limit. Spark executes this as TakeOrdered
    (per-partition heap + driver merge of k rows) — never a full global sort."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    return df.orderBy(c.asc() if ascending else c.desc()).limit(k)

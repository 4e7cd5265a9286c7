"""Temporal joins Spark lacks natively: as-of join and bucketed range join.

These are the classic market-data enrichment operators (trade ↔ most recent
quote; event ↔ containing interval). Neither exists as a DataFrame primitive,
and the naive formulations explode at scale (a range-condition θ-join becomes
a nested-loop or a per-key cross product). Both operators here compile to
equi-shuffle + in-partition work:

- ``asof_join``: union both sides, one window forward-fill per key ordered by
  time — one shuffle on the key, one in-partition sort, zero row blowup.
  This is the standard distributed as-of pattern (quote forward-fill).
- ``range_join_bucketed``: intervals are exploded to the fixed-width time
  buckets they cover; points equi-join on (key, bucket) and a residual
  filter keeps exact containment. Join fan-out is bounded by
  interval_length/bucket_width per interval instead of points×intervals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with the same key and ``right.ts <= left.ts`` (ties: the right row at
    the exact timestamp is visible). Left rows with no prior right row get
    NULL payloads (left-join semantics).

    ``tolerance``: optional max staleness (e.g. "1 hour") — payloads older
    than that are nulled, like pandas merge_asof(tolerance=...).

    Plan: unionByName(left, right) → window last(ignorenulls) per key
    ordered by (ts, side) → keep left rows. One hash shuffle on keys; the
    sort is per-partition. At 100 TB this beats any range-join formulation
    because no row is ever duplicated."""
    keys = list(keys)
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        *keys,
        F.col(ts_col),
        F.col(ts_col).alias("_right_ts"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    ).withColumn("_side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("_right_ts", ignorenulls=True).over(w).alias("_asof_ts"),
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1)
    fresh: Column = F.lit(True)
    if tolerance is not None:
        fresh = F.col("_asof_ts") >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
    return out.select(
        *lcols,
        F.when(fresh, F.col("_asof_ts")).alias("asof_ts"),
        *[F.when(fresh, F.col(f"_f_{c}")).alias(c) for c in payload_cols],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Join each point to every interval (same key) containing it:
    ``start <= ts < end``.

    Instead of an inequality join (nested-loop / per-key cross product),
    each interval is exploded to the ``bucket``-width epochs it overlaps and
    points join on (keys, bucket) before an exact residual filter. Choose
    ``bucket`` near the typical interval length: fan-out per interval is
    ceil(len/bucket)+1 while each point probes exactly one bucket."""
    from realtime_market_data_pipeline_spark.functions.core import duration_seconds

    keys = list(keys)
    bucket_s = duration_seconds(bucket)
    p = points.withColumn(
        "_bucket", (F.unix_timestamp(point_ts) / bucket_s).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / bucket_s).cast("long"),
                # end is exclusive, but a partial last bucket still overlaps
                (F.unix_timestamp(end_col) / bucket_s).cast("long"),
            )
        ),
    )
    joined = p.join(iv, [*keys, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bucket")

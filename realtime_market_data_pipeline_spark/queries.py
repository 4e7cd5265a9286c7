"""Named query registry — the oracle-checked surface of the engine.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered together
with the ANSI-SQL oracle DuckDB runs over the same parquet tables
(__spark_entry__.py contract). Conventions that keep the hash-compare honest:

- every computed column is aliased identically in Spark and SQL;
- floating aggregates that accumulate in engine-dependent order (sums, avgs,
  stddev, log of ratios) are rounded — 6 dp for small-magnitude values,
  4 dp for money sums — on BOTH sides, so libm/summation-order ulps don't
  flip the hash;
- picked values (min_by/max_by/min/max) are left exact: both engines return
  the same stored double;
- ordering inside a query only matters where row identity depends on it
  (row_number) — there we order by a unique tiebreak so both engines agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.io import load_table
from realtime_market_data_pipeline_spark.operators import features as feat
from realtime_market_data_pipeline_spark.operators import readside

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# Shared oracle scaffolding: events adapted to the tick contract
# (FIXTURES.md §D mapping), identical to operators.features.ticks_from_events.
_TICKS_CTE = (
    "ticks AS (SELECT event_type AS symbol, value AS price, ts AS event_time,"
    " epoch_ms(ts) AS event_time_ms FROM events)"
)


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


# ---------------------------------------------------------------------------
# Core feature engine (reference compute_features; SURVEY.md §2.5/§2.6)
# ---------------------------------------------------------------------------

_FEATURES_ORACLE_TEMPLATE = """
WITH {ticks_cte},
win AS (
  SELECT symbol,
         make_timestamp(((epoch_ms(event_time) // {slide_ms}) - o.i) * {slide_ms} * 1000) AS window_start,
         price, event_time, event_time_ms
  FROM ticks
  CROSS JOIN (SELECT unnest(range({n_slides})) AS i) o
),
agg AS (
  SELECT symbol, window_start,
         arg_min(price, event_time) AS first_price,
         arg_max(price, event_time) AS last_price,
         count(price) AS num_ticks,
         max(event_time_ms) AS max_event_time_ms
  FROM win
  GROUP BY symbol, window_start
)
SELECT symbol, window_start,
       window_start + INTERVAL {window_s} SECOND AS window_end,
       first_price, last_price,
       round(CASE WHEN first_price > 0 AND last_price > 0
             THEN ln(last_price / first_price) END, 6) AS log_return,
       round(CASE WHEN first_price > 0 AND last_price > 0
             THEN abs(ln(last_price / first_price)) / sqrt(num_ticks + 1) END, 6) AS volatility,
       num_ticks, max_event_time_ms
FROM agg
"""


def _features_oracle(window_s: int, slide_s: int | None = None) -> str:
    slide_s = slide_s or window_s
    assert window_s % slide_s == 0
    return _FEATURES_ORACLE_TEMPLATE.format(
        ticks_cte=_TICKS_CTE,
        slide_ms=slide_s * 1000,
        window_s=window_s,
        n_slides=window_s // slide_s,
    )


def _features_query(window: str, slide: str | None = None) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ticks = feat.ticks_from_events(load_table(spark, sf_dir, "events"))
        out = feat.compute_features(ticks, window=window, slide=slide)
        # column order must match the oracle's SELECT for readability; the
        # driver sorts columns by name anyway.
        return _round6(out, "log_return", "volatility")

    return run


query("features_tumbling_1h", _features_oracle(3600))(_features_query("1 hour"))
query("features_tumbling_1d", _features_oracle(86400))(_features_query("1 day"))
query("features_sliding_6h_1h", _features_oracle(6 * 3600, 3600))(
    _features_query("6 hours", "1 hour")
)


@query(
    "realized_vol_1d",
    oracle=f"""
WITH {_TICKS_CTE},
r AS (
  SELECT symbol, event_time,
         CASE WHEN price > 0 AND lag(price) OVER w > 0
              THEN ln(price / (lag(price) OVER w)) END AS tick_return
  FROM ticks
  WINDOW w AS (PARTITION BY symbol ORDER BY event_time)
)
SELECT symbol,
       make_timestamp((epoch_ms(event_time) // 86400000) * 86400000 * 1000) AS window_start,
       make_timestamp(((epoch_ms(event_time) // 86400000) + 1) * 86400000 * 1000) AS window_end,
       round(stddev_samp(tick_return), 6) AS realized_vol,
       count(tick_return) AS num_returns
FROM r
GROUP BY 1, 2, 3
""",
)
def realized_vol_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful-intent intra-window volatility (SURVEY.md §2.7 W1)."""
    ticks = feat.ticks_from_events(load_table(spark, sf_dir, "events"))
    out = feat.intra_window_volatility(ticks, window="1 day")
    return _round6(out, "realized_vol")


# ---------------------------------------------------------------------------
# Read-side surface (SURVEY.md §2.3/§2.7: time-range filter, KPIs, pivot,
# top-k, dedup)
# ---------------------------------------------------------------------------


@query(
    "events_time_range",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
""",
)
def events_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic form of the UI time-range scan (streamlit_app.py:23-28);
    predicate pushes down to the parquet scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return readside.time_range_filter(
        ev, "ts", lower="2024-01-10 00:00:00", upper="2024-01-20 00:00:00"
    )


@query(
    "kpi_summary",
    oracle="""
SELECT count(*) AS total_rows, round(avg(value), 6) AS avg_value
FROM events
""",
)
def kpi_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UI KPI row (streamlit_app.py:54-64) over events."""
    out = readside.kpi_summary(
        load_table(spark, sf_dir, "events"), value_cols=("value",)
    )
    return _round6(out, "avg_value")


@query(
    "topk_per_type",
    oracle="""
SELECT event_id, ts, event_type, value
FROM (
  SELECT event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 5
""",
)
def topk_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via rank window (SURVEY.md §2.7 W3)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    return readside.topk_per_group(
        ev, ["event_type"], "value", k=5, tiebreak=["event_id"]
    )


_PIVOT_COLS = ",\n       ".join(
    f"arg_max(value, ts) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES
)


@query(
    "pivot_last_daily",
    oracle=f"""
SELECT make_timestamp((epoch_ms(ts) // 86400000) * 86400000 * 1000) AS day,
       {_PIVOT_COLS}
FROM events
GROUP BY 1
""",
)
def pivot_last_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with last-write-wins cells — the reference's pandas
    ``pivot_table(aggfunc='last')`` (streamlit_app.py:69-79) made
    deterministic via max_by(value, ts)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.timestamp_millis((F.unix_millis("ts") / F.lit(86400000)).cast("long") * 86400000)
    )
    return readside.pivot_last(
        ev, "day", "event_type", "value", EVENT_TYPES, order_col="ts"
    )


@query(
    "dedup_last_write_wins",
    oracle="""
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def dedup_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep newest row per (user_id, event_type) — the §2.2 update-mode trap
    resolved reader-side."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    return readside.dedup_last_write_wins(
        ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"]
    )


# ---------------------------------------------------------------------------
# Entry points used by __spark_entry__.py
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship query: the reference's full feature table (tumbling windows)
    over the events-as-ticks mapping."""
    return QUERIES["features_tumbling_1h"](spark, sf_dir)

"""Tiered OHLC bar rollup — the continuous-aggregate / hypertable-rollup
pattern: coarse bars are composed FROM finer bars, never by re-scanning raw
ticks.

At 100 TB this is the only sane shape for multi-resolution analytics: the
raw scan happens once (finest tier); every coarser tier aggregates ~60×
fewer rows than the one below it, so the whole pyramid costs barely more
than the finest tier alone. The composition is exact because every bar
statistic is chosen to be decomposable:

- open/close: ``min_by``/``max_by`` over bar_start — the earliest/latest
  non-empty fine bar carries the tick that opens/closes the coarse bar;
- high/low: max/min are associative;
- n_ticks: sums;
- sum_price: summed in DECIMAL(38,10), so re-aggregation order cannot
  change the value (float sums are order-dependent; decimal sums are not).

Streaming form: feed ``ohlc_bars`` from a watermarked stream and upsert
each tier with ``sinks.idempotent_parquet_writer`` / a foreachBatch MERGE —
the same incremental-refresh contract TimescaleDB-style continuous
aggregates provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,10)"

BAR_COLS = (
    "symbol",
    "bar_start",
    "bar_end",
    "open_price",
    "high_price",
    "low_price",
    "close_price",
    "n_ticks",
    "sum_price",
)


def ohlc_bars(
    ticks: DataFrame, bar: str = "1 minute", watermark: str | None = None
) -> DataFrame:
    """Finest tier: per-symbol OHLC bars directly from ticks. One shuffle on
    (symbol, window); partial aggregation shrinks the map side to one row
    per bar per partition before the exchange.

    Works unchanged on a tick STREAM: pass ``watermark`` to bound state and
    sink each micro-batch's updated bars with an idempotent upsert
    (streaming/sinks) — that pair is the incremental tier refresh."""
    if watermark is not None:
        ticks = ticks.withWatermark("event_time", watermark)
    agged = ticks.groupBy("symbol", F.window("event_time", bar).alias("w")).agg(
        F.min_by("price", "event_time_ms").alias("open_price"),
        F.max("price").alias("high_price"),
        F.min("price").alias("low_price"),
        F.max_by("price", "event_time_ms").alias("close_price"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.col("price").cast(_DEC)).alias("sum_price"),
    )
    return agged.select(
        "symbol",
        F.col("w.start").alias("bar_start"),
        F.col("w.end").alias("bar_end"),
        *BAR_COLS[3:],
    )


def rollup_ohlc(bars: DataFrame, coarse: str) -> DataFrame:
    """Compose coarser bars from finer bars (any tier → any coarser tier
    whose duration is a multiple). Input and output share the BAR_COLS
    contract, so tiers chain: 1m → 15m → 1h → 1d."""
    agged = bars.groupBy("symbol", F.window("bar_start", coarse).alias("w")).agg(
        F.min_by("open_price", "bar_start").alias("open_price"),
        F.max("high_price").alias("high_price"),
        F.min("low_price").alias("low_price"),
        F.max_by("close_price", "bar_start").alias("close_price"),
        F.sum("n_ticks").alias("n_ticks"),
        F.sum("sum_price").alias("sum_price"),
    )
    return agged.select(
        "symbol",
        F.col("w.start").alias("bar_start"),
        F.col("w.end").alias("bar_end"),
        *BAR_COLS[3:],
    )


def finalize_bars(bars: DataFrame) -> DataFrame:
    """Presentation projection: replace the decomposable ``sum_price``
    carrier with the derived ``avg_price`` (6 dp)."""
    return bars.select(
        *BAR_COLS[:8],
        F.round(F.col("sum_price").cast("double") / F.col("n_ticks"), 6).alias(
            "avg_price"
        ),
    )


def gapfill_locf(ticks: DataFrame, grain: str = "minute") -> DataFrame:
    """Time-bucket gap-filling with last-observation-carried-forward — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` pair, relationally: per
    symbol, a dense bucket spine spans first..last observed bucket
    (``sequence`` + explode), empty buckets join as NULL and carry the
    previous bucket's (decimal-exact, 6-dp) average price forward via an
    ignore-nulls last() window. ``is_gap`` marks filled rows.

    Scale shape: the only tick-cardinality operation is the first bucket
    aggregation (map-side combined); spine generation, the spine⟕bars join
    and the LOCF window all run on BAR cardinality (≈ minutes × symbols),
    orders of magnitude smaller. The LOCF window is per-symbol — never a
    global sort. Leading gaps cannot occur (each symbol's spine starts at a
    bucket that has data), so price_locf is never NULL."""
    from pyspark.sql.window import Window

    j = _dense_spine_join(ticks, grain)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "symbol",
        "bucket_ts",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_ticks"),
        F.last("avg_p", ignorenulls=True).over(w).alias("price_locf"),
        F.col("n").isNull().alias("is_gap"),
    )


def _dense_spine_join(ticks: DataFrame, grain: str) -> DataFrame:
    """Shared gap-fill scaffolding: bucket ticks to (symbol, bucket_ts, n,
    avg_p), then left-join onto the per-symbol dense bucket spine spanning
    first..last observed bucket. Gap rows carry NULL n/avg_p."""
    b = ticks.groupBy(
        "symbol", F.date_trunc(grain, "event_time").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("price").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_p"),
    )
    step = {"minute": "interval 1 minute", "hour": "interval 1 hour"}[grain]
    spine = (
        b.groupBy("symbol")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "symbol",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(step))
            ).alias("bucket_ts"),
        )
    )
    return spine.join(b, ["symbol", "bucket_ts"], "left")


def gapfill_interpolate(ticks: DataFrame, grain: str = "minute") -> DataFrame:
    """Gap-filling with LINEAR interpolation — the TimescaleDB
    ``time_bucket_gapfill`` + ``interpolate`` pair: each empty bucket gets
    the time-weighted blend of the nearest observed bucket on each side,
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)``. Observed
    buckets keep their exact 6-dp average.

    Same scale shape as ``gapfill_locf`` (everything past the first agg at
    bar cardinality, per-symbol windows only). Determinism: prev/next are
    6-dp doubles, the time ratio is a correctly-rounded quotient of exact
    integers, and the blend's operand order is fixed — identical IEEE
    arithmetic in any engine. Interior gaps always have both neighbors
    (the spine spans observed buckets), so price_interp is never NULL."""
    from pyspark.sql.window import Window

    j = _dense_spine_join(ticks, grain)
    wp = (
        Window.partitionBy("symbol")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # "nearest observed bucket AFTER this row" via a DESCENDING
    # running frame, NOT first(...) over (0, unboundedFollowing):
    # Spark evaluates an unbounded-FOLLOWING frame by rescanning
    # current..end for every row — O(rows²) per symbol (measured 198 s
    # for a 43k-bucket symbol at sf0.01, 600x the engine-expected
    # cost), while the unbounded-PRECEDING frame is incremental. Same
    # exchange, one extra in-partition sort, O(n log n) total.
    wn = (
        Window.partitionBy("symbol")
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_ts = F.when(F.col("n").isNotNull(), F.col("bucket_ts"))
    t = F.unix_timestamp("bucket_ts")
    tp = F.unix_timestamp(F.last(obs_ts, ignorenulls=True).over(wp))
    tn = F.unix_timestamp(F.last(obs_ts, ignorenulls=True).over(wn))
    pp = F.last("avg_p", ignorenulls=True).over(wp)
    pn = F.last("avg_p", ignorenulls=True).over(wn)
    ratio = (t - tp).cast("double") / (tn - tp).cast("double")
    return j.select(
        "symbol",
        "bucket_ts",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_ticks"),
        F.when(F.col("n").isNotNull(), F.col("avg_p"))
        # The blend routinely lands on exact decimal ties (ratio 1/2 over
        # 6-dp inputs -> ...5 in the 7th digit), where double-rounding
        # diverges across engines; round in DECIMAL space instead, where
        # every engine rounds half away from zero.
        .otherwise(
            F.round((pp + (pn - pp) * ratio).cast("decimal(38,10)"), 6).cast(
                "double"
            )
        )
        .alias("price_interp"),
        F.col("n").isNull().alias("is_gap"),
    )


def counter_agg(
    events: DataFrame,
    entity_col: str = "symbol",
    ts_col: str = "event_time",
    value_col: str = "price",
    grain: str = "day",
) -> DataFrame:
    """Monotonic-counter aggregation per (entity, bucket) — the TimescaleDB
    ``counter_agg`` / ``delta`` / ``num_resets`` / ``rate`` hyperfunction
    family: a sample that is LOWER than its predecessor means the counter
    reset, and the post-reset value counts from zero (idelta = value, not
    value − lag). delta = Σ idelta over the bucket, rate = delta divided by
    the observed timespan. A gauge input simply exercises the reset path on
    every down-move; semantics follow the counter contract regardless.

    Determinism: per-row ideltas are identical-operand IEEE subtractions,
    rounded to 6 dp and summed in DECIMAL (order-free); rate rounds the
    final ratio. The lag() window and the bucket agg share (entity, bucket)
    partitioning attributes -> ONE exchange, output at bucket cardinality."""
    bucketed = events.select(
        F.col(entity_col).alias("entity"),
        F.date_trunc(grain, ts_col).alias("bucket_ts"),
        F.col(value_col).alias("v"),
        F.col(ts_col).alias("t"),
    )
    w = Window.partitionBy("entity", "bucket_ts").orderBy("t")
    d = F.col("v") - F.lag("v").over(w)
    stepped = bucketed.select(
        "entity",
        "bucket_ts",
        "v",
        "t",
        F.when(d < 0, F.lit(1)).otherwise(F.lit(0)).alias("is_reset"),
        F.round(
            F.when(d.isNull(), F.lit(0.0)).when(d < 0, F.col("v")).otherwise(d),
            6,
        )
        .cast(_DEC)
        .alias("idelta"),
    )
    span_s = (
        F.unix_micros(F.max("t")) - F.unix_micros(F.min("t"))
    ).cast("double") / F.lit(1000000.0)
    return stepped.groupBy("entity", "bucket_ts").agg(
        F.round(F.sum("idelta").cast("double"), 6).alias("counter_delta"),
        F.sum("is_reset").alias("num_resets"),
        F.when(
            F.unix_micros(F.max("t")) > F.unix_micros(F.min("t")),
            F.round(F.sum("idelta").cast("double") / span_s, 6),
        ).alias("rate_per_s"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def state_agg(
    events: DataFrame,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-in-state rollup — the TimescaleDB ``state_agg`` analog: an
    entity occupies a state from one event until its NEXT event (LOCF),
    the entity's last event holding no duration. Level 1 charges exact
    microseconds to (entity, state); level 2 rolls up per state across
    entities.

    Shuffle shape: the lead() window partitions on entity; the level-1 agg
    on (entity, state) rides that same hash partitioning (subset rule), so
    level 1 is ONE exchange at event cardinality and level 2 one more at
    entities x states cardinality — negligible at any scale."""
    w = Window.partitionBy("entity").orderBy("t")
    intervals = events.select(
        F.col(entity_col).alias("entity"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("t"),
    ).select(
        "entity",
        "state",
        (F.unix_micros(F.lead("t").over(w)) - F.unix_micros(F.col("t"))).alias(
            "dt_us"
        ),
    )
    per_entity = intervals.groupBy("entity", "state").agg(
        # an entity's final event holds no duration -> null dt; a state
        # seen only as final events must still roll up as 0, not NULL
        # (the driver's row sort chokes on nullable leading columns)
        F.coalesce(F.sum("dt_us"), F.lit(0)).alias("dur_us"),
        F.count(F.lit(1)).alias("n_entries"),
    )
    # level-2 sums in DECIMAL(38,0): entities x timespan microseconds can
    # exceed int64 at cluster scale
    total_us = F.sum(F.col("dur_us").cast("decimal(38,0)"))
    return per_entity.groupBy("state").agg(
        F.round(total_us.cast("double") / F.lit(1000000.0), 6).alias(
            "total_time_s"
        ),
        F.sum("n_entries").alias("n_entries"),
        F.count(F.lit(1)).alias("n_entities"),
        F.round(
            total_us.cast("double") / F.lit(1000000.0) / F.count(F.lit(1)),
            6,
        ).alias("avg_time_per_entity_s"),
    )

"""Quant analytics over bar series — max drawdown, Bollinger bands, and
pairwise return correlation (the read-side indicator queries a market-data
pipeline's consumers run; reference scope: dashboards/api readers over the
feature store, e.g. app/streamlit_app.py's indicator panels).

All three operate on MINUTE-BAR cardinality (symbols × minutes), never on
raw ticks: the single tick-cardinality stage is the ``ohlc_bars`` bucket
aggregation (map-side combined, one exchange), after which every window /
join / correlation runs on a relation that is orders of magnitude smaller.
Per-symbol windows sort within a symbol's partition only — never a global
sort — so the shapes hold unchanged at 100 TB.

Cross-engine determinism discipline (see queries.py module docstring): the
bar price is the decimal-exact minute average rounded to 6 dp, so every
engine starts from bit-identical doubles; downstream float arithmetic is
either identical-operand IEEE ops (ratios, comparisons) or rounded
aggregates (stddev, corr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,10)"


def minute_avg_bars(ticks: DataFrame, grain: str = "minute") -> DataFrame:
    """(symbol, bucket_ts, avg_p): decimal-exact per-bucket average price,
    6 dp. One shuffle; partial agg shrinks the map side to one row per bar."""
    return ticks.groupBy(
        "symbol", F.date_trunc(grain, "event_time").alias("bucket_ts")
    ).agg(
        F.round(
            F.sum(F.col("price").cast(_DEC)).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("avg_p"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def max_drawdown(bars: DataFrame) -> DataFrame:
    """Per-symbol maximum drawdown of the bar-price series: running peak via
    an unbounded-preceding window, drawdown = price/peak − 1 (≤ 0), reported
    as the series minimum. Window is per-symbol (no global sort); the final
    agg is 1 row per symbol."""
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = bars.select(
        "symbol",
        "bucket_ts",
        F.round(F.col("avg_p") / F.max("avg_p").over(w) - 1.0, 6).alias("dd"),
    )
    return dd.groupBy("symbol").agg(
        F.min("dd").alias("max_drawdown"),
        F.count(F.lit(1)).alias("n_bars"),
    )


def bollinger_stats(bars: DataFrame, n: int = 20, k: float = 2.0) -> DataFrame:
    """Bollinger-band summary per symbol: trailing-``n``-bar mid (decimal
    mean) and stddev band, counted breaches above/below, and max relative
    bandwidth. Only full windows (exactly ``n`` trailing bars) are
    evaluated.

    Determinism: mid and sd are rounded to 6 dp, after which the band
    edges, comparisons, and bandwidth are identical-operand IEEE arithmetic
    in both engines; breach counts are integer."""
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket_ts")
        .rowsBetween(-(n - 1), 0)
    )
    banded = bars.select(
        "symbol",
        "avg_p",
        F.count("avg_p").over(w).alias("w_n"),
        F.round(
            F.sum(F.col("avg_p").cast(_DEC)).over(w).cast("double")
            / F.count("avg_p").over(w),
            6,
        ).alias("mid"),
        F.round(F.stddev_samp("avg_p").over(w), 6).alias("sd"),
    ).where(F.col("w_n") == n)
    kk = F.lit(float(k))
    return banded.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(
            (F.col("avg_p") > F.col("mid") + kk * F.col("sd")).cast("long")
        ).alias("n_breach_up"),
        F.sum(
            (F.col("avg_p") < F.col("mid") - kk * F.col("sd")).cast("long")
        ).alias("n_breach_down"),
        F.max(
            F.round(2.0 * kk * F.col("sd") / F.col("mid"), 6)
        ).alias("max_bandwidth"),
    )


def twap(ticks: DataFrame, grain: str = "day") -> DataFrame:
    """Time-weighted average price per (symbol, bucket) — the TimescaleDB
    ``time_weight('locf', ...)`` analog: each tick's price holds until the
    next tick in the same bucket, so it is weighted by that interval; the
    bucket's last tick contributes no weight (its plateau extends past the
    bucket edge). Buckets with a single tick fall back to the plain price.

    Determinism: price is rounded to 6 dp then lifted to an exact integer
    micro-price, weights are exact microsecond integers, and the weighted
    sum runs in DECIMAL(38,0) — pure integer arithmetic, order-free and
    engine-identical; only the final ratio is rounded. One
    tick-cardinality window (per symbol-bucket, never global); the final
    agg groups on the window's own partitioning attributes, so the whole
    pipeline is a single exchange."""
    bucketed = ticks.select(
        "symbol",
        F.date_trunc(grain, "event_time").alias("bucket_ts"),
        "price",
        "event_time",
    )
    # partition by the materialized bucket_ts ATTRIBUTE (not a fresh
    # date_trunc expression) so the downstream groupBy on the same
    # attributes reuses this exchange instead of adding a second one
    w = Window.partitionBy("symbol", "bucket_ts").orderBy("event_time")
    dt = (
        F.unix_micros(F.lead("event_time").over(w))
        - F.unix_micros(F.col("event_time"))
    ).alias("dt_us")
    # exact integer micro-price: round(price,6) has <=6 dp, so *1e6 is
    # within 1e-6 of an integer and the second round recovers it exactly
    p_micro = F.round(F.round("price", 6) * F.lit(1000000.0), 0).cast(
        "decimal(19,0)"
    )
    weighted = bucketed.select("symbol", "bucket_ts", "price", dt).withColumn(
        "pw", p_micro * F.col("dt_us").cast("decimal(19,0)")
    )
    return weighted.groupBy("symbol", "bucket_ts").agg(
        F.when(
            F.sum("dt_us") > 0,
            F.round(
                F.sum("pw").cast("double")
                / F.sum("dt_us")
                / F.lit(1000000.0),
                6,
            ),
        )
        .otherwise(F.round(F.max("price"), 6))
        .alias("twap"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def daily_close_bars(ticks: DataFrame) -> DataFrame:
    """(symbol, day_ts, close, day_idx): per-symbol daily close — the price
    of the day's last tick (event-time ``max_by``, matching the feature
    engine's last_price semantics) — plus a 1-based day index for the
    recursive indicators. One shuffle (map-side combined tick→day agg); the
    row_number window runs at daily-bar cardinality on the same symbol
    partitioning. close is a picked stored double — exact, no rounding
    needed."""
    bars = ticks.groupBy(
        "symbol", F.date_trunc("day", "event_time").alias("day_ts")
    ).agg(F.max_by("price", "event_time").alias("close"))
    w = Window.partitionBy("symbol").orderBy("day_ts")
    return bars.withColumn("day_idx", F.row_number().over(w))


def ema_macd(
    bars: DataFrame, fast: int = 12, slow: int = 26, signal: int = 9
) -> DataFrame:
    """MACD over the daily-close series: EMA(fast) − EMA(slow), plus the
    EMA(signal) line of the MACD itself. Each EMA is the standard
    α·xₜ + (1−α)·emaₜ₋₁ recursion, α = 2/(n+1), seeded at the series'
    first observation (MACD's signal seeds at the first MACD value, 0).

    The recursion is inherently sequential per symbol — the one shape the
    DataFrame algebra cannot express — so it runs as an Arrow-batched
    ``applyInPandas`` over the per-symbol group, ordered by day. Scale
    shape: the input is DAILY-BAR cardinality (≈ 2.5k rows per symbol per
    decade), so a group is always small no matter how many ticks fed it;
    the tick→bar aggregation upstream is the only heavy stage and the
    groupBy(symbol) here reuses its shuffle key family. Determinism: the
    fold multiplies/adds the same IEEE doubles in the same order as the
    oracle's recursive CTE, so the raw values are bit-identical; outputs
    are rounded to 6 dp on both sides anyway."""
    import pandas as pd

    a_f, a_s, a_g = (2.0 / (n + 1.0) for n in (fast, slow, signal))
    out_schema = (
        "symbol string, day_ts timestamp, close double, "
        "ema_fast double, ema_slow double, macd double, macd_signal double"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day_idx").reset_index(drop=True)
        closes = pdf["close"].to_numpy()
        ef = es = eg = None
        rows_f, rows_s, rows_g = [], [], []
        for c in closes:
            c = float(c)
            ef = c if ef is None else a_f * c + (1.0 - a_f) * ef
            es = c if es is None else a_s * c + (1.0 - a_s) * es
            m = ef - es
            eg = m if eg is None else a_g * m + (1.0 - a_g) * eg
            rows_f.append(ef)
            rows_s.append(es)
            rows_g.append(eg)
        pdf = pdf[["symbol", "day_ts", "close"]].copy()
        pdf["ema_fast"] = rows_f
        pdf["ema_slow"] = rows_s
        pdf["macd"] = [f - s for f, s in zip(rows_f, rows_s)]
        pdf["macd_signal"] = rows_g
        return pdf

    folded = bars.groupBy("symbol").applyInPandas(fold, schema=out_schema)
    return folded.select(
        "symbol",
        "day_ts",
        "close",
        F.round("ema_fast", 6).alias("ema_fast"),
        F.round("ema_slow", 6).alias("ema_slow"),
        F.round("macd", 6).alias("macd"),
        F.round("macd_signal", 6).alias("macd_signal"),
    )


def rsi(bars: DataFrame, n: int = 14) -> DataFrame:
    """Relative Strength Index over the daily-close series, Wilder's
    smoothing as a running recursion: per-symbol day-over-day deltas split
    into gain/loss, RMAₜ = (RMAₜ₋₁·(n−1) + xₜ)/n seeded at the FIRST delta
    (the uniform-seed variant — every day from the second onward gets a
    value; the classic 14-bar-average seed only changes the first 14 rows'
    warmup). RSI = 100 − 100/(1 + RMA_gain/RMA_loss); all-loss-free series
    pin to 100.

    Same execution shape and determinism argument as ``ema_macd``: a
    per-symbol Arrow fold at daily-bar cardinality, arithmetic written in
    the exact association the oracle's recursive CTE uses
    ((prev·(n−1) + x)/n), output rounded to 6 dp both sides."""
    import pandas as pd

    nf = float(n)
    out_schema = "symbol string, day_ts timestamp, close double, rsi double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day_idx").reset_index(drop=True)
        closes = [float(c) for c in pdf["close"].to_numpy()]
        rg = rl = None
        out = [None]
        for prev, cur in zip(closes, closes[1:]):
            g = cur - prev if cur > prev else 0.0
            loss = prev - cur if prev > cur else 0.0
            rg = g if rg is None else (rg * (nf - 1.0) + g) / nf
            rl = loss if rl is None else (rl * (nf - 1.0) + loss) / nf
            out.append(100.0 if rl == 0.0 else 100.0 - 100.0 / (1.0 + rg / rl))
        pdf = pdf[["symbol", "day_ts", "close"]].copy()
        pdf["rsi"] = out
        return pdf

    folded = bars.groupBy("symbol").applyInPandas(fold, schema=out_schema)
    return folded.where(F.col("rsi").isNotNull()).select(
        "symbol", "day_ts", "close", F.round("rsi", 6).alias("rsi")
    )


def pairwise_return_corr(bars: DataFrame) -> DataFrame:
    """Correlation matrix (upper triangle) of per-bucket log returns across
    symbols: lag-1 log return per symbol (6 dp), inner-join aligned on
    bucket_ts, Pearson corr per (sym_a < sym_b) pair.

    Scale shape: a bucket_ts-keyed self-join would plan the tick-cardinality
    bar aggregation TWICE (one scan per join side); instead the alignment is
    a collect_list by bucket_ts (≤ symbols structs per group) and the pair
    generation is an in-row higher-order-function explosion — one raw scan,
    all-JVM, and the quadratic blowup is per-bucket (symbols², bounded),
    never a join blowup. corr partial-aggregates map-side; pair order
    inside the collected array is irrelevant (every unordered pair is
    emitted exactly once via the sym_a < sym_b filter)."""
    lw = Window.partitionBy("symbol").orderBy("bucket_ts")
    # a zero-priced bar has no log return — and under ANSI mode a zero
    # DIVISOR (the lagged bar) is a runtime DIVIDE_BY_ZERO that kills
    # the stage, which is exactly what happened when sf0.1 produced 4
    # bars whose 6-dp average rounded to 0 (r9; smaller SFs never hit
    # it). Returns are defined over the positive-priced bar series; the
    # lag spans excluded bars.
    rets = (
        bars.where(F.col("avg_p") > 0)
        .select(
            "symbol",
            "bucket_ts",
            F.round(
                F.log(F.col("avg_p") / F.lag("avg_p").over(lw)), 6
            ).alias("ret"),
        )
        .where(F.col("ret").isNotNull())
    )
    per_bucket = rets.groupBy("bucket_ts").agg(
        F.collect_list(F.struct("symbol", "ret")).alias("a")
    )
    pairs = per_bucket.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("a"),
                    lambda x: F.transform(
                        F.filter(F.col("a"), lambda y: y["symbol"] > x["symbol"]),
                        lambda y: F.struct(
                            x["symbol"].alias("sym_a"),
                            y["symbol"].alias("sym_b"),
                            x["ret"].alias("ret_a"),
                            y["ret"].alias("ret_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return pairs.groupBy("sym_a", "sym_b").agg(
        F.round(F.corr("ret_a", "ret_b"), 6).alias("ret_corr"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def daily_ohlc(ticks: DataFrame) -> DataFrame:
    """(symbol, day_ts, open, high, low, close, day_idx): per-symbol daily
    OHLC via event-time min_by/max_by picks plus extrema — all exact stored
    doubles — and a 1-based day index for the recursive indicators. Same
    single-exchange shape as ``daily_close_bars``."""
    bars = ticks.groupBy(
        "symbol", F.date_trunc("day", "event_time").alias("day_ts")
    ).agg(
        F.min_by("price", "event_time").alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by("price", "event_time").alias("close"),
    )
    w = Window.partitionBy("symbol").orderBy("day_ts")
    return bars.withColumn("day_idx", F.row_number().over(w))


def stochastic(bars: DataFrame, n: int = 14, d: int = 3) -> DataFrame:
    """Stochastic oscillator %K/%D over daily OHLC: %K = 100·(close −
    lowₙ)/(highₙ − lowₙ) on full n-day windows (flat windows yield NULL —
    guarded division), %D = the d-day mean of %K accumulated in DECIMAL so
    both engines agree in any order. Two stacked per-symbol windows over
    one bar-cardinality exchange."""
    win = (
        Window.partitionBy("symbol").orderBy("day_ts").rowsBetween(-(n - 1), 0)
    )
    w = bars.select(
        "symbol",
        "day_ts",
        "close",
        F.min("low").over(win).alias("low_n"),
        F.max("high").over(win).alias("high_n"),
        F.count(F.lit(1)).over(win).alias("w_n"),
    ).where(F.col("w_n") == n)
    k = w.select(
        "symbol",
        "day_ts",
        F.when(
            F.col("high_n") > F.col("low_n"),
            F.round(
                F.lit(100.0)
                * (F.col("close") - F.col("low_n"))
                / (F.col("high_n") - F.col("low_n")),
                6,
            ),
        ).alias("pct_k"),
    )
    win2 = (
        Window.partitionBy("symbol").orderBy("day_ts").rowsBetween(-(d - 1), 0)
    )
    return k.select(
        "symbol",
        "day_ts",
        "pct_k",
        F.when(
            F.count(F.lit(1)).over(win2) == d,
            F.round(
                F.sum(F.col("pct_k").cast(_DEC)).over(win2).cast("double")
                / F.lit(float(d)),
                6,
            ),
        ).alias("pct_d"),
    )


def atr(bars: DataFrame, n: int = 14) -> DataFrame:
    """Average True Range (Wilder): TR = max(high−low, |high−prev_close|,
    |low−prev_close|) from day 2, smoothed by the same seeded RMA recursion
    as ``rsi`` ((prev·(n−1) + tr)/n, seeded at the first TR). Arrow fold per
    symbol at daily-bar cardinality; the oracle's recursive CTE replays the
    identical float arithmetic."""
    import pandas as pd

    nf = float(n)
    out_schema = "symbol string, day_ts timestamp, tr double, atr double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day_idx").reset_index(drop=True)
        h = [float(x) for x in pdf["high"]]
        lo = [float(x) for x in pdf["low"]]
        c = [float(x) for x in pdf["close"]]
        a = None
        trs, atrs = [None], [None]
        for i in range(1, len(c)):
            pc = c[i - 1]
            tr = max(h[i] - lo[i], abs(h[i] - pc), abs(lo[i] - pc))
            a = tr if a is None else (a * (nf - 1.0) + tr) / nf
            trs.append(tr)
            atrs.append(a)
        pdf = pdf[["symbol", "day_ts"]].copy()
        pdf["tr"] = trs
        pdf["atr"] = atrs
        return pdf

    folded = bars.groupBy("symbol").applyInPandas(fold, schema=out_schema)
    return folded.where(F.col("atr").isNotNull()).select(
        "symbol", "day_ts", "tr", F.round("atr", 6).alias("atr")
    )


def beta_vs_market(bars: DataFrame) -> DataFrame:
    """Market-model OLS per symbol: regress each symbol's daily log return
    on the equal-weight market return (the mean return of all symbols that
    day) — beta/alpha/R², the factor-exposure readout a market-data
    pipeline's risk consumers run over the feature store.

    Cross-engine exactness: returns are 6-dp-rounded doubles lifted to
    exact integer micro-returns (×10⁶), so every regression sum
    (Σx, Σy, Σxy, Σx², Σy²) is integer arithmetic in DECIMAL(38,0) —
    associative, shuffle-order-independent, and bit-identical in any
    engine. Only the final beta/alpha/R² divisions run in doubles (identical
    operands → identical IEEE results, 6-dp rounded). The market mean is
    itself snapped to an integer micro-return so both engines join on the
    same y.

    Scale shape: the tick→daily-bar aggregation upstream is the only
    row-linear stage. The lag window reuses the bars' symbol partitioning,
    the per-day market mean aggregates ≤ symbols rows per group, the join
    back is a broadcast (days-cardinality right side), and the final
    regression aggregate map-side-combines to one row per symbol."""
    lw = Window.partitionBy("symbol").orderBy("day_ts")
    rets = (
        bars.select(
            "symbol",
            "day_ts",
            F.round(F.log(F.col("close") / F.lag("close").over(lw)), 6).alias("ret"),
        )
        .where(F.col("ret").isNotNull())
        .select(
            "symbol",
            "day_ts",
            F.round(F.col("ret") * F.lit(1000000.0), 0).cast("long").alias("xi"),
        )
    )
    mkt = rets.groupBy("day_ts").agg(
        F.round(F.sum("xi").cast("double") / F.count(F.lit(1)), 0)
        .cast("long")
        .alias("yi")
    )
    d0 = "decimal(38,0)"
    j = rets.join(F.broadcast(mkt), "day_ts").select(
        "symbol", F.col("xi").cast(d0).alias("x"), F.col("yi").cast(d0).alias("y")
    )
    s = j.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_obs").cast(d0)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("syy") - F.col("sy") * F.col("sy")
    denx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = F.round(num.cast("double") / den.cast("double"), 6)
    mean_x = F.col("sx").cast("double") / F.col("n_obs") / F.lit(1000000.0)
    mean_y = F.col("sy").cast("double") / F.col("n_obs") / F.lit(1000000.0)
    return s.select(
        "symbol",
        "n_obs",
        beta.alias("beta"),
        F.round(mean_x - beta * mean_y, 6).alias("alpha"),
        F.round(
            num.cast("double") * num.cast("double") / (den * denx).cast("double"), 6
        ).alias("r2"),
    )

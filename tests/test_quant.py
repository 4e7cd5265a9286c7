"""Hand-computed checks for operators/quant.py (drawdown, Bollinger,
pairwise return correlation)."""

from __future__ import annotations

import math
import statistics
from datetime import datetime

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.quant import (
    bollinger_stats,
    max_drawdown,
    minute_avg_bars,
    pairwise_return_corr,
)


def _bars(spark, series):
    """series: {symbol: [price per consecutive minute]} -> bars DataFrame."""
    rows = [
        (sym, datetime(2026, 1, 1, 0, m), float(p))
        for sym, prices in series.items()
        for m, p in enumerate(prices)
    ]
    return spark.createDataFrame(
        rows, "symbol string, bucket_ts timestamp, avg_p double"
    )


def test_minute_avg_bars_decimal_mean(spark):
    ticks = spark.createDataFrame(
        [
            ("A", 10.0, datetime(2026, 1, 1, 0, 0, 10)),
            ("A", 20.5, datetime(2026, 1, 1, 0, 0, 50)),
            ("A", 7.0, datetime(2026, 1, 1, 0, 1, 0)),
        ],
        "symbol string, price double, event_time timestamp",
    )
    out = {r.bucket_ts.minute: r for r in minute_avg_bars(ticks).collect()}
    assert out[0].avg_p == 15.25 and out[0].n_ticks == 2
    assert out[1].avg_p == 7.0 and out[1].n_ticks == 1


def test_max_drawdown_by_hand(spark):
    bars = _bars(spark, {"A": [10, 20, 15, 5], "B": [3, 4]})
    out = {r.symbol: r for r in max_drawdown(bars).collect()}
    assert out["A"].max_drawdown == -0.75  # 5 against peak 20
    assert out["A"].n_bars == 4
    assert out["B"].max_drawdown == 0.0  # monotone series never draws down
    assert out["B"].n_bars == 2


def test_bollinger_by_hand(spark):
    # n=3, k=1: windows [10,10,13] -> breach up (13 > 11 + 1.732...),
    # [10,13,10] -> inside, [13,10,6] -> breach down (6 < 9.667 - 3.512).
    bars = _bars(spark, {"A": [10, 10, 13, 10, 6]})
    (row,) = bollinger_stats(bars, n=3, k=1.0).collect()
    assert (row.n_windows, row.n_breach_up, row.n_breach_down) == (3, 1, 1)
    sd_last = round(statistics.stdev([13, 10, 6]), 6)
    mid_last = round((13 + 10 + 6) / 3, 6)
    assert row.max_bandwidth == round(2.0 * 1.0 * sd_last / mid_last, 6)


def test_pairwise_corr_proportional_and_inverse(spark):
    # Y = 2X (identical log returns), Z reversed-ratio (negated returns).
    bars = _bars(
        spark,
        {"X": [10, 20, 10, 40], "Y": [20, 40, 20, 80], "Z": [40, 20, 40, 10]},
    )
    out = {(r.sym_a, r.sym_b): r for r in pairwise_return_corr(bars).collect()}
    assert set(out) == {("X", "Y"), ("X", "Z"), ("Y", "Z")}
    assert all(r.n_obs == 3 for r in out.values())
    assert out[("X", "Y")].ret_corr == 1.0
    assert out[("X", "Z")].ret_corr == -1.0
    assert out[("Y", "Z")].ret_corr == -1.0


def test_pairwise_corr_alignment_inner_join(spark):
    # Z missing minute 2 -> only overlapping return buckets correlate.
    bars = _bars(spark, {"X": [10, 20, 10, 40]}).union(
        _bars(spark, {"Z": [40, 20]}).withColumn(
            "bucket_ts", F.col("bucket_ts") + F.expr("interval 0 minutes")
        )
    )
    (row,) = pairwise_return_corr(bars).collect()
    assert (row.sym_a, row.sym_b, row.n_obs) == ("X", "Z", 1)
    # single-point correlation is undefined -> NULL in both engines
    assert row.ret_corr is None or math.isnan(row.ret_corr)


def test_twap_by_hand(spark):
    from realtime_market_data_pipeline_spark.operators.quant import twap

    ticks = spark.createDataFrame(
        [
            # hour 0: price 10 holds 30 min, 20 holds 15 min, 40 unweighted
            ("A", 10.0, datetime(2026, 1, 1, 0, 0, 0)),
            ("A", 20.0, datetime(2026, 1, 1, 0, 30, 0)),
            ("A", 40.0, datetime(2026, 1, 1, 0, 45, 0)),
            # hour 1: single tick -> plain-price fallback
            ("A", 99.5, datetime(2026, 1, 1, 1, 10, 0)),
            # B hour 0: equal weights -> plain midpoint
            ("B", 1.0, datetime(2026, 1, 1, 0, 0, 0)),
            ("B", 3.0, datetime(2026, 1, 1, 0, 10, 0)),
            ("B", 7.0, datetime(2026, 1, 1, 0, 20, 0)),
        ],
        "symbol string, price double, event_time timestamp",
    )
    out = {
        (r.symbol, r.bucket_ts.hour): r
        for r in twap(ticks, grain="hour").collect()
    }
    assert out[("A", 0)].twap == round((10 * 30 + 20 * 15) / 45, 6)
    assert out[("A", 0)].n_ticks == 3
    assert out[("A", 1)].twap == 99.5 and out[("A", 1)].n_ticks == 1
    assert out[("B", 0)].twap == (1 + 3) / 2  # 1.0 and 3.0 each hold 10 min


def _daily(spark, closes, sym="A"):
    from datetime import datetime as dt

    rows = [
        (sym, dt(2026, 1, 1 + i), float(c), i + 1) for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(
        rows, "symbol string, day_ts timestamp, close double, day_idx int"
    )


def test_daily_close_bars_picks_last_tick(spark):
    from datetime import datetime as dt

    from realtime_market_data_pipeline_spark.operators.quant import daily_close_bars

    ticks = spark.createDataFrame(
        [
            ("A", 10.0, dt(2026, 1, 1, 9, 0)),
            ("A", 99.0, dt(2026, 1, 1, 16, 0)),  # last tick of day 1
            ("A", 50.0, dt(2026, 1, 2, 9, 0)),
        ],
        "symbol string, price double, event_time timestamp",
    )
    out = {r.day_idx: r for r in daily_close_bars(ticks).collect()}
    assert out[1].close == 99.0 and out[2].close == 50.0


def test_ema_macd_matches_python_fold(spark):
    from realtime_market_data_pipeline_spark.operators.quant import ema_macd

    closes = [10.0, 11.0, 9.5, 12.0, 13.0, 12.5, 14.0]
    out = sorted(
        ema_macd(_daily(spark, closes), fast=3, slow=5, signal=2).collect(),
        key=lambda r: r.day_ts,
    )
    af, as_, ag = 2.0 / 4.0, 2.0 / 6.0, 2.0 / 3.0
    ef = es = eg = None
    for r, c in zip(out, closes):
        ef = c if ef is None else af * c + (1.0 - af) * ef
        es = c if es is None else as_ * c + (1.0 - as_) * es
        m = ef - es
        eg = m if eg is None else ag * m + (1.0 - ag) * eg
        assert r.ema_fast == round(ef, 6), (r, ef)
        assert r.ema_slow == round(es, 6)
        assert r.macd == round(ef - es, 6)
        assert r.macd_signal == round(eg, 6)


def test_rsi_all_gains_is_100_and_drops_after_loss(spark):
    from realtime_market_data_pipeline_spark.operators.quant import rsi

    out = sorted(
        rsi(_daily(spark, [10.0, 11.0, 12.0, 13.0, 12.0]), n=14).collect(),
        key=lambda r: r.day_ts,
    )
    # days 2-4: monotone gains -> RSI pinned at 100
    assert [r.rsi for r in out[:3]] == [100.0, 100.0, 100.0]
    # day 5 takes a loss: RSI must fall strictly below 100
    assert 0.0 < out[3].rsi < 100.0


def test_rsi_constant_series_emits_100(spark):
    # zero gains AND zero losses -> rl == 0 pins to 100 (documented edge)
    from realtime_market_data_pipeline_spark.operators.quant import rsi

    out = rsi(_daily(spark, [5.0, 5.0, 5.0]), n=14).collect()
    assert [r.rsi for r in out] == [100.0, 100.0]


def _ohlc(spark, rows, sym="A"):
    # rows: [(high, low, close)]
    from datetime import datetime as dt

    return spark.createDataFrame(
        [
            (sym, dt(2026, 1, 1 + i), float(h), float(lo), float(c), i + 1)
            for i, (h, lo, c) in enumerate(rows)
        ],
        "symbol string, day_ts timestamp, high double, low double, close double, day_idx int",
    )


def test_stochastic_by_hand(spark):
    from realtime_market_data_pipeline_spark.operators.quant import stochastic

    # n=2, d=2 for hand arithmetic
    bars = _ohlc(spark, [(10, 8, 9), (12, 9, 11), (11, 10, 10.5), (11, 10.5, 10.5)])
    out = sorted(
        stochastic(bars, n=2, d=2).collect(), key=lambda r: r.day_ts
    )
    # day2: low2=8, high2=12 -> K = 100*(11-8)/4 = 75
    assert out[0].pct_k == 75.0 and out[0].pct_d is None
    # day3: low2=9, high2=12 -> K = 100*(10.5-9)/3 = 50; D = (75+50)/2
    assert out[1].pct_k == 50.0 and out[1].pct_d == 62.5
    # day4: low2=10, high2=11 -> K = 100*0.5/1 = 50; D = 50
    assert out[2].pct_k == 50.0 and out[2].pct_d == 50.0


def test_stochastic_flat_window_is_null(spark):
    from realtime_market_data_pipeline_spark.operators.quant import stochastic

    bars = _ohlc(spark, [(5, 5, 5), (5, 5, 5)])
    out = stochastic(bars, n=2, d=2).collect()
    assert [r.pct_k for r in out] == [None]


def test_atr_matches_python_fold(spark):
    from realtime_market_data_pipeline_spark.operators.quant import atr

    rows = [(10, 8, 9), (12, 9, 11), (11, 10, 10.5), (14, 11, 13)]
    out = sorted(atr(_ohlc(spark, rows), n=3).collect(), key=lambda r: r.day_ts)
    a = None
    exp = []
    for i in range(1, len(rows)):
        h, lo, c = rows[i]
        pc = rows[i - 1][2]
        tr = max(h - lo, abs(h - pc), abs(lo - pc))
        a = tr if a is None else (a * 2.0 + tr) / 3.0
        exp.append((tr, round(a, 6)))
    assert [(r.tr, r.atr) for r in out] == exp


def test_beta_vs_market_two_symbol_identity(spark):
    # Two symbols, A's returns exactly 2x B's in micro-units. Market = mean,
    # so x_A = 2u, x_B = u, y = 1.5u for daily shocks u — beta_A = 4/3,
    # beta_B = 2/3, alphas follow from the means, r2 = 1 (exact collinearity).
    from realtime_market_data_pipeline_spark.operators.quant import (
        beta_vs_market,
        daily_close_bars,
    )

    rows = []
    prices = {"A": 100.0, "B": 50.0}
    shocks = [0.02, -0.01, 0.03, 0.005]
    closes = {"A": [], "B": []}
    for d, u in enumerate(shocks):
        prices["A"] *= math.exp(2 * u)
        prices["B"] *= math.exp(u)
        for sym in ("A", "B"):
            rows.append(
                (sym, prices[sym], datetime(2026, 1, 1 + d, 12, 0, 0))
            )
            closes[sym].append(prices[sym])
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, event_time timestamp"
    )
    out = {r.symbol: r for r in beta_vs_market(daily_close_bars(ticks)).collect()}

    # replicate the operator's integer-micro-return arithmetic in python
    def micro(sym):
        cs = closes[sym]
        return [
            round(round(math.log(cs[i] / cs[i - 1]), 6) * 1e6)
            for i in range(1, len(cs))
        ]

    def _r0(v):  # round half away from zero, matching Spark/DuckDB round()
        return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

    xa, xb = micro("A"), micro("B")
    ys = [_r0((a + b) / 2) for a, b in zip(xa, xb)]

    def ols(xs):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        num, den, denx = n * sxy - sx * sy, n * syy - sy * sy, n * sxx - sx * sx
        beta = round(num / den, 6)
        alpha = round(sx / n / 1e6 - beta * (sy / n / 1e6), 6)
        r2 = round(num * num / (den * denx), 6)
        return beta, alpha, r2

    for sym, xs in (("A", xa), ("B", xb)):
        eb, ea, er2 = ols(xs)
        assert out[sym].n_obs == 3
        assert abs(out[sym].beta - eb) < 1e-9, (sym, out[sym].beta, eb)
        assert abs(out[sym].alpha - ea) < 1e-9
        assert abs(out[sym].r2 - er2) < 1e-9
    # collinear by construction: betas average to 1 and r2 = 1
    assert abs(out["A"].beta + out["B"].beta - 2.0) < 1e-4
    assert out["A"].r2 > 0.9999 and out["B"].r2 > 0.9999

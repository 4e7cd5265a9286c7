"""Tiered OHLC rollup: composing coarse bars from fine bars must equal
computing them directly from raw ticks — the invariant that makes the
continuous-aggregate pyramid safe at scale (the DuckDB oracle re-proves the
1m→1h case against raw SQL; these tests pin multi-tier chaining and the
decomposability of every bar statistic)."""

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators import rollup as ro
from realtime_market_data_pipeline_spark.operators.features import ticks_from_events
from realtime_market_data_pipeline_spark.io import load_table
from tests.conftest import SF_SMALL


def _canon(df):
    return sorted(
        (
            r.symbol,
            r.bar_start,
            r.bar_end,
            r.open_price,
            r.high_price,
            r.low_price,
            r.close_price,
            r.n_ticks,
            r.avg_price,
        )
        for r in ro.finalize_bars(df).collect()
    )


def _ticks(spark):
    return ticks_from_events(load_table(spark, SF_SMALL, "events"))


def test_single_hop_composition(spark):
    ticks = _ticks(spark)
    direct = ro.ohlc_bars(ticks, "1 hour")
    tiered = ro.rollup_ohlc(ro.ohlc_bars(ticks, "1 minute"), "1 hour")
    assert _canon(tiered) == _canon(direct)


def test_multi_tier_chain(spark):
    ticks = _ticks(spark)
    direct = ro.ohlc_bars(ticks, "1 day")
    pyramid = ro.rollup_ohlc(
        ro.rollup_ohlc(ro.ohlc_bars(ticks, "15 minutes"), "1 hour"), "1 day"
    )
    assert _canon(pyramid) == _canon(direct)


def test_bar_invariants(spark):
    bars = ro.finalize_bars(ro.ohlc_bars(_ticks(spark), "1 hour")).collect()
    assert len(bars) > 0
    for b in bars:
        assert b.low_price <= b.open_price <= b.high_price
        assert b.low_price <= b.close_price <= b.high_price
        assert b.low_price <= b.avg_price <= b.high_price
        assert b.n_ticks >= 1
        assert (b.bar_end - b.bar_start).total_seconds() == 3600


def test_gapfill_interpolate_by_hand(spark):
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.rollup import (
        gapfill_interpolate,
    )

    rows = [
        ("A", 10.0, datetime(2026, 1, 1, 0, 0, 30)),  # minute 0: avg 10
        # minutes 1-2 empty -> 1/3 and 2/3 of the way to 40
        ("A", 40.0, datetime(2026, 1, 1, 0, 3, 10)),  # minute 3: avg 40
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, event_time timestamp"
    )
    out = {
        r.bucket_ts.minute: r
        for r in gapfill_interpolate(ticks, grain="minute").collect()
    }
    assert [out[m].price_interp for m in range(4)] == [10.0, 20.0, 30.0, 40.0]
    assert [out[m].is_gap for m in range(4)] == [False, True, True, False]
    assert [out[m].n_ticks for m in range(4)] == [1, 0, 0, 1]


def test_gapfill_locf_by_hand(spark):
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.rollup import gapfill_locf

    rows = [
        ("A", 10.0, datetime(2026, 1, 1, 0, 0, 30)),
        ("A", 20.0, datetime(2026, 1, 1, 0, 0, 45)),  # minute 0: avg 15
        # minutes 1-2 empty -> gaps carrying 15.0
        ("A", 40.0, datetime(2026, 1, 1, 0, 3, 10)),  # minute 3: avg 40
        ("B", 7.0, datetime(2026, 1, 1, 5, 0, 0)),    # single-minute symbol
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, event_time timestamp"
    )
    out = {
        (r.symbol, r.bucket_ts.minute): r
        for r in gapfill_locf(ticks, grain="minute").collect()
    }
    assert len(out) == 5  # A: minutes 0..3; B: one minute
    a0, a1, a2, a3 = (out[("A", m)] for m in range(4))
    assert (a0.n_ticks, a0.price_locf, a0.is_gap) == (2, 15.0, False)
    assert (a1.n_ticks, a1.price_locf, a1.is_gap) == (0, 15.0, True)
    assert (a2.n_ticks, a2.price_locf, a2.is_gap) == (0, 15.0, True)
    assert (a3.n_ticks, a3.price_locf, a3.is_gap) == (1, 40.0, False)
    b = out[("B", 0)]
    assert (b.n_ticks, b.price_locf, b.is_gap) == (1, 7.0, False)

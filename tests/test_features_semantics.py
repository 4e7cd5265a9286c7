"""Semantics tests for the A2/A3 bug-compatibility flag (SURVEY.md §7.3b):
deterministic=True uses event-time min_by/max_by (faithful intent);
deterministic=False keeps the reference's arrival-order first() +
lexicographic struct-max (spark_streaming.py:82-88)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.features import compute_features
from realtime_market_data_pipeline_spark.sources import ticks as src


def _by_key(df):
    return {
        (r.symbol, r.window_start): r
        for r in df.collect()
    }


def test_structmax_last_equals_maxby_without_ties(spark):
    """With unique event times per symbol (GBM ticks), struct-max last price
    == max_by last price; the difference is only the tie-break."""
    ticks = src.synthetic_ticks_batch(spark, n_per_symbol=200, seed=3).cache()
    det = _by_key(compute_features(ticks, window="10 seconds", deterministic=True))
    bug = _by_key(compute_features(ticks, window="10 seconds", deterministic=False))
    assert set(det) == set(bug)
    for k in det:
        assert det[k].last_price == bug[k].last_price
        assert det[k].num_ticks == bug[k].num_ticks
        assert det[k].max_event_time_ms == bug[k].max_event_time_ms


def test_structmax_tie_breaks_toward_higher_price(spark):
    """The reference's argmax form max(struct(event_time, price)).price breaks
    event-time ties toward the HIGHER price — the documented quirk the
    deterministic path replaces."""
    rows = [
        ("AAPL", 10.0, 1000),
        ("AAPL", 30.0, 2000),  # tie on event_time...
        ("AAPL", 20.0, 2000),  # ...higher price must win in bug-compat mode
    ]
    ticks = spark.createDataFrame(
        rows, ["symbol", "price", "event_time_ms"]
    ).withColumn("event_time", F.timestamp_millis("event_time_ms"))
    bug = compute_features(ticks, window="60 seconds", deterministic=False)
    assert bug.first().last_price == 30.0

"""Unit tests for the read-side helpers not routed through an oracle query
(the wall-clock and normalization forms are nondeterministic / trivial, so
they're pinned here instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.io import load_table, register_views, table_exists
from realtime_market_data_pipeline_spark.operators import readside

SF = "/root/testdata/sf0.001"


def test_time_range_filter_bounds(spark):
    ev = load_table(spark, SF, "events")
    out = readside.time_range_filter(
        ev, "ts", lower="2024-01-10 00:00:00", upper="2024-01-12 00:00:00"
    )
    lo, hi = out.agg(F.min("ts"), F.max("ts")).first()
    assert lo.isoformat() >= "2024-01-10T00:00:00"
    assert hi.isoformat() < "2024-01-12T00:00:00"
    assert out.count() > 0


def test_time_range_filter_wallclock_form(spark):
    ev = load_table(spark, SF, "events")
    # data is from 2024 → everything is older than any recent wall-clock window
    assert readside.time_range_filter(ev, "ts", last_minutes=60).count() == 0


def test_symbol_filter_normalizes(spark):
    ev = load_table(spark, SF, "events")
    out = readside.symbol_filter(ev, ["  click ", "VIEW"], col="event_type")
    # stored values are lowercase; both sides normalize with strip().upper()
    got = {r.event_type for r in out.select("event_type").distinct().collect()}
    assert got == {"click", "view"}


def test_catalog_introspection(spark):
    register_views(spark, SF, names=("region",))
    assert table_exists(spark, "region")
    assert not table_exists(spark, "no_such_table")

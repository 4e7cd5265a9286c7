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


def test_csv_corrupt_record_quarantine(spark, tmp_path):
    from realtime_market_data_pipeline_spark.sources.ticks import read_tick_csv

    p = tmp_path / "dirty.csv"
    p.write_text(
        "symbol,price,event_time_ms\n"
        "aapl,100.5,1704067200000\n"
        "msft,not_a_price,1704067201000\n"
        "goog,300.25,1704067202000\n"
    )
    out = read_tick_csv(spark, str(p), keep_corrupt=True).collect()
    good = [r for r in out if r._corrupt_record is None]
    bad = [r for r in out if r._corrupt_record is not None]
    assert {r.symbol for r in good} == {"AAPL", "GOOG"}
    assert len(bad) == 1 and "not_a_price" in bad[0]._corrupt_record
    assert bad[0].price is None


def test_compact_parquet_preserves_data(spark, tmp_path):
    from realtime_market_data_pipeline_spark.io import compact_parquet
    from realtime_market_data_pipeline_spark.sources.ticks import (
        synthetic_ticks_batch,
    )

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    ticks = synthetic_ticks_batch(spark, n_per_symbol=100, seed=5)
    for i in range(6):  # six tiny appends → many small files
        ticks.filter(F.col("event_time_ms") % 6 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) >= 6
    n = compact_parquet(spark, src, dst, target_files=2, sort_within_by=["event_time"])
    assert n == ticks.count()
    assert len(glob.glob(dst + "/*.parquet")) == 2
    before = {tuple(r) for r in spark.read.parquet(src).collect()}
    after = {tuple(r) for r in spark.read.parquet(dst).collect()}
    assert before == after

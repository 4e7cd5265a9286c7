"""Spill-path pin (r10, r9 verdict #7): a memory-heavy operator must
degrade to DISK SPILL, not OOM, when its in-memory buffers are
constrained — the behavior a 100 TB run depends on when a partition
outgrows executor memory.

Local mode can't shrink the already-launched JVM heap per test, so the
constraint lever is Spark's force-spill threshold for the window
buffer (``spark.sql.windowExec.buffer.spill.threshold``): every window
partition larger than N rows is pushed through the same
UnsafeExternalSorter spill-to-disk machinery that memory pressure
triggers. The pinned operator is ``gapfill_interpolate`` — the one
whose O(rows²) frame the r9 sf0.1 sweep caught, and whose per-symbol
window partitions are the repo's largest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators import rollup


def _spilled_bytes(spark) -> int:
    """Total memory+disk bytes spilled across all completed stages,
    read from the live AppStatusStore (the UI-less equivalent of the
    stage page's spill columns)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    stages = store.stageList(
        spark._jvm.java.util.ArrayList(),
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    total = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        total += s.memoryBytesSpilled() + s.diskBytesSpilled()
    return total


def _big_ticks(spark):
    """2 symbols x 15k observed minutes spaced 2 min apart -> a ~30k-row
    dense spine per symbol: far beyond the 4 096-row window buffer, so
    the constrained run MUST spill to finish."""
    base = 1_700_000_000  # fixed epoch, minute-aligned irrelevant
    return spark.range(0, 30000).select(
        F.when(F.col("id") % 2 == 0, "AAA").otherwise("BBB").alias("symbol"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") / 2).cast("long") * 240
        ).alias("event_time"),
        (100.0 + (F.col("id") % 97).cast("double") / 7.0).alias("price"),
    )


def _checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("price_interp").cast("decimal(38,10)")), 6
        ).cast("double").alias("s"),
        F.sum(F.col("is_gap").cast("long")).alias("g"),
    ).collect()[0]
    return (row.n, row.s, row.g)


def test_gapfill_completes_via_spill_when_window_buffer_is_tiny(spark):
    ticks = _big_ticks(spark)
    want = _checksum(rollup.gapfill_interpolate(ticks))
    # per symbol: indices 0..14999 spaced 240 s -> 14999*4+1 minute buckets
    assert want[0] == 2 * (14999 * 240 // 60 + 1)  # dense spine held

    before = _spilled_bytes(spark)
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "4096")
    try:
        got = _checksum(rollup.gapfill_interpolate(ticks))
    finally:
        spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
    spilled = _spilled_bytes(spark) - before

    assert got == want, "spill path changed the values"
    assert spilled > 0, "window buffer never spilled — constraint not exercised"

"""Sink maintenance: small-file compaction and clustered writes."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.maintenance import (
    clustered_write,
    compact_parquet_dir,
    parquet_dir_stats,
)


def _parquet_files(path):
    import os

    out = []
    for root, _d, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    d = str(tmp_path / "sink")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(d)
    before_rows = spark.read.parquet(d).count()
    n_before, total = parquet_dir_stats(d)
    assert n_before == 40

    fb, fa = compact_parquet_dir(spark, d, target_file_bytes=max(total // 3, 1))
    assert fb == 40 and fa in (3, 4)  # ceil(total/target)
    after = spark.read.parquet(d)
    assert after.count() == before_rows
    assert set(r.id for r in after.collect()) == set(range(10_000))

    # compacting an already-compact dir keeps the small file count
    fb2, fa2 = compact_parquet_dir(spark, d, target_file_bytes=max(total // 3, 1))
    assert fb2 == fa and fa2 <= fa + 1


def test_compaction_sort_within_keeps_stats_selective(spark, tmp_path):
    d = str(tmp_path / "sorted_sink")
    spark.range(9_000).select(
        (F.col("id") % 3000).alias("k"), F.col("id").alias("v")
    ).repartition(30).write.parquet(d)
    compact_parquet_dir(
        spark, d, target_file_bytes=10**12, sort_within_by=["k"]
    )  # one file, rows sorted
    (f,) = _parquet_files(d)
    md = pq.ParquetFile(f).metadata
    ki = md.schema.names.index("k")
    # row-group min/max on k must be (near-)disjoint ascending ranges
    ranges = [
        (md.row_group(i).column(ki).statistics.min,
         md.row_group(i).column(ki).statistics.max)
        for i in range(md.num_row_groups)
    ]
    assert ranges == sorted(ranges)
    if len(ranges) > 1:
        overlaps = sum(
            1 for (a, b), (c, e) in zip(ranges, ranges[1:]) if c < b
        )
        assert overlaps <= 1


def test_clustered_write_enables_file_pruning(spark, tmp_path):
    d = str(tmp_path / "clustered")
    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("x")
    )
    clustered_write(df, d, cluster_by=["k"], n_files=8)
    files = _parquet_files(d)
    assert len(files) == 8
    # footer stats: a narrow k predicate must exclude most files
    lo, hi = 5_000, 5_999
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ki = md.schema.names.index("k")
        mins = [md.row_group(i).column(ki).statistics.min for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(ki).statistics.max for i in range(md.num_row_groups)]
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    assert hit <= 2  # ranges are balanced: ~1 of 8 files covers the band
    # and the data is intact
    got = spark.read.parquet(d).where((F.col("k") >= lo) & (F.col("k") <= hi))
    assert got.count() == 1000


def test_compaction_after_streaming_sink(spark, tmp_path):
    """Operational loop: a micro-batched file sink accumulates small files;
    periodic compaction shrinks the file count while readers keep seeing
    exactly the sunk rows."""
    import time as _time

    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "src")
    sink_dir = str(tmp_path / "sink")
    for i in range(4):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 3
        ).coalesce(1).write.mode("append").parquet(src_dir)
        _time.sleep(1.1)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)

    from realtime_market_data_pipeline_spark.maintenance import (
        compact_parquet_dir,
        parquet_dir_stats,
    )

    n_before, _ = parquet_dir_stats(sink_dir)
    assert n_before >= 4  # one file set per micro-batch
    fb, fa = compact_parquet_dir(spark, sink_dir, target_file_bytes=10**12)
    assert fa == 1
    got = spark.read.parquet(sink_dir)
    assert got.count() == 400
    assert set(r.id for r in got.collect()) == set(range(400))


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    """Morton layout: with a 2-D uniform grid z-ordered into 16 files, a
    quarter-range predicate on EITHER dimension must exclude at least half
    the files by footer stats — the property a single-column sort only has
    for its leading column."""
    from pyspark.sql import functions as F

    from realtime_market_data_pipeline_spark.maintenance import zorder_write

    d = str(tmp_path / "z")
    n = 128
    grid = (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    )
    zorder_write(
        grid, d, cols=["x", "y"], bounds={"x": (0, n - 1), "y": (0, n - 1)}, n_files=16
    )
    files = _parquet_files(d)
    assert len(files) == 16

    def files_hit(col, lo, hi):
        hits = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            ci = md.schema.names.index(col)
            mins = [md.row_group(i).column(ci).statistics.min for i in range(md.num_row_groups)]
            maxs = [md.row_group(i).column(ci).statistics.max for i in range(md.num_row_groups)]
            if min(mins) <= hi and max(maxs) >= lo:
                hits += 1
        return hits

    q = n // 4
    assert files_hit("x", 0, q - 1) <= 8
    assert files_hit("y", 0, q - 1) <= 8
    # data intact under a box predicate
    got = spark.read.parquet(d).where((F.col("x") < q) & (F.col("y") < q))
    assert got.count() == q * q

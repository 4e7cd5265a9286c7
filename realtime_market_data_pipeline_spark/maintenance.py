"""Table-maintenance operations for file-backed sinks: small-file compaction
and clustered (sorted) rewrites.

Why these exist: a micro-batch sink (streaming/sinks.parquet_append_writer,
reference K2's hypertable analog) emits one file set per trigger — after a
day at a 10 s trigger that is ~8 6400 small files, and at 100 TB the scan-task
count (and NameNode/listing pressure) is driven by FILE count, not byte
count. The fix is the same pair every lakehouse runs: periodic compaction to
a target file size, and range-clustered rewrites so min/max footer stats
prune row groups for the dominant predicate columns.

Both are plain batch jobs over the sink directory — safe to run while
readers are active IF the swap is atomic at the directory level (here:
write to a sibling dir + rename, the strongest primitive a plain
filesystem gives; object stores / table formats would use a manifest
commit instead, which is out of scope for a filesystem sink).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def parquet_dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet directory from the filesystem
    only — no Spark job."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite a parquet directory into ≈``total_bytes/target`` files,
    optionally sorting rows inside each output file so footer min/max stats
    stay selective. Returns (files_before, files_after).

    The partition count comes from the CURRENT on-disk byte size (filesystem
    metadata, no job), so compaction output tracks the data as the sink
    grows — at 100 TB the same call emits thousands of 128 MB files, never
    one giant partition. The rewrite is one wide job: scan → round-robin
    repartition (+ optional in-partition sort) → write to a sibling temp
    dir → atomic directory swap.

    CAVEAT: if the directory was written by Spark's streaming FILE sink it
    contains a ``_spark_metadata`` transaction log; the rewrite drops it
    (the output is a plain parquet dir), which is correct for downstream
    batch readers but means the ORIGINAL streaming query must not keep
    appending here afterwards — rotate the sink path (e.g. daily dirs, the
    parquet_append_writer partition_by_date_of layout) and compact only
    sealed directories. Table formats with a manifest commit (Delta/
    Iceberg) are the general solution; out of scope for a plain-FS sink."""
    files_before, total = parquet_dir_stats(path)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path).repartition(n_out)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after, _ = parquet_dir_stats(path)
    return files_before, files_after


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
) -> None:
    """Range-clustered parquet write: rows range-partitioned on
    ``cluster_by`` then sorted within each file, so every file (and row
    group) covers a narrow key interval and a predicate on those columns
    prunes most files from their footer stats alone — the flat-file analog
    of clustering/Z-order for the single-column-prefix case.

    ``repartitionByRange`` samples the keys to build balanced range bounds
    (one pass), which also absorbs key skew that hash bucketing would
    concentrate."""
    parted = (
        df.repartitionByRange(n_files, *cluster_by)
        if n_files
        else df.repartitionByRange(*cluster_by)
    )
    parted.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(path)


def zorder_value(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
):
    """Z-order (Morton) key as a pure Column expression: each column is
    min-max scaled to a ``bits``-bit integer rank, then ranks are
    bit-interleaved. Sorting by this key clusters rows so that a range
    predicate on ANY prefix-balanced subset of the columns touches few
    files — the multi-column layout a single-column range sort cannot give.

    Bounds are passed in (typically from footer stats or domain knowledge)
    so the expression stays a pure per-row function — no statistics job,
    and the key is stable as data grows. The interleave is ~``bits×|cols|``
    shift/or ops — all whole-stage-codegen arithmetic."""
    from pyspark.sql import functions as F

    maxrank = (1 << bits) - 1
    ranks = []
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
        ranks.append(F.round(clamped * F.lit(float(maxrank))).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(ranks) + j))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the Morton
    key of ``cols``, so footer min/max stats prune files for predicates on
    EITHER column (or both) — the flat-file analog of OPTIMIZE ... ZORDER
    BY. One wide job, same shape as ``clustered_write``."""
    z = zorder_value(cols, bounds, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

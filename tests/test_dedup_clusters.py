"""Near-dup clustering truth test: the planted corpus (each doc + a
4/5-truncated copy at doc_id+100000) must cluster each pair together with
cluster_id = the original doc_id, except docs whose truncation fell below
the 0.5 Jaccard bar — those stay singletons symmetrically."""

from __future__ import annotations

from realtime_market_data_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_planted_pairs_cluster_together(spark):
    labels = {r.doc_id: r.cluster_id for r in Q.QUERIES["dedup_clusters"](spark, SF).collect()}
    pairs = Q.QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    assert pairs, "planted corpus must produce verified near-dup pairs"
    # every verified pair landed in one cluster, labeled by its smallest member
    for p in pairs:
        assert labels[p.id_a] == labels[p.id_b]
        assert labels[p.id_a] <= min(p.id_a, p.id_b)
    # nodes in no verified pair remain singletons
    paired = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    for node, lab in labels.items():
        if node not in paired:
            assert lab == node


def test_transitive_chain_clusters(spark):
    """a-b and b-c edges (no a-c) must still produce one cluster {a,b,c}."""
    from realtime_market_data_pipeline_spark.operators.dedup import cluster_near_dups

    ids = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    got = {r.doc_id: r.cluster_id for r in cluster_near_dups(ids, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_canonicalize_by_priority_keeps_best_source(spark):
    """r12: duplicate clusters resolve to the highest-priority member
    (ties to lowest id) instead of min-id — exactly one survivor per
    connected component even on chains, where min-id greedy over-drops
    (B dups to A, C dups to B: greedy can keep only A while C's
    canonical B is itself dropped; the component form keeps exactly
    one and everyone points at it)."""
    from pyspark.sql import functions as F

    from realtime_market_data_pipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (4, 9), (10, 3), (11, 3), (20, 1)],
        "doc_id long, priority int",
    )
    # chain 1-2-3-4 (one component), pair 10-11 (tie on priority), 20
    # is a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: r
        for r in dd.canonicalize_by_priority(docs, pairs).collect()
    }
    # chain keeper: priority 9 appears at ids 2 and 4 -> lowest id 2
    for i in (1, 2, 3, 4):
        assert out[i].canonical_id == 2 and out[i].cluster_id == 1
    assert not out[2].is_dup
    assert sum(not out[i].is_dup for i in (1, 2, 3, 4)) == 1
    # tie pair: equal priority -> lowest id wins
    assert out[10].canonical_id == 10 and out[11].canonical_id == 10
    # singleton: own canonical, never a dup
    assert out[20].canonical_id == 20 and not out[20].is_dup
    # exactly-one-survivor-per-component invariant
    surv = [r for r in out.values() if not r.is_dup]
    assert {r.cluster_id for r in surv} == {1, 10, 20}
    assert len(surv) == 3

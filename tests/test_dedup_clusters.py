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

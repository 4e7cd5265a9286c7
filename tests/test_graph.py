"""Fixed-point PageRank and sorted-neighborhood dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators import dedup as D
from realtime_market_data_pipeline_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def test_pagerank_star_center_dominates(spark):
    # star: 1 is linked by 2..6 (symmetrized) — center must rank highest
    pairs = [(1, k) for k in range(2, 7)]
    e = G.undirected_edges(
        spark.createDataFrame(pairs, "a: long, b: long"), "a", "b"
    )
    rows = {
        r["node"]: r["rank_fp"]
        for r in G.pagerank_fixed_point(e, iterations=5).collect()
    }
    assert len(rows) == 6
    assert rows[1] > max(v for k, v in rows.items() if k != 1)
    # leaves are symmetric → identical fixed-point ranks, bit-exact
    assert len({v for k, v in rows.items() if k != 1}) == 1


def test_pagerank_mass_conserved_up_to_truncation(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    e = G.undirected_edges(
        spark.createDataFrame(pairs, "a: long, b: long"), "a", "b"
    )
    total = (
        G.pagerank_fixed_point(e, iterations=5)
        .agg(F.sum("rank_fp").alias("t"))
        .collect()[0]["t"]
    )
    # integer truncation only ever loses mass, never creates it
    assert 0.99 * G.SCALE < total <= G.SCALE


def test_pagerank_partitioning_invariant(spark):
    # integer arithmetic ⇒ identical ranks under any partitioning
    pairs = [(i, (i * 7) % 23 + 100) for i in range(1, 60)]
    base = spark.createDataFrame(pairs, "a: long, b: long")
    e1 = G.undirected_edges(base, "a", "b")
    e32 = G.undirected_edges(base.repartition(32), "a", "b")
    r1 = sorted(map(tuple, G.pagerank_fixed_point(e1, iterations=4).collect()))
    r2 = sorted(map(tuple, G.pagerank_fixed_point(e32, iterations=4).collect()))
    assert r1 == r2


def test_snm_finds_adjacent_near_dups_within_block(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),  # 4/6 overlap with 1
            (3, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (4, "zz totally unrelated words here"),  # different block
        ],
        "doc_id: long, text: string",
    )
    pairs = {
        (r["a_id"], r["b_id"])
        for r in D.sorted_neighborhood_pairs(docs, window=3).collect()
    }
    assert (1, 3) in pairs  # exact dup: jaccard 1.0
    assert (1, 2) in pairs and (2, 3) in pairs  # 4/6 = 0.67 >= 0.6
    assert not any(4 in p for p in pairs)  # other block, never compared


def test_snm_window_bounds_candidates(spark):
    # 10 identical docs, window=2 → each doc pairs with <= 2 successors;
    # SNM candidate generation must stay linear, not all-pairs
    docs = spark.createDataFrame(
        [(i, "same tokens every time") for i in range(10)],
        "doc_id: long, text: string",
    )
    got = D.sorted_neighborhood_pairs(docs, window=2).count()
    assert got == 2 * 10 - 3  # n*w - w*(w+1)/2 pairs, not C(10,2)=45


def test_entity_resolution_merges_edit_variants(spark):
    from realtime_market_data_pipeline_spark.operators import dedup as DD
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "acme corporation global headquarters new york"),
            (2, "acme corporatian global headquarters new york"),  # 1 edit
            (3, "acme corporation global headquarters new yorc"),  # 1 edit
            (4, "completely different text about something else"),
        ],
        "doc_id: long, text: string",
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""))
    cands = DD.snm_candidate_payload_pairs(docs, payload=norm, window=3)
    verified = (
        cands.filter(
            (F.length("pa") > 0)
            & (F.lit(5) * F.levenshtein("pa", "pb")
               <= F.greatest(F.length("pa"), F.length("pb")))
        )
        .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"))
        .distinct()
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in DD.cluster_near_dups(docs.select("doc_id"), verified).collect()
    }
    # 1,2,3 are one entity (transitively); 4 stays a singleton
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[4] == 4


def test_hits_bipartite_shared_supplier_dominates(spark):
    # customers 1,2,3 all buy from supplier 10; only 3 also buys from 11
    e = _edges(spark, [(1, 10), (2, 10), (3, 10), (3, 11)])
    hubs, auths = G.hits_fixed_point(e, iterations=3)
    a = {r["node"]: r["score_fp"] for r in auths.collect()}
    h = {r["node"]: r["score_fp"] for r in hubs.collect()}
    assert a[10] > a[11]  # shared supplier is the authority
    assert h[3] > h[1] == h[2]  # 3 buys from both → best hub; 1,2 symmetric
    # L1 normalization: totals bounded by scale (truncation only loses)
    assert 0.99 * G.HITS_SCALE < sum(a.values()) <= G.HITS_SCALE
    assert 0.99 * G.HITS_SCALE < sum(h.values()) <= G.HITS_SCALE


def test_hits_partitioning_invariant(spark):
    pairs = [(i, 100 + (i * 3) % 7) for i in range(1, 40)]
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(32)
    r1 = sorted(map(tuple, G.hits_fixed_point(e1, iterations=3)[1].collect()))
    r2 = sorted(map(tuple, G.hits_fixed_point(e2, iterations=3)[1].collect()))
    assert r1 == r2

"""ANN quality tests — the approximate variants against the exact baseline.

The brute-force twin (embedding_cosine_topk) is oracle-checked for
correctness; these tests check the approximate paths trade recall for
compute sanely: every emitted neighbor is a real vector with a correctly
ranked exact cosine, and recall@k against brute force clears a floor.
"""

from __future__ import annotations

from realtime_market_data_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _topk_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_ivf_recall_against_brute_force(spark):
    exact = _topk_sets(Q.QUERIES["embedding_cosine_topk"](spark, SF))
    approx = _topk_sets(Q.QUERIES["embedding_ann_ivf"](spark, SF))
    assert set(approx) == set(exact)  # every query answered
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.4, f"IVF recall@5 too low: {hits}/{total}"


def test_lsh_output_shape(spark):
    rows = Q.QUERIES["embedding_ann_lsh"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.rank <= 5
        assert -1.000001 <= r.cosine_sim <= 1.000001
        assert r.vec_id != r.query_id


def test_ivf_ranks_are_dense_and_ordered(spark):
    rows = Q.QUERIES["embedding_ann_ivf"](spark, SF).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine_sim))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True)

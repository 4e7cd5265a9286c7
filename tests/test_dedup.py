

def test_frequency_cap_soft_dedup(spark):
    """r14: duplicate-frequency capping — up to cap_k copies per
    exact-dup cluster survive, selection is the deterministic 48-bit
    key (ties to id), singletons always survive, and every row is
    returned with its rank (route-don't-drop)."""
    import hashlib

    from realtime_market_data_pipeline_spark.operators import dedup as dd

    def u48(doc_id, salt="cap:v1"):
        return int(
            hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:12], 16
        )

    rows = [
        (0, "aaa"), (1, "aaa"), (2, "aaa"), (3, "aaa"),  # 4 copies
        (10, "bbb"),                                      # singleton
        (20, "ccc"), (21, "ccc"),                         # exactly cap
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dd.frequency_cap(df, cap_k=2).collect()}
    assert len(out) == 7
    a_order = sorted([0, 1, 2, 3], key=lambda i: (u48(i), i))
    for rank, did in enumerate(a_order, start=1):
        assert out[did].dup_rank == rank
        assert out[did].kept == (rank <= 2)
    assert out[0].n_copies == 4
    assert out[10].kept and out[10].n_copies == 1
    assert out[20].kept and out[21].kept

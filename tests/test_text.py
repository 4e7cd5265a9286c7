

def test_compressed_ingest_roundtrip_and_quarantine(spark):
    """r9: gzip compress -> routed decompress recovers every document's
    exact text (CRC-verified by the stdlib reader), while truncated
    members, garbage containers, non-UTF-8 plaintext, and NULL payloads
    land as error_class rows — the compressed-ingest twin of the media
    quarantine routers."""
    import gzip

    from realtime_market_data_pipeline_spark.io import load_table
    from realtime_market_data_pipeline_spark.operators import text as tx

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).limit(40)
    comp = tx.compress_documents(docs)
    out = tx.decompress_documents_routed(comp)
    got = {r["doc_id"]: r for r in out.collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == len(want)
    for did, text in want.items():
        assert got[did]["error_class"] is None
        assert got[did]["text"] == text
        assert got[did]["n_chars"] == len(text)

    # poison payloads route, never raise
    good = gzip.compress("hello world".encode()), None
    bad_utf8 = gzip.compress(b"\xff\xfe\x00\x01\x81")
    rows = [
        (1, bytearray(good[0])),
        (2, bytearray(good[0][: len(good[0]) - 3])),  # truncated member
        (3, bytearray(b"\x00garbage")),               # unknown container
        (4, None),                                    # null payload
        (5, bytearray(bad_utf8)),                     # invalid utf-8
        (None, bytearray(good[0])),                   # null id
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    res = tx.decompress_documents_routed(df)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # shuffle-free router
    by = {r["doc_id"]: r for r in res.collect()}
    assert by[1]["text"] == "hello world" and by[1]["error_class"] is None
    assert by[2]["error_class"] == "ValueError"
    assert by[3]["error_class"] == "NotImplementedError"
    assert by[4]["error_class"] == "ValueError"
    assert by[5]["error_class"] == "ValueError"  # UnicodeDecodeError ⊂ VE
    nid = next(r for r in res.collect() if r["doc_id"] is None)
    assert nid["text"] == "hello world"

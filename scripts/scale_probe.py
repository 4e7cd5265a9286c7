"""Scaling probe: replicate the sf0.1 corpus k× into /tmp and measure how
headline query runtimes grow. A plan that holds at 100 TB should scale
~linearly in rows here (scan/partial-agg bound) — superlinear growth exposes
a quadratic join or a collapsing single-partition stage.

Usage: python scripts/scale_probe.py [k] [query ...]
Writes one JSON line: {"k": k, "queries": {name: {"t1": s, "tk": s,
"ratio": tk/t1}}} — ratio ≲ k means at-or-better-than-linear.

Streaming mode (r5 verdict #5): python scripts/scale_probe.py --stream [k]
replicates the tick volume k× and compares STEADY-STATE per-batch compute
(median durationMs.addBatch, excluding batch 0's codegen) through the
features_stream plan, plus the state-store row sequence — bounded state
means the watermark is closing windows, the property that keeps a 100 TB
stream from accreting state forever.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "features_tumbling_1h",
    "ohlc_rollup_1m_1h",
    "q1_pricing_summary",
    "q18_large_orders",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "doc_lm_scores",
    "dedup_embedding_lsh",
    # r4 additions: recursive-indicator fold (per-symbol, bar cardinality),
    # single-exchange funnel windows, user-keyed retention aggs
    "ema_macd_daily",
    "funnel_view_click_purchase",
    "retention_cohorts_weekly",
    # late-r4 additions: bar-cardinality OLS, broadcast-stats histogram,
    # shuffle-free PPS sampling, broadcast-dim VWAP, flat-sketch KMV,
    # one-exchange CEP, drift/backtest scans, two-phase postings top-k
    "beta_vs_market_daily",
    "events_value_histogram",
    "token_weighted_sample",
    "vwap_brand_month",
    "kmv_distinct_users",
    "kmv_jaccard_pairs",
    "sequence_pattern_counts",
    "events_value_drift_psi",
    "seasonal_baseline_backtest",
    "inverted_index_postings",
    "zscore_outlier_events",
    # graph / ER family (needs the FK-shifted replication below: fixed-dim
    # replicas densify derived graphs instead of growing them)
    "pagerank_trade_graph",
    "triangle_count_supplier_graph",
    "copurchase_brand_pairs",
    "dedup_sorted_neighborhood",
    "entity_resolution_clusters",
    "equidepth_bins_value",
    "hits_trade_authorities",
    "point_in_time_enrich",
    # r5: remaining bench-top-10 families (curation end-to-end, IVF ANN) and
    # the new heavy-hitters batch twin
    "curation_pipeline",
    "embedding_ann_ivf",
    "heavy_hitters_topk",
    # r6: merge-form heavy hitters and real BMP/WAV decode
    "heavy_hitters_merged",
    "multimodal_decode",
    # r10: GIF decode (row-linear LZW through both twins) and the
    # on-disk ANN lifecycle rows (job-count-bound harnesses — probe
    # receipts 1.31-1.68x @8x recorded in SURVEY §9)
    "multimodal_decode_gif",
    "embedding_ann_ivfpq",
    "embedding_ann_ivf_appended",
    # late-r10 text rows. NOTE the replication artifact both inherit
    # from identical replica text (same class as dedup_minhash_lsh
    # above): k copies of every document make EVERY window/line
    # corpus-frequent, so at k>=2 these probe the all-marked WORST
    # case (starts relation == every token position) — an upper bound,
    # not the typical-growth slope.
    "doc_boilerplate_removal",
    "dedup_exact_substrings",
    # perceptual image dedup: hashing is row-linear mapInPandas; the
    # banding join runs over DISTINCT hashes (10 in the planted
    # corpus at any k), so growth probes the hash stage only.
    "multimodal_dedup_dhash",
    "dedup_audio_fingerprint",
]
# tables each probe query reads — replicate only what's needed
TABLES = ("events", "lineitem", "orders", "customer", "documents", "embeddings",
          "part", "supplier", "nation", "region")


def replicate(spark, k: int, dst: str) -> None:
    """k× row replication with key remapping so join/group cardinalities grow
    like real data (distinct doc_ids/orderkeys), not k duplicate keys."""
    os.makedirs(dst, exist_ok=True)
    keys = {
        "events": "event_id", "lineitem": "l_orderkey", "orders": "o_orderkey",
        "customer": "c_custkey", "documents": "doc_id", "embeddings": "vec_id",
    }
    # FK columns shifted alongside their PK so fact→dim joins and derived
    # graphs GROW with k instead of densifying: without this, k× the
    # lineitems over a fixed supplier set inflates co-order supports k×
    # and drives the thresholded co-supplier graph toward complete — a
    # density artifact no real corpus has (same class as the fresh-vector
    # rule for embeddings below).
    fks = {
        "orders": ["o_custkey"],
        "lineitem": ["l_suppkey"],
    }
    for t in TABLES:
        src_path = os.path.join(BASE, f"{t}.parquet")
        out = os.path.join(dst, f"{t}.parquet")
        if t in ("part", "nation", "region"):
            shutil.copy(src_path, out)
            continue
        from realtime_market_data_pipeline_spark.io import load_table

        df = load_table(spark, BASE, t)
        key = keys.get(t, "s_suppkey" if t == "supplier" else None)
        copies = df.crossJoin(
            spark.range(k).select(F.col("id").alias("_rep"))
        ).withColumn(key, F.col(key) + F.col("_rep") * F.lit(10_000_000))
        for fk in fks.get(t, []):
            copies = copies.withColumn(
                fk, F.col(fk) + F.col("_rep") * F.lit(10_000_000)
            )
        if t == "embeddings":
            # replicas get FRESH random vectors: exact-dup replica vectors
            # would put k cosine-1.0 copies of every signature in the same
            # LSH bucket (Σ bucket² grows k², guaranteed-pair verify grows
            # k²) — a growth pattern no real corpus has. Real growth is new
            # content; iid gaussians are exactly the null (far-apart) case.
            dim = 64
            fresh = F.array(*[F.randn(seed=7000 + i) for i in range(dim)])
            copies = copies.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding").cast("array<double>"))
                .otherwise(fresh),
            )
        copies = copies.drop("_rep")
        copies.write.mode("overwrite").parquet(out)


def _run_stream_once(spark, events_df, n_files: int) -> list[dict]:
    """Replay events as ``n_files`` tick files through the streaming
    features plan (1 file per micro-batch, availableNow) and return the
    per-batch metrics: durationMs.addBatch + state rows, via the
    streaming metrics listener (recentProgress fills any unflushed tail,
    as in bench.py)."""
    from realtime_market_data_pipeline_spark.operators.features import (
        ticks_from_events,
    )
    from realtime_market_data_pipeline_spark.streaming import job
    from realtime_market_data_pipeline_spark.streaming.metrics import (
        attach_metrics,
    )

    root = tempfile.mkdtemp(prefix="stream_probe_")
    tick_dir = os.path.join(root, "ticks")
    ckpt = os.path.join(root, "ckpt")
    collector, detach = attach_metrics(spark)
    try:
        ticks_from_events(events_df).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(tick_dir)
        stream = job.read_parquet_ticks_stream(
            spark, tick_dir, max_files_per_trigger=1
        )
        feats = job.features_stream(stream, window="1 hour", watermark="1 hour")
        q = (
            feats.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        recent = {int(json.loads(p.json)["batchId"]): json.loads(p.json)
                  for p in q.recentProgress}
        deadline = time.monotonic() + 3.0
        while (
            len(collector.batches) < len(recent)
            and time.monotonic() < deadline
        ):
            time.sleep(0.05)
        seen = {b.batch_id: b for b in collector.batches}
        out = []
        for bid in sorted(recent):
            if bid in seen:
                b = seen[bid]
                add, state = (
                    b.duration_breakdown_ms.get("addBatch", 0),
                    b.state_rows,
                )
            else:
                p = recent[bid]
                add = int((p.get("durationMs") or {}).get("addBatch") or 0)
                state = sum(
                    (op.get("numRowsTotal") or 0)
                    for op in (p.get("stateOperators") or [])
                )
            out.append(
                {"batch_id": bid, "add_batch_ms": add, "state_rows": state}
            )
        return out
    finally:
        detach()
        shutil.rmtree(root, ignore_errors=True)


def _steady_ms(batches: list[dict]) -> float:
    """Median addBatch over steady batches — batch 0 (whole-stage codegen
    compile) and the trailing empty finalization batch excluded."""
    mids = [
        b["add_batch_ms"]
        for b in batches[1:]
        if b["add_batch_ms"] > 0
    ]
    mids = sorted(mids) or [0]
    return float(mids[len(mids) // 2])


def stream_main(k: int) -> None:
    from realtime_market_data_pipeline_spark.io import load_table
    from realtime_market_data_pipeline_spark.session import get_spark

    n_files = 6
    spark = get_spark(app_name="scale-probe-stream")
    spark.sparkContext.setLogLevel("ERROR")
    base_events = load_table(spark, BASE, "events")
    # k× tick volume via the SAME event-id remapping the batch probe uses
    # (fresh ids, same symbol/timestamp distribution: per-batch row volume
    # grows k×, window-key cardinality stays realistic)
    rep = base_events.crossJoin(
        F.broadcast(spark.range(k).select(F.col("id").alias("_rep")))
    ).withColumn(
        "event_id", F.col("event_id") + F.col("_rep") * F.lit(10_000_000)
    ).drop("_rep")
    # warm codegen/worker pool once, then measure both volumes
    _run_stream_once(spark, base_events, 2)
    b1 = _run_stream_once(spark, base_events, n_files)
    bk = _run_stream_once(spark, rep, n_files)
    s1, sk = _steady_ms(b1), _steady_ms(bk)
    state_seq = [b["state_rows"] for b in bk]
    print(
        json.dumps(
            {
                "stream_k": k,
                "n_files": n_files,
                "steady_ms_base": s1,
                "steady_ms_k": sk,
                "ratio": round(sk / s1, 2) if s1 else None,
                "batches_base": b1,
                "batches_k": bk,
                # bounded-state check: once the watermark advances past the
                # first batches' windows, state must stop growing — the
                # second half of the run must show ~no net state growth
                # (unbounded accretion would keep climbing to the end)
                "state_plateau": state_seq[-1]
                <= state_seq[len(state_seq) // 2] * 1.1 + 16,
                "state_rows_k": state_seq,
            }
        )
    )
    spark.stop()


def main() -> None:
    from realtime_market_data_pipeline_spark import queries as Q
    from realtime_market_data_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--stream":
        stream_main(int(args[1]) if len(args) > 1 else 8)
        return
    k = int(args[0]) if args else 8
    names = args[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dst = tempfile.mkdtemp(prefix=f"scale_probe_{k}x_")
    try:
        replicate(spark, k, dst)

        def timed(name: str, sf_dir: str) -> float:
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            return round(time.perf_counter() - t0, 3)

        # warm both paths once
        timed(names[0], BASE)
        out = {}
        for name in names:
            t1 = timed(name, BASE)
            tk = timed(name, dst)
            out[name] = {"t1": t1, "tk": tk, "ratio": round(tk / t1, 2)}
        print(json.dumps({"k": k, "queries": out}))
    finally:
        shutil.rmtree(dst, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

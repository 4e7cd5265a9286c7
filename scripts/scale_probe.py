"""Scaling probe: replicate the sf0.1 corpus k× into /tmp and measure how
headline query runtimes grow. A plan that holds at 100 TB should scale
~linearly in rows here (scan/partial-agg bound) — superlinear growth exposes
a quadratic join or a collapsing single-partition stage.

Usage: python scripts/scale_probe.py [k] [query ...]
Writes one JSON line: {"k": k, "queries": {name: {"t1": s, "tk": s,
"ratio": tk/t1}}} — ratio ≲ k means at-or-better-than-linear.
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


def main() -> None:
    from realtime_market_data_pipeline_spark import queries as Q
    from realtime_market_data_pipeline_spark.session import get_spark

    args = sys.argv[1:]
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

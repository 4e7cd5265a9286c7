"""Mergeable sketch operators with deterministic, oracle-replayable output.

The KMV (k-minimum-values) bottom-k sketch estimates distinct counts from
the k smallest hash values of the key set — unlike HLL
(``approx_count_distinct``) the sketch CONTENT is a pure function of the
data (md5 order), so both the sample and the estimate replay exactly in
ANSI SQL: a strict-hash oracle can check it value-for-value, where HLL can
only be contract-checked. Bottom-k is also a uniform distinct-key sample
(the classic bottom-k sketch), and it merges: bottom-k(A ∪ B) =
bottom-k(bottom-k(A) ∪ bottom-k(B)) — the property the streaming twin
(streaming/stateful.kmv_stream) folds on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realtime_market_data_pipeline_spark.operators.text import sample_key48

KMV_SALT = "kmv:v1"


def bottomk_user_hashes(
    df: DataFrame,
    by: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k of the distinct ids' 48-bit md5 keys:
    (by, id, h48, rk ≤ k). Two-phase so no task ever sorts a group's full
    key set: after the (by, id) distinct, each partition keeps its own
    local bottom-k (array_sort over a partition-bounded collect_list),
    and the final per-group window ranks only the ≤ k·P surviving
    candidates — the classic scalable top-k shape. The result is invariant
    to partitioning (bottom-k merge law), so the local phase's
    spark_partition_id grouping never leaks into the output. Ties cannot
    occur (h48 collisions aside, rank breaks by id)."""
    d = df.select(by, id_col).distinct()
    h = d.select(
        by, id_col, sample_key48(id_col, salt=KMV_SALT).alias("h48")
    )
    local = h.groupBy(by, F.spark_partition_id().alias("_pid")).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("h48", F.col(id_col)))),
            1,
            k,
        ).alias("cand")
    )
    ex = local.select(by, F.explode("cand").alias("s")).select(
        by,
        F.col("s.h48").alias("h48"),
        F.col(f"s.{id_col}").alias(id_col),
    )
    w = Window.partitionBy(by).orderBy("h48", id_col)
    return ex.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def kmv_distinct_estimate(
    df: DataFrame,
    by: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count estimate per group: est = (k−1)·2⁴⁸ / u_k where
    u_k is the k-th smallest 48-bit key; groups with fewer than k distinct
    ids are exact (est = k_used). The exact distinct count rides alongside
    with a |est−exact| ≤ 0.5·exact contract bool — at k=64 the KMV
    standard error is 1/√(k−2) ≈ 12.6%, so 50% is a ≈4σ bound.

    Every output is deterministic: integer hashes, a literal numerator
    ((k−1)·2⁴⁸ has ≤ 6 significant bits — exactly representable as a
    double), identical-operand division, 6-dp round. At 100 TB the
    bottom-k partial-aggregates per partition before the (by)-keyed
    exchange (the window input is already distinct-key cardinality)."""
    bk = bottomk_user_hashes(df, by=by, id_col=id_col, k=k)
    t = bk.groupBy(by).agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h48").alias("u_k")
    )
    exact = (
        df.select(by, id_col)
        .distinct()
        .groupBy(by)
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    numerator = float((k - 1) * (1 << 48))
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.round(F.lit(numerator) / F.col("u_k"), 6))
    j = t.join(F.broadcast(exact), by)
    return j.select(
        by,
        "k_used",
        "u_k",
        est.alias("est_distinct"),
        "exact_distinct",
        (
            F.abs(est - F.col("exact_distinct"))
            <= F.lit(0.5) * F.col("exact_distinct")
        ).alias("within_bound"),
    )


def kmv_jaccard_pairs(
    df: DataFrame,
    by: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Audience-overlap estimation between every pair of groups: Jaccard of
    the groups' distinct-id sets, estimated from their bottom-k signatures
    — est = |bottom-k(Sa ∪ Sb) ∩ Sa ∩ Sb| / |bottom-k(Sa ∪ Sb)| — with the
    exact Jaccard riding alongside as certificate plus a ±0.25 absolute
    contract bool (k=64 ⇒ σ ≈ √(J(1−J)/k) ≤ 0.0625, so 0.25 is ≈4σ).

    Everything after the two keyed sketch aggregations runs at
    |groups|-signature cardinality (arrays of ≤k longs, pair expansion
    |groups|²/2 rows) — built-in array HOFs, no shuffle. The sketch is
    deterministic (md5 order), so estimate AND signature replay exactly in
    SQL. The exact twin self-joins the distinct (by, id) relation on id —
    per-key blowup ≤ |groups|², fine at any id cardinality."""
    sk = bottomk_user_hashes(df, by=by, id_col=id_col, k=k)
    sigs = sk.groupBy(by).agg(F.array_sort(F.collect_list("h48")).alias("sig"))
    a = sigs.select(
        F.col(by).alias("type_a"), F.col("sig").alias("sig_a")
    )
    b = sigs.select(
        F.col(by).alias("type_b"), F.col("sig").alias("sig_b")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    u = F.slice(
        F.array_sort(F.array_union(F.col("sig_a"), F.col("sig_b"))), 1, k
    )
    inter = F.size(
        F.filter(
            u,
            lambda x: F.array_contains(F.col("sig_a"), x)
            & F.array_contains(F.col("sig_b"), x),
        )
    )
    est = F.round(inter.cast("double") / F.size(u), 6)

    d = df.select(by, id_col).distinct()
    da = d.select(F.col(by).alias("type_a"), F.col(id_col).alias("i"))
    db = d.select(F.col(by).alias("type_b"), F.col(id_col).alias("i"))
    both = (
        da.join(db, "i")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    totals = d.groupBy(by).agg(F.count(F.lit(1)).alias("n"))
    ta = totals.select(F.col(by).alias("type_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col(by).alias("type_b"), F.col("n").alias("n_b"))
    # pair spine from the totals cross (zero-overlap pairs must not vanish)
    exact = (
        ta.join(tb, F.col("type_a") < F.col("type_b"))
        .join(F.broadcast(both), ["type_a", "type_b"], "left")
        .withColumn("n_both", F.coalesce(F.col("n_both"), F.lit(0)))
        .select(
            "type_a",
            "type_b",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard_exact"),
        )
    )
    out = pairs.select("type_a", "type_b", est.alias("jaccard_est")).join(
        F.broadcast(exact), ["type_a", "type_b"]
    )
    return out.select(
        "type_a",
        "type_b",
        "jaccard_est",
        "jaccard_exact",
        (
            F.abs(F.col("jaccard_est") - F.col("jaccard_exact")) <= F.lit(0.25)
        ).alias("within_bound"),
    )


# --- space-saving heavy hitters (batch certification twin) -------------------


def make_space_saving_fold(k: int):
    """Returns fold(table, n, uids) -> n for a k-counter space-saving
    sketch — the ONE update implementation shared by the streaming op
    (streaming/stateful.heavy_hitters_stream) and the batch certification
    twin below, so the driver-checked batch contract certifies the exact
    fold the stream runs. ``table`` maps user_id -> [est_count, err] and is
    mutated in place; its size never exceeds k (eviction replaces the
    (count, user_id)-min victim, deterministic under ties).
    Guarantees (Metwally et al., 2005): any id with true count > n/k is
    tracked, and est − err ≤ true ≤ est for every tracked id."""

    def fold(table: dict, n: int, uids) -> int:
        for uid in uids:
            uid = int(uid)
            n += 1
            if uid in table:
                table[uid][0] += 1
            elif len(table) < k:
                table[uid] = [1, 0]
            else:
                victim = min(table, key=lambda u: (table[u][0], u))
                m = table[victim][0]
                del table[victim]
                table[uid] = [m + 1, m]
        return n

    return fold


def heavy_hitters_topk_sketch(
    events: DataFrame,
    k: int = 8,
    by: str = "event_type",
    id_col: str = "user_id",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Batch twin of ``streaming/stateful.heavy_hitters_stream``: the same
    k-counter space-saving fold (shared via ``make_space_saving_fold``)
    applied to each group's rows in (ts, id) order — deterministic, so the
    sketch contents replay exactly across engines and partitionings.

    Output: (by, id_col, est_count, err, n_total) — one row per tracked id.

    Scale shape: this is the CERTIFICATION form — one applyInPandas task
    folds each group sequentially (determinism requires a single total
    order). State is O(k); time is linear in the group. At 100 TB the
    production paths are the streaming op (bounded state per key, folds as
    data arrives) and ``heavy_hitters_merged`` below (per-partition
    sketches combined with the standard additive-error merge — its
    estimates are partition-dependent, which is why the oracle-hashed
    twin folds in one task instead; the merge form is contract-tested)."""
    fold = make_space_saving_fold(k)

    def per_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values([ts_col, id_col])
        table: dict = {}
        n = fold(table, 0, pdf[id_col].astype("int64"))
        items = sorted(table.items())
        return pd.DataFrame(
            [(pdf[by].iloc[0], u, c, e, n) for u, (c, e) in items],
            columns=[by, id_col, "est_count", "err", "n_total"],
        )

    by_type = events.schema[by].dataType.simpleString()
    schema = (
        f"{by} {by_type}, {id_col} long, est_count long, err long, "
        "n_total long"
    )
    return (
        events.select(by, id_col, ts_col)
        .groupBy(by)
        .applyInPandas(per_group, schema)
    )


def space_saving_partial_sketches(
    events: DataFrame,
    k: int = 8,
    by: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Per-partition space-saving sketches — the map side of the MERGE form
    (r5 verdict #6). Within each input partition, fold one k-counter table
    per group (the shared ``make_space_saving_fold``), accumulating across
    the partition's Arrow batches; emit the tracked counters plus one
    summary row per (partition, group) carrying that sketch's min-counter
    value m_i (the untracked-id upper bound; 0 while the table is not
    full) and its row count n_i. Summary rows have NULL ``id``.

    State per task is O(k · groups); nothing shuffles here."""
    fold = make_space_saving_fold(k)

    def per_partition(batches):
        import pandas as pd

        tables: dict = {}
        ns: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby(by, sort=False):
                t = tables.setdefault(g, {})
                ns[g] = fold(t, ns.get(g, 0), sub[id_col].astype("int64"))
        rows = []
        for g, t in tables.items():
            m_i = min(c for c, _ in t.values()) if len(t) >= k else 0
            for u, (c, e) in sorted(t.items()):
                rows.append((g, u, c, e, m_i, 0))
            rows.append((g, None, 0, 0, m_i, ns[g]))
        yield pd.DataFrame(
            rows, columns=[by, "id", "est", "err", "m", "n"]
        )

    by_type = events.schema[by].dataType.simpleString()
    return events.select(by, id_col).mapInPandas(
        per_partition,
        f"{by} {by_type}, id long, est long, err long, m long, n long",
    )


def heavy_hitters_merged(
    events: DataFrame,
    k: int = 8,
    by: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Distributed space-saving via the standard additive-error merge — the
    production batch form at 100 TB (the per-key sequential certification
    twin is ``heavy_hitters_topk_sketch``; the streaming op shares the
    same fold). One k-counter sketch per (partition, group), then a single
    keyed shuffle combines them:

      ub(u) = Σ_{i tracks u} est_i(u) + Σ_{i untracked} m_i
            = Σ_track est_i(u) + (M_total − Σ_track m_i)
      lb(u) = Σ_{i tracks u} (est_i(u) − err_i(u))

    emitted as est_count=ub, err=ub−lb, so ``est−err ≤ true ≤ est`` holds
    per id under ANY partitioning (each sketch bounds its own partition's
    truth; untracked partitions contribute ≤ m_i). Completeness: any id
    with global count > n/k exceeds n_i/k in at least one partition
    (pigeonhole) and is therefore tracked somewhere, so it appears in the
    union output. The union is NOT truncated to k — truncation after an
    ub-style merge can evict a true heavy hitter whose ub ranks below k
    inflated entries; callers rank by est_count and keep what they need.
    Output ≤ k · n_partitions rows per group (tiny), one exchange plus a
    broadcast of per-group scalar totals.

    Estimates are partitioning-dependent (unlike the deterministic twin),
    which is why this form is contract-tested, not oracle-hashed."""
    partials = space_saving_partial_sketches(events, k=k, by=by, id_col=id_col)
    # ONE combined groupBy folds tracked counters and sketch summaries
    # alike: summary rows all carry id = NULL, so they form exactly one
    # group per ``by`` whose sums are M_total = Σ m_i and n_total = Σ n_i.
    # The alternative — separate totals/tracked branches over ``partials``
    # — re-runs the mapInPandas sketch scan once per branch (Catalyst
    # pushes each branch's filter below any shared exchange, defeating
    # ReuseExchange), doubling the dominant full-scan cost at 100 TB.
    # The combined aggregate is k·P rows per group; it is EAGERLY
    # checkpointed so both downstream reads (totals split + tracked join)
    # consume materialized rows instead of recomputing the scan. The
    # returned relation stays lazy over that checkpoint (plan remains
    # inspectable); residue is one tiny caller-owned checkpoint per call.
    agg1 = (
        partials.groupBy(by, "id")
        .agg(
            F.sum("est").alias("est_track"),
            F.sum(F.col("est") - F.col("err")).alias("lb"),
            F.sum("m").alias("m_sum"),
            F.sum("n").alias("n_sum"),
        )
        .localCheckpoint()
    )
    totals = (
        agg1.filter(F.col("id").isNull())
        .select(
            by,
            F.col("m_sum").alias("m_total"),
            F.col("n_sum").alias("n_total"),
        )
    )
    tracked = agg1.filter(F.col("id").isNotNull())
    ub = F.col("est_track") + F.col("m_total") - F.col("m_sum")
    return tracked.join(F.broadcast(totals), by).select(
        by,
        F.col("id").alias(id_col),
        ub.alias("est_count"),
        (ub - F.col("lb")).alias("err"),
        "n_total",
    )

"""Distributed graph ranking over relational edge lists.

The reference has no graph operator; this extends the engine with the
iterative-algorithm class a large-scale curation pipeline needs (link-graph
quality weighting a la PageRank is a standard web-corpus signal). The
design is the canonical Spark PageRank shape — edges partitioned once and
reused across iterations, per-iteration join + keyed aggregation — but the
arithmetic is FIXED-POINT INTEGER (BIGINT, scaled 1e12):

* float PageRank is shuffle-order-dependent (IEEE addition is not
  associative), so two engines — or two runs on different partitionings —
  disagree in the last ulps and can flip ranking ties;
* integer addition IS associative, so every rank is bit-exact regardless
  of partitioning, and the DuckDB oracle can replay the identical
  recurrence (unrolled one CTE per iteration) and match EXACTLY.

Scale notes (100 TB): each iteration is one shuffle keyed on ``dst``
(partial aggregation absorbs the per-edge contributions map-side) plus a
join of the static edge list with the current rank vector keyed on ``src``.
The edge list is the big side and keeps ONE partitioning across all
iterations (exchange reuse); the rank vector is |V| rows — shuffled, never
collected. Iteration count is a bounded constant (default 5), so the job
is a fixed-length DAG, not a convergence loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from realtime_market_data_pipeline_spark.session import (
    release_local_checkpoint,
)

SCALE = 1_000_000_000_000  # 1e12 fixed-point: BIGINT rank, exact across engines
DAMP_NUM, DAMP_DEN = 85, 100  # damping d = 0.85 as an integer ratio
TELE_NUM = DAMP_DEN - DAMP_NUM  # teleport (1 - d) = 0.15


def undirected_edges(
    pairs: DataFrame, src: str, dst: str, *, disjoint: bool = False
) -> DataFrame:
    """Symmetrize a distinct (src, dst) pair list: every edge appears in
    both directions, so every node has in-degree >= 1 and the dangling-mass
    term vanishes (documented simplification; the bipartite trade graph
    this engine ranks has no natural sink nodes).

    ``disjoint=True`` declares that the src and dst domains cannot
    collide (e.g. the trade graph's even-customer / odd-supplier node
    encoding) AND ``pairs`` is already distinct — then fwd and rev are
    disjoint distinct sets and the union needs no ``distinct()``, saving
    a full |2E|-row shuffle at edge-build time (at 100 TB of edges that
    dedup shuffle is the single largest cost of the build)."""
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    out = fwd.unionByName(rev)
    return out if disjoint else out.distinct()


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    iterations: int = 5,
    scale: int = SCALE,
    materialize: bool = True,
) -> DataFrame:
    """Fixed-point PageRank over a symmetric BIGINT edge list (src, dst).

    Recurrence (all BIGINT, ``div`` truncating division — positive
    operands, so Spark's truncate-toward-zero and DuckDB's floor agree)::

        r0      = scale div N
        c(e)    = r(src) div deg(src)          per edge
        r'(v)   = (r0 * 15) div 100  +  (85 * sum c(in-edges)) div 100

    i.e. teleport (1-d)/N plus damped in-flow, the standard recurrence.

    Returns (node, rank_fp) with rank_fp the iteration-``iterations``
    fixed-point rank. Exactly reproducible: integer sums are associative,
    so the result is independent of partitioning and matches the unrolled
    DuckDB replay bit-for-bit.

    ``materialize`` (default, r6): eagerly localCheckpoint the |V|-row
    result and RELEASE the two persisted edge relations before returning.
    Spark's SQL cache is held by the CacheManager, never the GC — a lazy
    return would leak executor storage on every invocation, which is how
    a long-running engine dies slowly. Pass ``materialize=False`` only to
    inspect the lazy plan (the iteration plan-shape tests do).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # Static per-iteration left side: (src, dst, deg) — built in ONE
    # exchange (r7) and PERSISTED. The previous form (persist edges →
    # groupBy-count deg → join edges⋈deg) shuffled the |E|-row relation
    # twice at build (once for the degree agg, once to co-partition the
    # join) and cached it twice; a whole-partition window count computes
    # deg in the same single hash(src) exchange that co-locates the
    # per-iteration join, and the WindowExec's partition-spec sort leaves
    # the cache SORTED by src — so with
    # spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true
    # (session.py) every iteration's sort-merge join reuses both the
    # partitioning and the ordering, shuffling only the |V|-row rank
    # vector, never the |E|-row edge relation (the canonical Spark
    # PageRank move, now actually visible in the executed plan).
    ed = (
        edges.withColumn(
            "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Node set and N ride the same cached partitioning: distinct over the
    # partition key is exchange-free on the cached relation.
    nodes = ed.select(F.col("src").alias("node")).distinct()
    # N is a scalar: 1-row aggregate, broadcast into the seed projection.
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"CAST({scale} AS BIGINT) div n").alias("rank_fp"), "n"
    )

    for _ in range(iterations):
        contrib = ed.join(
            ranks.select("node", "rank_fp", "n"),
            ed["src"] == F.col("node"),
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank_fp div deg").alias("c"),
            "n",
        )
        sums = contrib.groupBy("node").agg(
            F.sum("c").alias("s"), F.first("n").alias("n")
        )
        ranks = sums.select(
            "node",
            F.expr(
                f"(CAST({scale} AS BIGINT) div n) * {TELE_NUM} div {DAMP_DEN}"
                f" + {DAMP_NUM} * s div {DAMP_DEN}"
            ).alias("rank_fp"),
            "n",
        )
    result = ranks.select("node", "rank_fp")
    if materialize:
        result = result.localCheckpoint()  # eager: |V| rows, lineage cut
        ed.unpersist()
    return result


def pagerank_oracle_sql(
    edges_cte: str, *, iterations: int = 5, scale: int = SCALE, top_k: int = 20
) -> str:
    """Unrolled DuckDB replay of :func:`pagerank_fixed_point`.

    One CTE per iteration (recursive CTEs disallow the GROUP BY the
    recurrence needs); integer ops are engine-exact, and sums are cast
    back to BIGINT because DuckDB's sum() widens to HUGEINT."""
    parts = [
        f"WITH e0 AS ({edges_cte})",
        "e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
        "d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)",
        f"r0 AS (SELECT d.src AS node, CAST({scale} // n AS BIGINT) AS rank_fp, n"
        " FROM d CROSS JOIN nn)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"r{i} AS (SELECT e.dst AS node,"
            f" CAST(({scale} // min(r.n)) * {TELE_NUM} // {DAMP_DEN}"
            f" + {DAMP_NUM} * CAST(sum(r.rank_fp // d.deg) AS BIGINT) // {DAMP_DEN}"
            f" AS BIGINT) AS rank_fp, min(r.n) AS n"
            f" FROM e JOIN d ON e.src = d.src JOIN r{i-1} r ON r.node = e.src"
            f" GROUP BY e.dst)"
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT node, node % 2 = 1 AS is_supplier, rank_fp
FROM r{iterations}
ORDER BY rank_fp DESC, node
LIMIT {top_k}
"""
    )


HITS_SCALE = 1_000_000_000  # 1e9: L1-normalized v <= scale, so v*scale <= 1e18
# stays inside BIGINT, while scale div n seeds stay nonzero up to ~1e9 hubs


def hits_fixed_point(
    edges: DataFrame, *, iterations: int = 3, scale: int = HITS_SCALE
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs/authorities over a DIRECTED bipartite edge list
    (src = hub side, dst = authority side), in fixed-point BIGINT with L1
    normalization after every half-step::

        h0(c)    = scale div |hubs|
        a_raw(s) = Σ h(src) over in-edges       ; a = a_raw·scale div Σa_raw
        h_raw(c) = Σ a(dst) over out-edges      ; h = h_raw·scale div Σh_raw

    All integer ops ⇒ bit-exact under any partitioning, replayable in SQL.
    scale=1e9: L1 normalization bounds every score by scale, so v·scale
    ≤ 1e18 stays inside BIGINT, and the seed scale div |hubs| stays
    nonzero up to ~1e9 hub nodes (beyond that, move the product into
    DECIMAL(38,0)). Requires iterations ≥ 1.
    Returns (hubs, authorities) DataFrames of (node, score_fp).

    Scale notes: same shape as PageRank — the persisted edge list keeps one
    partitioning; each half-step shuffles only the score vector; the L1
    totals are 1-row aggregates broadcast back into the normalization."""
    from pyspark import StorageLevel

    if iterations < 1:
        raise ValueError("hits_fixed_point requires iterations >= 1")
    # The two half-steps join the edge list on DIFFERENT keys (src for
    # a_raw, dst for h_raw), so one cached partitioning cannot serve
    # both: a single cache re-exchanged + re-sorted the full |E|-row
    # relation 2·iterations times. Cache it TWICE instead (r7), each copy
    # repartitioned AND sorted by its half-step's join key — the standard
    # "edge list partitioned both ways" trade (2× edge storage for zero
    # per-half-step edge movement), which is exactly what wins at 100 TB
    # where |E| dwarfs the score vectors. With
    # canChangeCachedPlanOutputPartitioning=true both caches' layout is
    # visible to every consumer, so only the |V|-row score vectors
    # shuffle per half-step.
    e_by_src = (
        edges.repartition("src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # derived FROM the first cache, not from `edges`: re-deriving the lazy
    # edge build (source scans + join + distinct) a second time costs more
    # than the one cache-to-cache exchange this does
    e_by_dst = (
        e_by_src.repartition("dst")
        .sortWithinPartitions("dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hubs0 = e_by_src.select("src").distinct()
    n_df = hubs0.agg(F.count(F.lit(1)).alias("n"))
    h = hubs0.crossJoin(F.broadcast(n_df)).select(
        F.col("src").alias("node"),
        F.expr(f"CAST({scale} AS BIGINT) div n").alias("v"),
    )
    a = None
    # Lineage control, one EAGER job per iteration (r7 — was four): lazy
    # lineage across iterations re-derives the whole chain once per
    # consumer (2^(2·iters) blowup: a 2 s job took 50 s at sf0.01), and
    # mere persist() of the full recursion keeps the exponentially nested
    # LOGICAL plan, which overflows the stack when Spark stringifies it.
    # But only the per-iteration OUTPUT vector needs a checkpoint to
    # truncate the plan: within one iteration every intermediate hangs off
    # the previous checkpointed h, so their plans are constant-depth, and
    # the twice-consumed raw-sum relations (L1 total + normalization) need
    # only a persist() — the iteration-ending h checkpoint materializes
    # the whole chain, including both caches, in its single job. Four
    # eager jobs per iteration collapse into one; checkpoint RDDs are not
    # reclaimed by GC in practice under PySpark, so superseded ones are
    # released explicitly the moment the new checkpoint has materialized.
    # Residue after return: exactly the two returned vectors
    # (caller-owned). Use a reliable checkpoint dir on a real cluster.
    for it in range(iterations):
        a_raw = (
            e_by_src.join(h, e_by_src["src"] == h["node"])
            .groupBy(e_by_src["dst"].alias("node"))
            .agg(F.sum("v").alias("vr"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        a_tot = a_raw.agg(F.sum("vr").alias("t"))
        a = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "node", F.expr(f"vr * CAST({scale} AS BIGINT) div t").alias("v")
        )
        if it == iterations - 1:
            # the final a outlives the loop (caller's authorities side) —
            # checkpoint it BEFORE its inputs are released below
            a = a.localCheckpoint()
        h_raw = (
            e_by_dst.join(a, e_by_dst["dst"] == a["node"])
            .groupBy(e_by_dst["src"].alias("node"))
            .agg(F.sum("v").alias("vr"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        h_tot = h_raw.agg(F.sum("vr").alias("t"))
        h_prev = h
        h = (
            h_raw.crossJoin(F.broadcast(h_tot))
            .select(
                "node", F.expr(f"vr * CAST({scale} AS BIGINT) div t").alias("v")
            )
            .localCheckpoint()  # eager: materializes the whole iteration
        )
        release_local_checkpoint(h_prev)  # superseded (no-op on plain h0)
        a_raw.unpersist()
        h_raw.unpersist()
    # Final h/a are already EAGERLY checkpointed (every half-step is), so
    # nothing downstream re-reads the cached edge lists — release them now
    # rather than leaking SQL-cache storage per invocation (r6; the
    # CacheManager never GCs cached relations).
    e_by_src.unpersist()
    e_by_dst.unpersist()
    return h.select("node", F.col("v").alias("score_fp")), a.select(
        "node", F.col("v").alias("score_fp")
    )


def hits_oracle_sql(
    edges_cte: str, *, iterations: int = 3, scale: int = HITS_SCALE, top_k: int = 10
) -> str:
    """Unrolled DuckDB replay of :func:`hits_fixed_point` (sums cast back
    to BIGINT — DuckDB widens to HUGEINT)."""
    parts = [
        f"WITH e AS ({edges_cte})",
        "nc AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM e)",
        f"h0 AS (SELECT s.src AS node, CAST({scale} // n AS BIGINT) AS v"
        " FROM (SELECT DISTINCT src FROM e) s CROSS JOIN nc)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"a{i}r AS (SELECT e.dst AS node, CAST(sum(h.v) AS BIGINT) AS vr"
            f" FROM e JOIN h{i-1} h ON h.node = e.src GROUP BY e.dst)"
        )
        parts.append(f"a{i}t AS (SELECT CAST(sum(vr) AS BIGINT) AS t FROM a{i}r)")
        parts.append(
            f"a{i} AS (SELECT node, CAST(vr * {scale} // t AS BIGINT) AS v"
            f" FROM a{i}r CROSS JOIN a{i}t)"
        )
        parts.append(
            f"h{i}r AS (SELECT e.src AS node, CAST(sum(a.v) AS BIGINT) AS vr"
            f" FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src)"
        )
        parts.append(f"h{i}t AS (SELECT CAST(sum(vr) AS BIGINT) AS t FROM h{i}r)")
        parts.append(
            f"h{i} AS (SELECT node, CAST(vr * {scale} // t AS BIGINT) AS v"
            f" FROM h{i}r CROSS JOIN h{i}t)"
        )
    last = iterations
    return (
        ",\n".join(parts)
        + f"""
SELECT kind, node, score_fp FROM (
  (SELECT 'authority' AS kind, node, v AS score_fp FROM a{last}
   ORDER BY v DESC, node LIMIT {top_k})
  UNION ALL
  (SELECT 'hub' AS kind, node, v AS score_fp FROM h{last}
   ORDER BY v DESC, node LIMIT {top_k})
)
"""
    )

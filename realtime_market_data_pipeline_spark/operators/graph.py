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

SCALE = 1_000_000_000_000  # 1e12 fixed-point: BIGINT rank, exact across engines
DAMP_NUM, DAMP_DEN = 85, 100  # damping d = 0.85 as an integer ratio
TELE_NUM = DAMP_DEN - DAMP_NUM  # teleport (1 - d) = 0.15


def undirected_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrize a distinct (src, dst) pair list: every edge appears in
    both directions, so every node has in-degree >= 1 and the dangling-mass
    term vanishes (documented simplification; the bipartite trade graph
    this engine ranks has no natural sink nodes)."""
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_fixed_point(
    edges: DataFrame, *, iterations: int = 5, scale: int = SCALE
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
    """
    from pyspark import StorageLevel

    # Persist the symmetrized edge list: degree, node set, node count, and
    # the per-iteration join side all derive from it — without the persist,
    # every one of those branches re-derives the edge build (and its source
    # scans) from scratch.
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Static per-iteration left side: (src, dst, deg) — built once, PERSISTED
    # (the canonical Spark PageRank move: without it, lazy lineage re-derives
    # the edge list — including its source scans — once per iteration). The
    # groupBy join leaves it hash-partitioned by src, and InMemoryTableScan
    # preserves that outputPartitioning, so each iteration's join shuffles
    # only the |V|-row rank vector, never the |E|-row edge list.
    ed = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    nodes = deg.select(F.col("src").alias("node"))
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
    return ranks.select("node", "rank_fp")


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

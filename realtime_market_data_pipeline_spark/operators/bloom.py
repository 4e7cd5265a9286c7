"""Bloom-filter join pruning — the classic 100 TB shuffle reducer.

When the probe side of a join is huge and the build side is too big (or
too remote) to broadcast as a full hash relation, a Bloom filter of the
build keys still fits in kilobytes and kills most non-matching probe
rows BEFORE they reach the shuffle. Spark's own runtime row-group
filtering does a version of this internally (``bloom_filter_agg`` /
``might_contain``), but those expressions are not registered SQL
surface in every build — so this module implements the same dataflow as
plain Column arithmetic:

- positions come from md5-derived integers (``conv(substr(md5, 1, 15),
  16, 10) % m`` per seed), the engine's standard engine-portable hash —
  never a JVM-private hash an oracle cannot replay;
- the bitmap is built DISTRIBUTED: keys explode into their k bit
  positions and distinct-reduce server-side, so only distinct set bits
  (≤ min(k·|keys|, m)) ever reach the driver — the bounded-collect
  contract k-means centroids use (``similarity.ivf_train_centroids``);
- the membership test is an AND of k bit probes — whole-stage codegen,
  no UDF — evaluated before the probe side's shuffle; the bitmap rides
  as a 1-row BROADCAST relation (``attach_bloom``), because element_at
  over a large array plan literal measured O(m) per row (19 s vs 2 s on
  600k rows at 2^21 bits) while the broadcast column is constant-time
  at any m. The literal form stays available for small bitmaps
  (≤~2^14 bits), e.g. streaming filters.

No false negatives ⇒ prefilter + exact join ≡ plain join, which is the
oracle contract; false positives only cost re-verification in the join.
Reference scope: the reference has no join pruning at all
(spark_streaming.py processes one relation) — this is part of the
LLM-scale toolkit the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.io import local_rows_df


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k md5-derived bit positions in [0, m_bits) for a key column.

    Fast family (r15): ONE digest sliced into k disjoint 24-bit hex
    chunks — ``conv(substring(md5, 1+6i, 6)) % m`` — instead of k
    digests over k distinct prefixes. Whole-stage codegen does NOT
    eliminate common subexpressions inside a filter predicate (the r14
    K-M revert; re-measured r15 — materializing h1/h2 as projection
    columns does not help either, PushDownPredicates re-inlines the
    aliases into the pushed filter, plan receipt in
    OPTIMIZATION_r15.md), so the md5 expression still evaluates k
    times — but each evaluation drops the per-i prefix concat and the
    15-hex conv narrows to 6 hex (interleaved A/B on a 10M-row
    synthetic: ~13% faster, identical FPR model — md5 bits are
    uniform, disjoint slices are independent).

    Applicability guard: k slices of 6 hex chars must fit one 32-char
    digest and address every bit (m <= 2^24); larger bitmaps or k > 5
    keep the r13 k-digest family. Build and probe both route through
    THIS function, so the family choice is a pure function of
    (m_bits, k) and bitmap/probe always agree."""
    if k * 6 <= 32 and m_bits <= (1 << 24):
        h = F.md5(F.concat(F.lit("bloomS:"), col.cast("string")))
        return [
            F.conv(F.substring(h, 1 + 6 * i, 6), 16, 10).cast("long")
            % m_bits
            for i in range(k)
        ]
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}:"), col.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 17, k: int = 5
) -> list[int]:
    """Build the m-bit bloom bitmap of a key set as ``m_bits/64`` longs.
    The explode+distinct runs distributed; the driver receives only the
    distinct SET BITS and packs them into words. m_bits must be a
    multiple of 64. Sizing: FPR ≈ (1 - e^(-k·n/m))^k — the default
    2^17 bits / k=5 holds ~9k keys at ≈1% FPR in 16 KiB."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    import numpy as np

    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, k))
    ).alias("p")
    # NULL keys hash to NULL positions (md5 over a null concat is null
    # all the way down) which arrive as NaN in the Arrow transfer and
    # crash the int64 cast — and a null key can never match an
    # inner/semi join anyway, so it contributes nothing to the bitmap.
    # Filter them out of the build.
    # Arrow transfer + vectorized packing: the distinct positions are
    # bounded by m_bits regardless of key count, so this stays a
    # bitmap-sized exchange even when the key set is huge.
    pdf = (
        keys.filter(F.col(key_col).isNotNull())
        .select(pos)
        .distinct()
        .toPandas()
    )
    p = pdf["p"].to_numpy(dtype=np.int64)
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    np.bitwise_or.at(
        words, p >> 6, np.uint64(1) << (p & 63).astype(np.uint64)
    )
    # view as SIGNED 64-bit so the values round-trip as Spark longs
    return [int(w) for w in words.view(np.int64)]


def bloom_might_contain(
    bitmap: list[int] | Column, col: Column, m_bits: int, k: int = 5
) -> Column:
    """Membership predicate: AND over the k bit probes, each
    ``shiftright(element_at(bm, p>>6 + 1), p & 63) & 1`` — all
    whole-stage-codegen built-ins, no UDF. ``bitmap`` is either the
    word list (riding as an array<long> PLAN LITERAL — right for small
    bitmaps, e.g. ≤2^14 bits; measured: element_at over a plan-literal
    array costs O(m) PER ROW once the literal is large, so big bitmaps
    must NOT use this form) or a Column referencing the array (the
    ``attach_bloom`` broadcast-relation form — constant-time access at
    any m; use it beyond ~2^14 bits)."""
    bm = bitmap if isinstance(bitmap, Column) else F.lit(bitmap)
    tests = []
    for p in _positions(col, m_bits, k):
        word = F.element_at(bm, (p / 64).cast("int") + 1)
        # SQL shiftright takes a column shift amount; the pyspark wrapper
        # F.shiftright insists on a python int, so call the SQL function
        shifted = F.call_function("shiftright", word, (p % 64).cast("int"))
        tests.append(shifted.bitwiseAND(F.lit(1)) == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


BLOOM_COL = "__bloom_bm"


def attach_bloom(
    df: DataFrame, bitmap: list[int], name: str = BLOOM_COL
) -> DataFrame:
    """Ride the bitmap next to every row as a BROADCAST single-row
    relation (BroadcastNestedLoopJoin with a 1-row build side — one
    tiny broadcast, the array stored once per executor). This is the
    scale form: a big array PLAN LITERAL costs O(m) per row in
    element_at (measured 19 s vs 2 s on 600k rows at 2^21 bits), while
    the broadcast column is constant-time at any m."""
    spark = df.sparkSession
    # 1-slice local relation: the default createDataFrame splits even a
    # 1-row local dataset into defaultParallelism slices, and the
    # broadcast build then runs one Python task round per slice
    bm_df = local_rows_df(spark, [(bitmap,)], f"{name} array<bigint>")
    return df.crossJoin(F.broadcast(bm_df))


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    m_bits: int | None = None,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Bloom-prefiltered equi-join: build a bloom of ``build[on]``, drop
    probe rows that cannot match BEFORE the join's exchange, then run
    the exact join. Because blooms have no false negatives the result
    is row-identical to ``probe.join(build, on, how)`` — the few false
    positives that survive the prefilter are removed by the join itself.
    At scale this turns a shuffle of the full probe side into a shuffle
    of ~|matching| + FPR·|non-matching| rows for 2·k md5 evaluations per
    row — almost always a win when the join selectivity is under ~50%.
    ``how`` must be a type whose result only contains probe rows that
    match (inner/semi) — pruning the probe side is unsound for outer
    variants.

    ``m_bits=None`` (default) AUTO-SIZES the bitmap to the build
    cardinality: next power of two ≥ 16·n distinct keys (≈0.3% FPR at
    k=5), clamped to [2^14, 2^24] — one extra count() job on the SMALL
    side. A fixed undersized m silently saturates as data grows (FPR→1,
    prefilter degenerates to pure overhead — measured: a 2^14 bitmap
    held 1.33× @8× rows, then 24× @32× when 19k keys saturated it);
    correctness is unaffected at any m (no false negatives), only the
    pruning power. Pass an explicit m only when the key count is known
    and stable."""
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(f"bloom prefilter is unsound for how={how!r}")
    # Null build keys never match an inner/semi join and would poison
    # the bitmap build (see bloom_build), so drop them up front; the
    # DISTINCT key set is computed once and, when auto-sizing needs a
    # count() pass too, persisted across the two jobs so the build side
    # is scanned exactly once.
    keys = build.select(on).filter(F.col(on).isNotNull()).distinct()
    persisted = False
    if m_bits is None:
        keys = keys.persist()
        persisted = True
        n = keys.count()
        m_bits = max(1 << 14, min(1 << 24, 1 << (16 * n - 1).bit_length()))
    try:
        bitmap = bloom_build(keys, on, m_bits=m_bits, k=k)
    finally:
        if persisted:
            keys.unpersist()
    pre = (
        attach_bloom(probe, bitmap)
        .filter(
            bloom_might_contain(F.col(BLOOM_COL), F.col(on), m_bits, k=k)
        )
        .drop(BLOOM_COL)
    )
    return pre.join(build, on, how)

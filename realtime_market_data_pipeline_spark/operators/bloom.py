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
- the membership test is an AND of k bit probes against an
  array<long>-literal bitmap riding in the plan — whole-stage codegen,
  no UDF, no extra exchange, evaluated before the probe side's shuffle.

No false negatives ⇒ prefilter + exact join ≡ plain join, which is the
oracle contract; false positives only cost re-verification in the join.
Reference scope: the reference has no join pruning at all
(spark_streaming.py processes one relation) — this is part of the
LLM-scale toolkit the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k md5-derived bit positions in [0, m_bits) for a key column."""
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
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, k))
    ).alias("p")
    words = [0] * (m_bits // 64)
    for r in keys.select(pos).distinct().collect():
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # pack to SIGNED 64-bit so the values round-trip as Spark longs
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    bitmap: list[int], col: Column, m_bits: int, k: int = 5
) -> Column:
    """Membership predicate: AND over the k bit probes. The bitmap rides
    as ONE array<long> literal in the plan (a few KiB — cheaper than any
    broadcast exchange) and each probe is
    ``shiftright(element_at(bm, p>>6 + 1), p & 63) & 1`` — all
    whole-stage-codegen built-ins."""
    bm = F.lit(bitmap)
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


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    m_bits: int = 1 << 17,
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
    variants."""
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(f"bloom prefilter is unsound for how={how!r}")
    bitmap = bloom_build(build.select(on), on, m_bits=m_bits, k=k)
    pre = probe.filter(bloom_might_contain(bitmap, F.col(on), m_bits, k=k))
    return pre.join(build, on, how)

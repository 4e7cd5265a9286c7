"""Skew-mitigation operators: salting for hot keys.

Catalyst's partial aggregation already neutralizes skewed ``groupBy`` keys
for algebraic aggregates (map-side combine bounds shuffle rows by group
count per partition), and AQE's skewJoin splits oversized sort-merge
partitions at runtime (both enabled in session.get_spark). Salting remains
the explicit tool for the two cases those don't cover:

- **skewed shuffle joins** where one side's hot key floods a single task
  and the other side is too big to broadcast *whole* but cheap to
  *replicate per salt* (``salted_join``);
- **holistic aggregates** (collect_set & friends) whose per-key state —
  not row count — is the bottleneck, fixed by a two-phase combine
  (``salted_collect_set``).

Both produce results identical to the unsalted form; the salt only changes
the physical distribution. Salts are assigned with ``rand()`` —
nondeterministic placement, deterministic results, no pre-scan of the key
histogram needed."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: each skewed row gets a random
    salt in [0, num_salts); ``other`` is replicated once per salt; the join
    key becomes (on…, salt), splitting each hot key across num_salts tasks.

    Cost model: shuffle volume of ``other`` grows num_salts×, the hot key's
    single-task row count shrinks num_salts× — profitable when the skewed
    side's largest key ≫ |other| / num_salts. Only inner/left joins are
    meaningful (the replicated right side would duplicate right-outer rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt = (F.rand(seed) * num_salts).cast("int").alias("_salt")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = left.join(right, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    num_salts: int = 16,
    seed: int = 42,
    out_col: str | None = None,
) -> DataFrame:
    """Two-phase collect_set: per-(key, salt) partial sets, then a final
    flatten + distinct per key. A hot key's set is built by num_salts tasks
    instead of one; the final phase merges num_salts arrays per key instead
    of all raw rows — same result, no single-task state blowup."""
    out_col = out_col or f"{value_col}_set"
    salt = (F.rand(seed) * num_salts).cast("int").alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value_col).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.array_distinct(F.flatten(F.collect_list("_partial"))).alias(out_col)
        )
    )

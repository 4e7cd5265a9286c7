"""Physical-plan introspection — the engine's "is this the plan I'd want at
100 TB?" toolkit.

The reference delegates all physical planning to Catalyst/Tungsten
(SURVEY.md §4) and so do we — but delegation still needs verification: a
filter that doesn't reach the parquet scan, a broadcast that silently became
a shuffle join, or an expression that fell out of whole-stage codegen are
silent 10-100× regressions at scale. These helpers turn `.explain` output
into assertable facts; tests/test_plans.py pins the plan shape of every
headline query.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def aqe_disabled(spark: SparkSession):
    """Plan queries with AQE off so the static physical plan carries its
    final operators (codegen spans, join strategies chosen from static
    stats). Build the DataFrame INSIDE this context — a DataFrame caches its
    queryExecution at first planning."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's file scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — assert column pruning (a scan reading
    all columns for a narrow projection is wrong)."""
    return re.findall(r"ReadSchema: (\S+)", plan_string(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets actually read by each parquet scan."""
    return [
        set(re.findall(r"(\w+):", schema)) for schema in read_schemas(df)
    ]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan_string(df),
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges) — the
    scale-limiting operator count. AQE may coalesce partitions at runtime
    but never removes a planned exchange. Parsed from simple mode (the
    formatted tree hides partitioning under AQE)."""
    s = plan_string(df, "simple")
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", s
        )
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan splits an aggregate into partial (map-side) +
    final — the pattern that bounds shuffle volume by group count, not row
    count."""
    return "partial_" in plan_string(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees. More isn't better per se —
    but zero means the whole plan runs interpreted. Build the DataFrame
    under ``aqe_disabled``: an AdaptiveSparkPlan inserts codegen only at
    execution, so the pre-execution count is always 0 with AQE on."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan_string(df, "codegen"))
    return int(m.group(1)) if m else 0


def summarize(df: DataFrame) -> dict:
    """One-look plan summary for notebooks/debugging."""
    return {
        "joins": join_strategies(df),
        "shuffle_exchanges": exchange_count(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "partial_agg": has_partial_aggregation(df),
        "codegen_stages": codegen_stage_count(df),
    }

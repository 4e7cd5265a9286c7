#!/usr/bin/env python
"""Optimization-loop helper (r14/r15): time named queries into the noop sink
and capture their formatted plans.

Usage:
    python scripts/opt_bench.py [--plans DIR_SUFFIX] [--round rNN]
                                [--runs N] name [name ...]

Each query runs ``fn(spark, $SPARK_GRAFT_SF_DIR)`` (default sf0.1) into the
noop sink (guide §1.4) with a job description label (guide §1.5), RUNS times
(default 2, min reported). With --plans SUFFIX, the ``explain("formatted")``
text is written to plans/<round>/<name>_<SUFFIX>.txt (default round r15)
for the judge to diff.

This is a dev loop tool, NOT the driver bench — bench.py keeps the contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_market_data_pipeline_spark import queries as Q  # noqa: E402
from realtime_market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    plans_suffix = None
    runs = 2
    round_dir = "r15"
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_suffix = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        elif args[0] == "--round":
            round_dir = args[1]
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt-bench")
    # same warmup as bench.py's core: JVM + Arrow channel
    Q.QUERIES["kpi_summary"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", round_dir,
    )
    os.makedirs(plan_dir, exist_ok=True)
    out = {}
    for name in names:
        fn = Q.QUERIES[name]
        if plans_suffix:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plan_dir, f"{name}_{plans_suffix}.txt"), "w"
            ) as fh:
                fh.write(txt)
        best = None
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"opt: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)
    print({"sf_dir": sf_dir, "timings": out})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Strict local replica of the driver's correctness gate.

Runs each registered query at sf0.01 next to its DuckDB oracle and compares
row count, column set, and EXACT values (no float tolerance — the driver
hashes canonicalized values, so a 1-ulp difference fails there too).

Every query also runs under a PER-QUERY WALL BUDGET (r10, r9 verdict #6:
the O(rows²) gapfill frame hid in a value-green sweep until sf0.1 got
timed — 198 s wall on correct output). A query exceeding the budget FAILS
the sweep even when its values match, so the next accidental quadratic
cannot hide. Default 60 s (generous vs the ~1 s/query norm and local[8]
host noise; the r9 quadratic was 198 s); tighten via
SPARK_GRAFT_QUERY_BUDGET_SEC, or set it <= 0 to disable.

Usage: python scripts/local_driver_check.py [first_n] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_QUERY_BUDGET_SEC", "60"))


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals, dates, timestamps → canonical string
    return v


def _key(row):
    return tuple((x is None, str(x)) for x in row)


def main() -> int:
    from pyspark.sql import SparkSession

    from realtime_market_data_pipeline_spark import queries as Q
    from tests.oracle_utils import duckdb_con

    args = sys.argv[1:]
    first_n = int(args[0]) if args and args[0].isdigit() else 50
    names = args[1:] if len(args) > 1 else list(Q.QUERIES)[:first_n]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(SF_DIR)

    n_pass = n_hash = n_err = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = Q.QUERIES[name](spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(_norm(v) for v in r) for r in sdf.collect()]
            if name not in Q.ORACLES:
                el = time.time() - t0
                if 0 < BUDGET_SEC < el:
                    print(f"BUDGET    {name}: {el:.1f}s > {BUDGET_SEC:.0f}s wall budget")
                    n_hash += 1
                else:
                    print(f"ROWS_ONLY {name}: {len(s_rows)} rows ({el:.1f}s)")
                    n_pass += 1
                continue
            o = con.sql(Q.ORACLES[name])
            o_cols = [c.lower() for c in o.columns]
            o_rows = [tuple(_norm(v) for v in r) for r in o.fetchall()]
            if sorted(s_cols) != sorted(o_cols):
                print(f"SCHEMA    {name}: {sorted(s_cols)} vs {sorted(o_cols)}")
                n_hash += 1
                continue
            if len(s_rows) != len(o_rows):
                print(f"ROWCOUNT  {name}: spark={len(s_rows)} oracle={len(o_rows)}")
                n_hash += 1
                continue
            sidx = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            oidx = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            ss = sorted([tuple(r[i] for i in sidx) for r in s_rows], key=_key)
            oo = sorted([tuple(r[i] for i in oidx) for r in o_rows], key=_key)
            bad = sum(1 for a, b in zip(ss, oo) if _key(a) != _key(b))
            if bad:
                ex = next((a, b) for a, b in zip(ss, oo) if _key(a) != _key(b))
                print(f"HASH      {name}: {bad}/{len(ss)} rows differ; e.g. {ex[0]} != {ex[1]}")
                n_hash += 1
            else:
                el = time.time() - t0
                if 0 < BUDGET_SEC < el:
                    print(f"BUDGET    {name}: values OK but {el:.1f}s > {BUDGET_SEC:.0f}s wall budget")
                    n_hash += 1
                else:
                    print(f"OK        {name}: {len(ss)} rows ({el:.1f}s)")
                    n_pass += 1
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"ERR       {name}: {msg}")
            n_err += 1
    print(f"\n{n_pass} ok, {n_hash} mismatch, {n_err} error / {len(names)}")
    spark.stop()
    return 1 if (n_hash or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's oracle comparison so tests catch mismatches
before the round gate does: row-count + column-name + order-insensitive value
comparison (floats with tolerance) between a Spark DataFrame and DuckDB SQL
over the same parquet tables."""

from __future__ import annotations

import math
import os

import duckdb

from realtime_market_data_pipeline_spark.io import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _sorted_rows(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, sql: str, sf_dir: str, float_tol: float = 1e-6) -> None:
    con = duckdb_con(sf_dir)
    oracle = con.sql(sql)
    o_cols = [c.lower() for c in oracle.columns]
    o_rows = oracle.fetchall()

    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"

    s_sorted = _sorted_rows(s_rows, s_cols)
    o_sorted = _sorted_rows(o_rows, o_cols)
    mismatches = 0
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if not math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol):
                    mismatches += 1
                    if mismatches < 5:
                        print(f"row {i}: {a} != {b}")
                    break
            elif x != y:
                mismatches += 1
                if mismatches < 5:
                    print(f"row {i}: {a} != {b}")
                break
    assert mismatches == 0, f"{mismatches}/{len(s_rows)} rows differ"

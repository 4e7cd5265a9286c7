"""Guard against the two driver-canonicalizer failure classes seen in r3/r4:

1. HUGEINT oracle outputs (bare ``sum(BIGINT)`` in DuckDB widens to HUGEINT,
   which the driver hashes differently from Spark's BIGINT even when values
   are identical — `tick_validation_counts` r3, `doc_train_eval_split` r4).
2. Nested (list/struct/map) output columns, which crash the driver's pandas
   ``sort_values``/``factorize`` canonicalizer with ``unhashable type: 'list'``
   (`embedding_l2_normalized` / `embedding_quantized_int8` r4).

Hand-sweeps leak (the r3 fix missed the r4 query), so this makes the class
unrepresentable: every registered oracle must bind to driver-hashable scalar
types. Binding is lazy in DuckDB, so the sweep costs planning only.
"""

import duckdb
import pytest

import realtime_market_data_pipeline_spark.queries as Q
from tests.oracle_utils import duckdb_con

SF_DIR = "/root/testdata/sf0.001"

# The full set of types any oracle emitted as of round 5 — all scalar, all
# hashed identically by the driver for both engines. Widen deliberately if a
# new query genuinely needs a new scalar type; never add HUGEINT or nested.
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "TIMESTAMP", "BOOLEAN",
           "DATE", "SMALLINT", "TINYINT", "FLOAT"}


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duckdb_con(SF_DIR)


def test_every_oracle_output_is_driver_hashable(con):
    offenders = []
    for name, sql in Q.ORACLES.items():
        rel = con.sql(sql)
        for col, t in zip(rel.columns, rel.types):
            ts = str(t)
            if ts not in ALLOWED:
                offenders.append((name, col, ts))
    assert not offenders, (
        "oracle outputs with non-driver-hashable dtypes (HUGEINT hashes "
        f"differently from Spark BIGINT; nested types crash the hasher): {offenders}"
    )

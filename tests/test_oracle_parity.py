"""Every registered query with an oracle must match DuckDB at sf0.001
(the driver gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from realtime_market_data_pipeline_spark import queries as Q
from tests.conftest import SF_SMALL
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(Q.ORACLES))
def test_query_matches_oracle(spark, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = Q.QUERIES[name](spark, SF_SMALL)
    # Nested output columns crash the driver's pandas canonicalizer
    # (r4: unhashable type 'list') — oracle-checked queries must emit scalars.
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, f"driver-unhashable nested output columns: {nested}"
    compare(df, Q.ORACLES[name], SF_SMALL)


def test_all_oracle_keys_have_queries():
    assert set(Q.ORACLES) <= set(Q.QUERIES)


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0

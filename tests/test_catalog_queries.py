"""Every catalog query with an oracle must match it (the driver's gate, local)."""

from __future__ import annotations

import pytest

from data_warehouse_spark.queries_catalog import QUERIES

from .conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = sorted(name for name, qd in QUERIES.items() if qd.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    qd = QUERIES[name]
    df = qd.fn(spark, SF_DIR)
    assert_matches_oracle(df, qd.oracle, SF_DIR)


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema is not None
    assert set(mod.oracle_sql()) <= set(mod.queries())

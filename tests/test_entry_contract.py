"""Mirror of the driver's t2 gate: run every queries() entry and its
oracle_sql() side-by-side at sf0.001 and compare values."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, TABLES
from tests.helpers import assert_matches


@pytest.fixture(scope="session")
def entry_oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


ALL = sorted(entry_mod.queries().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, entry_oracle, name):
    q = entry_mod.queries()[name]
    osql = entry_mod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    if osql is None:
        assert df.count() >= 0  # rows-only check
        return
    assert_matches(df, entry_oracle, osql)

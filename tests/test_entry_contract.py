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


def test_bench_headline_noop_twins():
    """Round 17 (guide §1.4): the bench may only ADD headline entries,
    never remove or rename. The two _noop twins (added because count()
    prunes the Window / expression tail of their base queries) must
    resolve to existing queries() keys, and every r16 headline name
    must still be present with the count() action (no _noop suffix)."""
    import bench

    assert bench._base_name("text_stats_noop") == "text_stats"
    assert bench._base_name("tpch_q1") == "tpch_q1"
    qs = set(ALL)
    for name in bench.HEADLINE:
        assert bench._base_name(name) in qs or name == "events_asof_join", name
    # the r16 recording's 28 names all survive verbatim
    import json
    import os

    r16 = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                      "BENCH_r16.json")))
    for name in r16["parsed"]["queries"]:
        assert name in bench.HEADLINE, name

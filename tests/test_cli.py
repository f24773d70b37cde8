"""CLI front-end tests (reference CliFrontend.java:40-102 /
bin/sparksql-plus): DDL + query file in, result or plan out, invoked
through the module entry point `sparksqlplus_spark.__main__.main`.

The in-process invocation reuses the test session (get_spark is
getOrCreate), so these run the full parse-DDL -> plan -> execute path
without paying a second JVM startup.
"""

import pytest

from sparksqlplus_spark.__main__ import main

DDL = """
CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT,
                       l_linenumber INT, l_quantity DOUBLE,
                       PRIMARY KEY (l_orderkey, l_linenumber))
WITH ('path' = '/root/testdata/sf0.001/lineitem.parquet');
CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT,
                       PRIMARY KEY (s_suppkey))
WITH ('path' = '/root/testdata/sf0.001/supplier.parquet');
CREATE TABLE nation (n_nationkey INT, n_name VARCHAR,
                     PRIMARY KEY (n_nationkey))
WITH ('path' = '/root/testdata/sf0.001/nation.parquet');
"""

# q11-style chain (reference examples/query/q11): R-S-T equi-joins +
# a selective filter; non-full output => DISTINCT semantics (C23)
QUERY = """
SELECT s.s_name, n.n_name, l.l_quantity
FROM lineitem AS l, supplier AS s, nation AS n
WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
  AND l.l_quantity < 3
"""


@pytest.fixture()
def files(tmp_path):
    ddl = tmp_path / "tables.sql"
    ddl.write_text(DDL)
    query = tmp_path / "query.sql"
    query.write_text(QUERY)
    return ddl, query


def test_cli_runs_query_end_to_end(spark, files, capsys):
    ddl, query = files
    rc = main(["-d", str(ddl), str(query), "--show", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "s_name" in out and "rows]" in out
    n = int(out.rsplit("[", 1)[1].split(" ")[0])
    assert n > 0


def test_cli_explain(spark, files, capsys):
    ddl, query = files
    rc = main(["-d", str(ddl), "--explain", str(query)])
    out = capsys.readouterr().out
    assert rc == 0
    # join tree over the three aliases, no execution output
    assert all(a in out for a in ("l[scan]", "s[scan]", "n[scan]"))
    assert "rows]" not in out


def test_cli_writes_output(spark, files, tmp_path, capsys):
    ddl, query = files
    dest = tmp_path / "result"
    rc = main(["-d", str(ddl), "-o", str(dest), "--format", "csv", str(query)])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    # engine result (DISTINCT, C23) must round-trip through the sink
    from sparksqlplus_spark.api import SparkSQLPlus

    eng = SparkSQLPlus(spark)
    eng.ddl(DDL)
    expected = eng.sql(QUERY).count()
    written = spark.read.csv(str(dest), header=False).count()
    assert written == expected > 0


def test_cli_candidates(spark, files, capsys):
    import json

    ddl, query = files
    rc = main(["-d", str(ddl), "--candidates", str(query)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["acyclic"] and res["candidates"]
    assert res["candidates"][0]["rank"] == 0


def test_cli_rejects_zero_or_two_queries(spark, files, capsys):
    ddl, query = files
    assert main(["-d", str(ddl)]) == 2
    assert main(["-d", str(ddl), "-e", "SELECT 1", str(query)]) == 2

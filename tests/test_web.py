"""Web API tests (reference sqlplus-web /api/v1/parse surface): real
HTTP round-trips against the stdlib server on an ephemeral port."""

import json
import threading
import urllib.request

import pytest

from sparksqlplus_spark.web import make_server

DDL = """
CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT,
                       l_linenumber INT, l_quantity DOUBLE,
                       PRIMARY KEY (l_orderkey, l_linenumber))
WITH ('path' = '/root/testdata/sf0.001/lineitem.parquet');
CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT,
                       PRIMARY KEY (s_suppkey))
WITH ('path' = '/root/testdata/sf0.001/supplier.parquet');
"""

QUERY = """
SELECT s.s_name, l.l_quantity
FROM lineitem AS l, supplier AS s
WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity < 3
"""


@pytest.fixture(scope="module")
def server(spark):
    srv = make_server(spark, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base: str, path: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_parse_endpoint(server):
    code, res = _post(server, "/api/v1/parse", {"ddl": DDL, "query": QUERY})
    assert code == 200
    assert {t["name"] for t in res["tables"]} == {"lineitem", "supplier"}
    assert res["acyclic"] and res["candidates"]
    assert res["candidates"][0]["rank"] == 0


def test_explain_and_run_endpoints(server, engine):
    code, res = _post(server, "/api/v1/explain", {"ddl": DDL, "query": QUERY})
    assert code == 200 and "[scan]" in res["plan"]

    code, res = _post(
        server, "/api/v1/run", {"ddl": DDL, "query": QUERY, "limit": 5}
    )
    assert code == 200
    assert res["n_rows"] == engine.sql(QUERY).count()
    assert 0 < len(res["rows"]) <= 5
    assert set(res["rows"][0]) == {"s_name", "l_quantity"}


def test_error_paths(server):
    code, res = _post(server, "/api/v1/nope", {"query": "SELECT 1"})
    assert code == 404
    code, res = _post(server, "/api/v1/parse", {"ddl": "", "query": "SELEC nope"})
    assert code == 400 and "error" in res
    # r13 (r12 ADVICE): a missing body field on a VALID endpoint is a
    # 400 naming the field, not a misleading 404 "unknown endpoint"
    code, res = _post(server, "/api/v1/experiment/start", {})
    assert code == 400 and "experiments" in res["error"]
    code, res = _post(server, "/api/v1/experiment/register", {"name": "X"})
    assert code == 400 and "query" in res["error"]
    code, res = _post(server, "/api/v1/run", {})
    assert code == 400 and "query" in res["error"]
    code, res = _post(server, "/api/v1/experiment/nope", {})
    assert code == 404


def _get(base: str, path: str) -> tuple[int, dict]:
    with urllib.request.urlopen(base + path) as resp:
        return resp.status, json.loads(resp.read())


def test_experiment_endpoints(server):
    """HTTP round-trip over the ExperimentController surface
    (reference /experiment/queries + /start + /status; register is
    the custom-query /compile/persist role)."""
    import time

    code, res = _get(server, "/api/v1/experiment/queries")
    assert code == 200
    assert {"Query1", "Query2", "Query3"} <= set(res["queries"])

    code, res = _post(
        server,
        "/api/v1/experiment/register",
        {"name": "WebQ", "ddl": DDL, "query": QUERY},
    )
    assert code == 200 and "WebQ-SparkSQL" in res["experiments"]

    code, res = _post(
        server,
        "/api/v1/experiment/start",
        {"experiments": ["WebQ-SparkSQLPlus", "WebQ-SparkSQL"]},
    )
    # r13: compilation is async (worker thread) — start returns
    # promptly with Compiling observable, like the reference
    assert code == 200 and res["experimentState"] in (
        "Compiling", "Running", "Stopped",
    )

    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        code, st = _get(server, "/api/v1/experiment/status")
        if st["experimentState"] == "Stopped":
            break
        time.sleep(0.2)
    assert st["experimentState"] == "Stopped"
    assert st["experimentTaskStates"] == {
        "WebQ-SparkSQL": "Finished",
        "WebQ-SparkSQLPlus": "Finished",
    }
    assert all(v > 0 for v in st["experimentTaskResults"].values())

    # stop on a Stopped manager is a client error, not a 500
    code, res = _post(server, "/api/v1/experiment/stop", {})
    assert code == 400 and "error" in res


def test_non_loopback_bind_requires_opt_in(spark):
    with pytest.raises(ValueError, match="allow_remote"):
        make_server(spark, host="0.0.0.0", port=0)
    srv = make_server(spark, host="0.0.0.0", port=0, allow_remote=True)
    srv.server_close()

"""Minimal plan-inspection HTTP service — the reference's web surface
(sqlplus-web rest/controller/RestApiController.java:44-131 /parse,
CompileController.java:66-292 candidate choice) reduced to its API
core on the stdlib ``http.server``; the SPA visualization and Spark
standalone experiment submission (ExperimentManager) are out of scope
(bench.py + scripts/ cover the experiment-pairing role).

Endpoints (JSON over POST unless noted):

- ``POST /api/v1/parse``   {"ddl": ..., "query": ...}
    -> {"tables": [...], **plan_candidates(query)} — every candidate
    join tree (roots, edges, key types, comparison paths, Berge flag),
    ranked; index 0 is the plan ``sql()`` executes.
- ``POST /api/v1/explain`` {"ddl": ..., "query": ..., "cyclic_strategy"?}
    -> {"plan": explain_tree text}
- ``POST /api/v1/run``     {"ddl": ..., "query": ..., "limit"? = 20}
    -> {"n_rows": total, "rows": first <= limit rows as JSON objects}
- Experiment manager (reference ExperimentController.java:31-66 /
  ExperimentManager.java — see experiments.py for the jar-build →
  plan / spark-submit → job-group mapping):
  - ``GET  /api/v1/experiment/queries``  -> registered base names
  - ``POST /api/v1/experiment/register`` {"name", "ddl", "query"}
  - ``POST /api/v1/experiment/start``    {"experiments": [
      "<Name>-SparkSQLPlus" | "<Name>-SparkSQL", ...], "timeout"?}
  - ``GET  /api/v1/experiment/status``   -> {experimentState,
      experimentTaskNames, experimentTaskStates, experimentTaskResults}
  - ``POST /api/v1/experiment/stop``
- ``GET /``                -> endpoint index (text)

One SparkSession is shared; each request registers its DDL in a fresh
engine (catalogs are cheap, sessions are not). The run endpoint is a
bounded PREVIEW — it takes at most ``limit`` rows onto the driver
(FormatResult semantics, SURVEY R19); the full result never leaves the
cluster. Intended as a localhost dev tool, matching the reference's
demo deployment.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

_INDEX = (
    "sqlplusx web API\n"
    "POST /api/v1/parse   {ddl, query}\n"
    "POST /api/v1/explain {ddl, query, cyclic_strategy?}\n"
    "POST /api/v1/run     {ddl, query, limit?}\n"
    "GET  /api/v1/experiment/queries\n"
    "POST /api/v1/experiment/register {name, ddl, query}\n"
    "POST /api/v1/experiment/start    {experiments, timeout?}\n"
    "GET  /api/v1/experiment/status\n"
    "POST /api/v1/experiment/stop\n"
)


class UnknownEndpoint(Exception):
    """Path-dispatch sentinel: 404. Distinct from KeyError so a missing
    body field in a VALID endpoint surfaces as a 400 with the field
    name instead of a misleading 404 (r12 ADVICE)."""


def _engine_for(spark: SparkSession, ddl: str):
    from sparksqlplus_spark.api import SparkSQLPlus

    eng = SparkSQLPlus(spark)
    if ddl:
        eng.ddl(ddl)
    return eng


def _handle_experiment(manager, path: str, body: dict) -> dict:
    if path == "/api/v1/experiment/register":
        manager.register(body["name"], body.get("ddl", ""), body["query"])
        return {"registered": body["name"],
                "experiments": manager.experiment_names()}
    if path == "/api/v1/experiment/start":
        if "timeout" in body:
            manager.timeout = float(body["timeout"])
        manager.start(list(body["experiments"]))
        return manager.status()
    if path == "/api/v1/experiment/stop":
        manager.stop()
        return manager.status()
    raise UnknownEndpoint(path)


def _handle(spark: SparkSession, path: str, body: dict, manager=None) -> dict:
    if path.startswith("/api/v1/experiment/"):
        if manager is None:
            raise UnknownEndpoint(path)
        return _handle_experiment(manager, path, body)
    eng = _engine_for(spark, body.get("ddl", ""))
    query = body["query"]
    if path == "/api/v1/parse":
        out = eng.plan_candidates(query)
        out["tables"] = [
            {"name": m.name, "columns": m.column_names}
            for m in eng.catalog.tables()
        ]
        return out
    if path == "/api/v1/explain":
        return {
            "plan": eng.explain_tree(
                query, cyclic_strategy=body.get("cyclic_strategy", "auto")
            )
        }
    if path == "/api/v1/run":
        # one job: count per partition + first `limit` rows in a single
        # aggregate pass over a persisted result (round-5 advice — the
        # previous limit/take + count pair executed the query twice)
        limit = int(body.get("limit", 20))
        df = eng.sql(query)
        df.persist()
        try:
            rows = [json.loads(r) for r in df.toJSON().take(limit)]
            return {"n_rows": df.count(), "rows": rows}
        finally:
            df.unpersist()
    raise UnknownEndpoint(path)


def make_server(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 0,
    allow_remote: bool = False,
):
    """Build (not start) a ThreadingHTTPServer bound to host:port
    (port 0 = ephemeral; read ``server.server_address``).

    The API is an UNAUTHENTICATED SQL + DDL surface (DDL paths read
    arbitrary readable files), safe only as a localhost dev tool —
    binding to a non-loopback host requires an explicit
    ``allow_remote=True`` opt-in (round-5 advice)."""
    import ipaddress

    try:
        loopback = ipaddress.ip_address(host).is_loopback
    except ValueError:
        loopback = host == "localhost"
    if not loopback and not allow_remote:
        raise ValueError(
            f"refusing to bind the unauthenticated SQL API to non-loopback "
            f"host {host!r}; pass allow_remote=True to opt in"
        )

    from sparksqlplus_spark.experiments import ExperimentManager, builtin_pairs

    manager = ExperimentManager(spark, pairs=builtin_pairs())

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: surface errors via responses
            pass

        def _send(self, code: int, payload: str, ctype: str) -> None:
            data = payload.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/":
                self._send(200, _INDEX, "text/plain")
            elif self.path == "/api/v1/experiment/status":
                self._send(200, json.dumps(manager.status()),
                           "application/json")
            elif self.path == "/api/v1/experiment/queries":
                self._send(
                    200,
                    json.dumps({"queries": manager.queries(),
                                "experiments": manager.experiment_names()}),
                    "application/json",
                )
            else:
                self._send(404, "not found\n", "text/plain")

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
                result = _handle(spark, self.path, body, manager=manager)
                self._send(200, json.dumps(result), "application/json")
            except UnknownEndpoint:
                self._send(404, json.dumps({"error": "unknown endpoint"}),
                           "application/json")
            except KeyError as exc:  # missing body field on a valid endpoint
                self._send(
                    400,
                    json.dumps({"error": f"missing field: {exc.args[0]}"}),
                    "application/json",
                )
            except Exception as exc:  # surface planner errors to the client
                self._send(400, json.dumps({"error": str(exc)}),
                           "application/json")

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 8118,
    allow_remote: bool = False,
) -> None:
    """Blocking entry point: python -c 'from sparksqlplus_spark.web import ...'"""
    server = make_server(spark, host, port, allow_remote=allow_remote)
    print(f"sqlplusx web API on http://{host}:{server.server_address[1]}")
    server.serve_forever()

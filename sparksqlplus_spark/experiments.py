"""Experiment manager — the reference's benchmark-pairing surface
(sqlplus-web ExperimentManager.java:26-240 + ExperimentController.java:31-66)
re-expressed for a live SparkSession instead of jar-build + standalone
REST submission + stdout scraping.

Reference semantics kept (state names are the reference's display
strings, ExperimentState.java:3 / ExperimentTaskState.java:3):

- experiments come in PAIRS per query: ``<Name>-SparkSQLPlus`` (our
  CQC/GHD plan, ``mode='auto'``) vs ``<Name>-SparkSQL`` (verbatim
  ``spark.sql``) — exactly the reference's generated
  ``QueryNSparkSQLPlus`` / ``QueryNSparkSQL`` class pairs
  (sqlplus-example; ExperimentManager.java:147 name→class mapping).
- ``start(names)`` runs the requested experiments ONE AT A TIME in
  submission order (the reference queues on a single Spark master,
  ExperimentManager.java:44); each task goes Pending → Running →
  Finished(seconds) | Failed | Timeout, and the manager goes Stopped →
  Compiling → Running → Stopped (Compilation Failed if planning
  raises — the reference's jar-build failure path,
  ExperimentJarBuilder).
- ``stop()`` = Running → Stopping: the in-flight task's Spark job
  group is cancelled (the reference kills the driver via REST,
  ExperimentManager.java:203-207) and marked Failed, every pending
  task is Cancelled, then Stopped.
- ``status()`` returns the reference's ExperimentStatusResponse shape:
  {experimentState, experimentTaskNames, experimentTaskStates,
  experimentTaskResults}.

What replaces what (local[N] has no standalone master):

- jar build            → plan construction (``eng.sql`` returning the
                         lazy DataFrame; planner errors = compile fail)
- spark-submit + poll  → a worker thread timing ``df.count()``
                         (CountResult — the reference's generated
                         mains count, SURVEY R19)
- REST kill            → ``sc.cancelJobGroup`` with
                         interruptOnCancel (each task runs under its
                         own job group, set in the counting thread —
                         job groups are thread-local properties)
- stdout scraping      → the measured wall seconds, returned directly

Timing is end-to-end per task (plan reuse, shuffles, actions) at
whatever data the DDL points to; the pairing makes it an A/B of OUR
plan vs Spark's own on identical inputs, which is the entire point of
the reference's experiment page.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession

# reference display strings, ExperimentState.java:3-4
STOPPED = "Stopped"
COMPILING = "Compiling"
COMPILATION_FAILED = "Compilation Failed"
RUNNING = "Running"
STOPPING = "Stopping"

# reference display strings, ExperimentTaskState.java:3-4
T_PENDING = "Pending"
T_RUNNING = "Running"
T_FINISHED = "Finished"
T_TIMEOUT = "Timeout"
T_FAILED = "Failed"
T_CANCELLED = "Cancelled"

VARIANTS = ("SparkSQLPlus", "SparkSQL")


@dataclass
class _Task:
    name: str
    base: str
    variant: str
    state: str = T_PENDING
    result: float | None = None
    error: str | None = None


@dataclass
class _QueryPair:
    ddl: str
    query: str


def builtin_pairs(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, tuple[str, str]]:
    """Built-in experiment queries over the test parquet — the local
    stand-in for the reference's shipped Query1–Query9 graph pairs
    (ExperimentController.java:57-58). Each value is (ddl, query);
    all three are CQC-plannable so the -SparkSQLPlus variant runs the
    reduce/enumerate plan, not the fallback."""
    ddl = f"""
    CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT,
                           l_linenumber INT, l_quantity DOUBLE,
                           PRIMARY KEY (l_orderkey, l_linenumber))
    WITH ('path' = '{sf_dir}/lineitem.parquet');
    CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,
                         o_totalprice DOUBLE, PRIMARY KEY (o_orderkey))
    WITH ('path' = '{sf_dir}/orders.parquet');
    CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR,
                           c_acctbal DOUBLE, PRIMARY KEY (c_custkey))
    WITH ('path' = '{sf_dir}/customer.parquet');
    CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR,
                           s_acctbal DOUBLE, PRIMARY KEY (s_suppkey))
    WITH ('path' = '{sf_dir}/supplier.parquet');
    """
    return {
        # acyclic 2-hop with a literal filter (C5/C7)
        "Query1": (ddl, """
            SELECT c.c_name, o.o_totalprice
            FROM customer AS c, orders AS o
            WHERE c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
        """),
        # 3-relation chain with a cross-relation comparison (C8 theta)
        "Query2": (ddl, """
            SELECT c.c_custkey, l.l_quantity
            FROM customer AS c, orders AS o, lineitem AS l
            WHERE c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
              AND l.l_quantity < c.c_acctbal
        """),
        # top-level aggregation + ORDER BY/LIMIT (C20/C22)
        "Query3": (ddl, """
            SELECT s.s_name, SUM(l.l_quantity) AS sum_qty
            FROM supplier AS s, lineitem AS l
            WHERE s.s_suppkey = l.l_suppkey
            GROUP BY s.s_name ORDER BY sum_qty DESC LIMIT 10
        """),
    }


class ExperimentManager:
    """One manager per server/session. Thread-safe: ``start``/``stop``/
    ``status``/``register`` may be called from HTTP handler threads
    while the worker runs."""

    def __init__(
        self,
        spark: SparkSession,
        pairs: dict[str, tuple[str, str]] | None = None,
        timeout: float = 3600.0,
    ):
        self.spark = spark
        self.timeout = timeout
        self._lock = threading.RLock()
        self._state = STOPPED
        self._pairs: dict[str, _QueryPair] = {}
        self._tasks: dict[str, _Task] = {}
        self._order: list[str] = []
        self._worker: threading.Thread | None = None
        self._stop_requested = threading.Event()
        self._running_group: str | None = None
        self._seq = 0
        for name, (ddl, query) in (pairs or {}).items():
            self.register(name, ddl, query)

    # -- registry (reference /experiment/queries + CustomQueryManager) --

    def register(self, name: str, ddl: str, query: str) -> None:
        """Add a query pair (the custom-query role of the reference's
        /api/v1/compile/persist, CompileController.java:251)."""
        if "-" in name:
            raise ValueError(
                "experiment base names must not contain '-' "
                "(it separates the variant suffix)"
            )
        with self._lock:
            self._pairs[name] = _QueryPair(ddl=ddl, query=query)

    def queries(self) -> list[str]:
        """Registered base names (GET /experiment/queries)."""
        with self._lock:
            return sorted(self._pairs)

    def experiment_names(self) -> list[str]:
        """The startable pair-expanded names."""
        with self._lock:
            return [
                f"{base}-{v}" for base in sorted(self._pairs) for v in VARIANTS
            ]

    # -- lifecycle --

    def start(self, experiments: list[str]) -> None:
        """Queue + run the named experiments (POST /experiment/start).
        Accepts BASE names — expanded to both ``-SparkSQLPlus`` /
        ``-SparkSQL`` variants like the reference controller
        (ExperimentManager.java:273-290 enqueues both per base) — as
        well as pre-expanded ``<Name>-<Variant>`` names. Sorted like
        the reference (ExperimentController.java:40); name validation
        raises synchronously, but COMPILATION runs in the worker
        thread so this returns promptly with state=Compiling,
        observable via status() polling (the reference compiles the
        jar asynchronously too — r12 ADVICE)."""
        with self._lock:
            if self._state not in (STOPPED, COMPILATION_FAILED):
                raise RuntimeError(f"start on state {self._state}")
            if not experiments:
                raise ValueError("no experiments requested")
            expanded: list[str] = []
            for name in experiments:
                if name in self._pairs:
                    expanded.extend(f"{name}-{v}" for v in VARIANTS)
                else:
                    expanded.append(name)
            todo = sorted(dict.fromkeys(expanded))
            plans = []
            self._state = COMPILING
            self._tasks = {}
            self._order = []
            try:
                for full in todo:
                    base, _, variant = full.rpartition("-")
                    if variant not in VARIANTS or base not in self._pairs:
                        raise KeyError(f"unknown experiment {full!r}")
                    pair = self._pairs[base]
                    plans.append((full, base, variant, pair))
                    self._tasks[full] = _Task(full, base, variant)
                    self._order.append(full)
            except Exception:
                self._state = COMPILATION_FAILED
                self._tasks = {}
                self._order = []
                raise
            self._stop_requested.clear()
            self._seq += 1
            seq = self._seq
            self._worker = threading.Thread(
                target=self._compile_and_run, args=(plans, seq),
                daemon=True, name=f"sqlplusx-experiments-{seq}",
            )
            self._worker.start()

    def _compile_and_run(self, plans: list, seq: int) -> None:
        """Worker entry: compile every plan (Compiling), then run
        (Running). Compilation failure lands COMPILATION_FAILED with
        every task Failed — the reference's jar-build failure path."""
        compiled = []
        try:
            for full, base, variant, pair in plans:
                with self._lock:
                    if self._seq != seq:
                        return  # superseded
                compiled.append((full, self._compile(pair, variant)))
        except Exception as exc:
            with self._lock:
                if self._seq != seq:
                    return
                self._state = COMPILATION_FAILED
                for t in self._tasks.values():
                    t.state = T_FAILED
                    t.error = f"compilation failed: {exc}"
            return
        with self._lock:
            if self._seq != seq:
                return
            if self._stop_requested.is_set():
                for t in self._tasks.values():
                    t.state = T_CANCELLED
                self._state = STOPPED
                return
            self._state = RUNNING
        self._run_all(compiled, seq)

    def _compile(self, pair: _QueryPair, variant: str):
        """The jar-build equivalent: construct the lazy DataFrame."""
        from sparksqlplus_spark.api import SparkSQLPlus

        eng = SparkSQLPlus(self.spark)
        if pair.ddl.strip():
            eng.ddl(pair.ddl)
        mode = "auto" if variant == "SparkSQLPlus" else "spark"
        return eng.sql(pair.query, mode=mode)

    def stop(self) -> None:
        """POST /experiment/stop: cancel the running task's job group,
        mark it Failed, mark pending tasks Cancelled, go Stopped."""
        with self._lock:
            if self._state != RUNNING:
                raise RuntimeError(f"stop on state {self._state}")
            self._state = STOPPING
            self._stop_requested.set()
            group = self._running_group
        if group is not None:
            try:
                self.spark.sparkContext.cancelJobGroup(group)
            except Exception:
                pass

    def status(self) -> dict:
        """GET /experiment/status — ExperimentStatusResponse shape."""
        with self._lock:
            return {
                "experimentState": self._state,
                "experimentTaskNames": list(self._order),
                "experimentTaskStates": {
                    n: t.state for n, t in self._tasks.items()
                },
                "experimentTaskResults": {
                    n: t.result
                    for n, t in self._tasks.items()
                    if t.result is not None
                },
            }

    def wait(self, timeout: float = 600.0) -> bool:
        """Block until the worker finishes (test/CLI convenience;
        the reference polls /experiment/status from the SPA)."""
        w = self._worker
        if w is not None:
            w.join(timeout)
            return not w.is_alive()
        return True

    # -- worker --

    def _run_all(self, compiled: list, seq: int) -> None:
        for full, df in compiled:
            with self._lock:
                if self._seq != seq:
                    return  # superseded
                if self._stop_requested.is_set():
                    for name in self._order:
                        t = self._tasks[name]
                        if t.state == T_PENDING:
                            t.state = T_CANCELLED
                    self._state = STOPPED
                    return
                task = self._tasks[full]
                task.state = T_RUNNING
                group = f"sqlplusx-exp-{seq}-{full}"
                self._running_group = group
            outcome = self._timed_count(df, group)
            with self._lock:
                if self._seq != seq:
                    return
                self._running_group = None
                kind, value = outcome
                if kind == "ok":
                    task.state = T_FINISHED
                    task.result = value
                elif kind == "timeout":
                    task.state = T_TIMEOUT
                else:  # error / cancelled by stop()
                    task.state = T_FAILED
                    task.error = str(value)
        with self._lock:
            if self._seq != seq:
                return
            if self._stop_requested.is_set():
                for name in self._order:
                    t = self._tasks[name]
                    if t.state == T_PENDING:
                        t.state = T_CANCELLED
            self._state = STOPPED

    def _timed_count(self, df, group: str) -> tuple[str, object]:
        """Run df.count() under its own job group in a child thread
        (job groups are THREAD-LOCAL Spark properties — setting it in
        the counting thread scopes the cancel to exactly this task),
        joining with the timeout; on expiry cancel the group like the
        reference's REST kill (ExperimentManager.java:117-121)."""
        sc = self.spark.sparkContext
        box: dict[str, object] = {}

        def run() -> None:
            try:
                sc.setJobGroup(group, f"experiment {group}", True)
                t0 = time.monotonic()
                df.count()
                box["elapsed"] = time.monotonic() - t0
            except Exception as exc:
                box["error"] = exc
            finally:
                try:
                    sc.setJobGroup("", "")
                except Exception:
                    pass

        t = threading.Thread(target=run, daemon=True, name=group)
        t.start()
        t.join(self.timeout)
        if t.is_alive():
            try:
                sc.cancelJobGroup(group)
            except Exception:
                pass
            t.join(30.0)
            return ("timeout", None)
        if "error" in box:
            return ("error", box["error"])
        return ("ok", float(box["elapsed"]))

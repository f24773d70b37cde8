"""Experiment-manager tests (reference sqlplus-web ExperimentManager /
ExperimentController semantics — pair naming, state machine, one-at-a-
time execution, stop/cancel, timeout)."""

import time

import pytest

from sparksqlplus_spark.experiments import (
    COMPILATION_FAILED,
    RUNNING,
    STOPPED,
    ExperimentManager,
    builtin_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def manager(spark):
    return ExperimentManager(spark, pairs=builtin_pairs(SF), timeout=600.0)


def test_registry_and_pair_names(manager):
    assert manager.queries() == ["Query1", "Query2", "Query3"]
    names = manager.experiment_names()
    assert "Query1-SparkSQLPlus" in names and "Query1-SparkSQL" in names
    assert len(names) == 6
    with pytest.raises(ValueError):
        manager.register("bad-name", "", "SELECT 1")


def test_pair_runs_to_finished(manager):
    manager.start(["Query1-SparkSQLPlus", "Query1-SparkSQL"])
    assert manager.wait(300)
    st = manager.status()
    assert st["experimentState"] == STOPPED
    assert st["experimentTaskStates"] == {
        "Query1-SparkSQL": "Finished",
        "Query1-SparkSQLPlus": "Finished",
    }
    # both timed, in seconds, positive
    res = st["experimentTaskResults"]
    assert set(res) == {"Query1-SparkSQL", "Query1-SparkSQLPlus"}
    assert all(0 < v < 300 for v in res.values())
    # submission order is sorted (reference controller sorts)
    assert st["experimentTaskNames"] == sorted(st["experimentTaskNames"])


def test_restart_after_finish(manager):
    manager.start(["Query3-SparkSQLPlus"])
    assert manager.wait(300)
    manager.start(["Query3-SparkSQL"])  # Stopped -> Compiling -> Running
    assert manager.wait(300)
    st = manager.status()
    assert st["experimentTaskStates"] == {"Query3-SparkSQL": "Finished"}


def test_compilation_failure_and_recovery(manager):
    manager.register("Broken", "", "SELECT FROM WHERE nope")
    manager.start(["Broken-SparkSQLPlus"])
    manager.wait(60)
    st = manager.status()
    assert st["experimentState"] == COMPILATION_FAILED
    assert st["experimentTaskStates"]["Broken-SparkSQLPlus"] == "Failed"
    # Compilation Failed is a startable state (reference state machine)
    manager.start(["Query1-SparkSQL"])
    assert manager.wait(300)
    assert manager.status()["experimentState"] == STOPPED


def test_unknown_experiment_name(manager):
    with pytest.raises(KeyError):
        manager.start(["Nope-SparkSQLPlus"])
    assert manager.status()["experimentState"] == COMPILATION_FAILED
    with pytest.raises(KeyError):
        manager.start(["Query1-NotAVariant"])


def test_stop_cancels_pending(manager):
    names = [f"Query{i}-{v}" for i in (1, 2, 3)
             for v in ("SparkSQLPlus", "SparkSQL")]
    manager.start(names)
    # wait until the worker is actually running, then stop
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if manager.status()["experimentState"] == RUNNING:
            break
        time.sleep(0.02)
    manager.stop()
    assert manager.wait(120)
    st = manager.status()
    assert st["experimentState"] == STOPPED
    states = st["experimentTaskStates"].values()
    # in-flight task: Failed (cancelled) or Finished (won the race);
    # everything still queued: Cancelled
    assert "Cancelled" in states or list(states).count("Finished") == 6
    assert all(s in ("Failed", "Finished", "Cancelled") for s in states)


def test_stop_requires_running(manager):
    with pytest.raises(RuntimeError):
        manager.stop()


def test_timeout_marks_task(spark):
    m = ExperimentManager(spark, pairs=builtin_pairs(SF), timeout=0.0)
    m.start(["Query2-SparkSQLPlus"])
    assert m.wait(120)
    st = m.status()
    assert st["experimentState"] == STOPPED
    assert st["experimentTaskStates"]["Query2-SparkSQLPlus"] == "Timeout"
    assert "Query2-SparkSQLPlus" not in st["experimentTaskResults"]


def test_base_name_expansion(manager):
    """r13 (r12 ADVICE): start() accepts BASE names and enqueues both
    variants itself, matching the reference controller contract
    (ExperimentManager.java:273-290) — a reference-shaped payload
    {"experiments": ["Query1"]} now works; mixed/pre-expanded forms and
    duplicates collapse to one task per pair name."""
    manager.start(["Query1", "Query1-SparkSQL", "Query3"])
    assert manager.wait(300)
    st = manager.status()
    assert st["experimentState"] == STOPPED
    assert sorted(st["experimentTaskStates"]) == [
        "Query1-SparkSQL", "Query1-SparkSQLPlus",
        "Query3-SparkSQL", "Query3-SparkSQLPlus",
    ]
    assert set(st["experimentTaskStates"].values()) == {"Finished"}


def test_start_returns_promptly_compiling(spark):
    """r13 (r12 ADVICE): compilation happens in the worker thread —
    start() returns without waiting for planning, and Compiling is an
    observable state via status() polling (the reference compiles the
    jar asynchronously and the SPA polls)."""
    import time

    from sparksqlplus_spark.experiments import COMPILING, RUNNING

    m = ExperimentManager(spark, pairs=builtin_pairs(SF), timeout=600.0)
    t0 = time.monotonic()
    m.start([f"Query{i}-{v}" for i in (1, 2, 3)
             for v in ("SparkSQLPlus", "SparkSQL")])
    elapsed = time.monotonic() - t0
    st0 = m.status()["experimentState"]
    # start returned while work remained (compile of 6 plans takes
    # longer than the validation the caller thread does)
    assert st0 in (COMPILING, RUNNING, STOPPED)
    assert elapsed < 5.0
    assert m.wait(300)
    st = m.status()
    assert st["experimentState"] == STOPPED
    assert set(st["experimentTaskStates"].values()) == {"Finished"}

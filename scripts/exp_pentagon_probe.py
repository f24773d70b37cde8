#!/usr/bin/env python
"""Instrument graph_c5_pentagon_ghd's slow mode (round 17, VERDICT r16
item 2).

Evidence going in: the query's warm wall time is bimodal — 3.5-5.5 s
fast mode vs 8-11.5 s slow mode — and r16 established the slow mode
fires at load1 < 2 on an otherwise idle box, so "session load" no
longer explains it. This probe runs the query N consecutive times in
ONE warm session (bench.py's exact warm-up protocol) with the Spark UI
REST API enabled, and attributes each run's wall time to its stages:
per stage — wall duration, executorRunTime, executorCpuTime, jvmGcTime,
task count, and the max/median task duration from the taskSummary
quantiles endpoint (straggler detection). A slow run then names its
mechanism directly:

  - one straggler task in the kernel stage (max >> median)  -> skew /
    cell collision
  - executorRunTime up uniformly                            -> CPU
    contention (load after all)
  - jvmGcTime up                                            -> GC mode
  - wall >> sum(stage walls)                                -> gap
    BETWEEN stages (scheduler / AQE re-planning / Python worker
    (re)spawn)
  - stage-count / shape drift between runs                  -> AQE
    re-optimization

Usage:
  PYTHONPATH=/root/repo python3 scripts/exp_pentagon_probe.py [N] [sf_dir]

Prints one JSON line per run plus a final summary line; exit 0 always
(it is an instrument, not a gate).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
UI_PORT = int(os.environ.get("PENTAGON_PROBE_PORT", "4046"))


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _proc_stat() -> list[int]:
    """First /proc/stat cpu line: user nice system idle iowait irq
    softirq steal ... (jiffies). Steal is the VM-tenancy signal: this
    box is a Firecracker guest (uname -fc-), and host-side CPU
    contention appears in-guest as nonzero steal while guest load1
    stays low — the exact signature of the 'slow at load1 < 2'
    mystery this probe chases."""
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def _ts(s: str) -> float:
    # "2026-08-16T23:20:31.123GMT" -> epoch seconds
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparksqlplus_spark.session import get_spark

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pentagon_probe",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # keep every probe stage in the status store
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedTasks": "200000",
        },
    )
    eng = entry_mod._engine(spark, SF_DIR)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    qs = entry_mod.queries()
    # bench.py warm-ups (scan-agg + shuffle join + theta) then one
    # untimed pentagon to pay C2/Arrow first-run costs
    qs["tpch_q6"](spark, SF_DIR).count()
    qs["graph_c5_pentagon_ghd"](spark, SF_DIR).count()

    app_id = spark.sparkContext.applicationId

    import numpy as _np

    def _cal() -> float:
        """Fixed single-thread numpy workload (sort+unique, the
        kernel's primitive mix). Constant work: its wall time is a
        direct in-guest probe of effective CPU speed — if it moves
        2-3x in lockstep with the pentagon, the machine's compute
        speed moved (host tenancy/throttling), not the plan."""
        rng = _np.random.default_rng(7)
        t = time.time()
        for _ in range(3):
            x = rng.integers(0, 1_000_000, 2_000_000)
            _np.sort(x)
            _np.unique(x)
        return time.time() - t

    runs = []
    for i in range(N):
        load0 = os.getloadavg()[0]
        cal0 = _cal()
        st0 = _proc_stat()
        t0 = time.time()
        n = qs["graph_c5_pentagon_ghd"](spark, SF_DIR).count()
        wall = time.time() - t0
        t1 = time.time()
        st1 = _proc_stat()
        d = [b - a for a, b in zip(st0, st1)]
        tot = max(sum(d), 1)
        cpu_pct = {
            "user": round(100 * d[0] / tot, 1),
            "sys": round(100 * d[2] / tot, 1),
            "idle": round(100 * d[3] / tot, 1),
            "steal": round(100 * d[7] / tot, 1),
        }
        # stages completed inside this run's window
        try:
            stages = _rest(f"applications/{app_id}/stages?status=COMPLETE")
        except Exception as exc:  # UI hiccup: record wall only
            print(json.dumps({"run": i, "wall": round(wall, 3),
                              "rest_error": str(exc)}), flush=True)
            runs.append({"run": i, "wall": wall, "stages": []})
            continue
        win = []
        for st in stages:
            sub = st.get("submissionTime")
            comp = st.get("completionTime")
            if not sub or not comp:
                continue
            sub_t, comp_t = _ts(sub), _ts(comp)
            if sub_t < t0 - 0.05 or comp_t > t1 + 0.05:
                continue
            entry = {
                "id": st["stageId"],
                "name": st["name"].split("\n")[0][:70],
                "wall": round(comp_t - sub_t, 3),
                "sub_gap": round(sub_t - t0, 3),
                "tasks": st["numCompleteTasks"],
                "runTime": round(st["executorRunTime"] / 1e3, 3),
                "cpuTime": round(st["executorCpuTime"] / 1e9, 3),
                "gcTime": round(st["jvmGcTime"] / 1e3, 3),
                "deserTime": round(st["executorDeserializeTime"] / 1e3, 3),
            }
            # task-duration quantiles for straggler detection
            try:
                # note for the 160-task kernel stage: 128 of 160
                # partitions are EMPTY (32 cells hashed over
                # n_cells*_CELL_FANOUT partitions), so the median is
                # an empty task; the real per-cell spread lives in
                # p80..p100
                q = _rest(
                    f"applications/{app_id}/stages/{st['stageId']}/"
                    f"{st['attemptId']}/taskSummary"
                    "?quantiles=0.0,0.5,0.8,0.9,1.0"
                )
                entry["task_dur_q"] = [
                    round(x / 1e3, 3) for x in q["duration"]
                ]
            except Exception:
                pass
            win.append(entry)
        win.sort(key=lambda s: -s["wall"])
        stage_wall = round(sum(s["wall"] for s in win), 3)
        rec = {
            "run": i,
            "wall": round(wall, 3),
            "rows": n,
            "load1": round(load0, 2),
            "cal_pre": round(cal0, 3),
            "cpu_pct": cpu_pct,
            "n_stages": len(win),
            "sum_stage_wall": stage_wall,
            "gap": round(wall - stage_wall, 3),
            "stages": win[:6],
        }
        print(json.dumps(rec), flush=True)
        runs.append(rec)

    walls = sorted(r["wall"] for r in runs)
    print(json.dumps({
        "summary": True,
        "n": N,
        "walls": [round(w, 3) for w in (r["wall"] for r in runs)],
        "min": round(walls[0], 3),
        "median": round(walls[N // 2], 3),
        "max": round(walls[-1], 3),
    }), flush=True)


if __name__ == "__main__":
    main()

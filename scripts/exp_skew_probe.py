#!/usr/bin/env python
"""Skew-handling probe with task-size quantiles (round 18, guide §2.5,
r17 VERDICT item 6).

The salting utility (functions/skew.py) and AQE's skew-join split both
exist in the engine, but nothing DEMONSTRATED either engaging on a hot
key. This probe runs a 20M-row join with 90% of rows on ONE key at
10x-rehearsal scale through three regimes —

  1. plain sort-merge join, AQE skew split OFF (the pathological base),
  2. the same join with AQE skew split ON (the default),
  3. functions.skew.salted_join (the portable fallback that also
     covers aggregations),

— and records, for the join stage of each, the task DURATION and
SHUFFLE-READ quantiles from the UI REST API plus the wall time. The
artifact to look at is max/median task duration: ~32x under (1), ~1-2x
under (2) and (3).

Usage: python scripts/exp_skew_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = int(os.environ.get("SKEW_PROBE_PORT", "4047"))


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    from pyspark.sql import functions as F

    from sparksqlplus_spark.functions.skew import salted_join
    from sparksqlplus_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="skew_probe",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedTasks": "200000",
        },
    )
    app_id = spark.sparkContext.applicationId

    # fact side: 20M rows, 90% on ONE key; dim side 10k keys. The same
    # hot-key shape as a viral doc id / default user at 100 TB.
    n = 20_000_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 10_000)
        .alias("k"),
        # incompressible payload (hash bits): a run-length-compressible
        # int payload shrinks the hot partition below any skew gate —
        # real 100 TB payloads do not compress 20x
        F.xxhash64(F.col("id")).alias("payload"),
        F.xxhash64(F.col("id"), F.lit(1)).alias("payload2"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("attr"),
    )
    fact = fact.cache()
    fact.count()
    dim = dim.cache()
    dim.count()
    # force the AT-SCALE regime on probe-size data (the same
    # forced-threshold technique as exp_runtime_bloom.py): no broadcast
    # (it would hide the skew entirely), and scale AQE's size gates
    # down to the probe's ~100 MB shuffle — production keeps the
    # defaults, where a genuinely hot key exceeds 256 MB on its own.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the size gates act on COMPRESSED map-output bytes, and a 90%%-one-
    # value key column compresses ~100x locally (measured: 20M records
    # -> 3.0 MB), so probe-scale gates must be far below their
    # production defaults to represent the same RECORD skew
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def run(label: str, fn) -> dict:
        spark.sparkContext.setJobDescription(f"skew:{label}")
        before = {s["stageId"] for s in _rest(f"applications/{app_id}/stages")}
        t0 = time.time()
        out_rows = fn()
        wall = round(time.time() - t0, 2)
        # the UI status store updates asynchronously — poll until the
        # set of new complete stages stops growing (two equal polls),
        # so the shuffle-reading join stage cannot be missed by racing
        # the store
        def read_bytes(s):
            return s.get("shuffleLocalBytesRead", 0) + s.get(
                "shuffleRemoteBytesRead", 0
            )

        stages, prev_ids = [], None
        for _ in range(30):
            time.sleep(0.5)
            stages = [
                s
                for s in _rest(f"applications/{app_id}/stages?status=complete")
                if s["stageId"] not in before and s["numCompleteTasks"] >= 1
            ]
            ids = {s["stageId"] for s in stages}
            if ids and ids == prev_ids:
                break
            prev_ids = ids
        cand = [s for s in stages if read_bytes(s) > 0]
        assert cand, "no shuffle-reading stage found"
        # the join stage = the new stage with the most shuffle-read bytes
        join_stage = max(cand, key=read_bytes)
        q = _rest(
            f"applications/{app_id}/stages/{join_stage['stageId']}/"
            f"{join_stage['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,0.95,1.0"
        )
        rec = {
            "label": label,
            "wall_s": wall,
            "out_rows": out_rows,
            "join_stage_tasks": join_stage["numCompleteTasks"],
            "task_duration_quantiles_ms": q["executorRunTime"],
            # RECORDS, not bytes: local-mode compressed-byte metrics
            # hide the skew (see conf comment above)
            "shuffle_read_quantiles_records": q["shuffleReadMetrics"][
                "readRecords"
            ],
        }
        dq = q["executorRunTime"]
        rec["max_over_median_duration"] = round(dq[-1] / max(dq[1], 1), 1)
        rq = q["shuffleReadMetrics"]["readRecords"]
        rec["max_over_median_records"] = round(rq[-1] / max(rq[1], 1), 1)
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
        return rec

    def agg(df) -> int:
        return df.groupBy("attr").agg(
            F.sum("payload"), F.sum("payload2")
        ).count()

    results = []
    # base case: no skew split AND no coalescing, so the join stage
    # keeps all 32 shuffle partitions and the task-size quantiles show
    # the raw skew (one task owns ~90% of the records); with coalescing
    # left on, AQE merges every small partition into the hot task and
    # the stage degenerates to ONE task — same straggler, less legible
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    results.append(run("plain_smj_skewsplit_off", lambda: agg(fact.join(dim, "k"))))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    results.append(run("smj_aqe_skewsplit_on", lambda: agg(fact.join(dim, "k"))))
    results.append(
        run("salted_join_32", lambda: agg(salted_join(fact, dim, ["k"], salt=32)))
    )
    assert len({r["out_rows"] for r in results}) == 1, results
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Shuffle-codec A/B at 10x rehearsal scale (round 18, guide §2.3,
r17 VERDICT item 7).

``spark.io.compression.codec`` is static per JVM, so run this script
once per codec (fresh process each) and compare:

  python scripts/exp_shuffle_codec_ab.py lz4  /tmp/sf1.0
  python scripts/exp_shuffle_codec_ab.py zstd /tmp/sf1.0

Workloads: the three shuffle-heaviest headline shapes at 10x —
graph_q4_nonfull (the 28M-row DISTINCT exchange), graph_c5_pentagon_ghd
(the hypercube replication exchange feeding the WCOJ cells), tpch_q18
(the lineitem groupBy tower). Reports min-of-3 wall plus total shuffle
write bytes from the UI REST API (the codec's size effect).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODEC = sys.argv[1] if len(sys.argv) > 1 else "lz4"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
UI_PORT = int(os.environ.get("CODEC_PROBE_PORT", "4053"))
NAMES = ["graph_q4_nonfull", "graph_c5_pentagon_ghd", "tpch_q18"]


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _calibrate(spark) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    from sparksqlplus_spark.session import get_spark

    import __spark_entry__ as em

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"codec_{CODEC}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.io.compression.codec": CODEC,
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
        },
    )
    assert spark.conf.get("spark.io.compression.codec") == CODEC
    eng = em._engine(spark, SF_DIR)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    qs = em.queries()
    qs["tpch_q6"](spark, SF_DIR).count()  # warm-ups as bench.py
    from sparksqlplus_spark.operators.wcoj import triangles_wcoj

    warm_edges = eng.sql(
        "SELECT src, dst FROM graph WHERE src % 97 = 0", mode="spark"
    )
    triangles_wcoj(warm_edges, "src", "dst").count()
    eng._executor.clear_cache(blocking=True)
    app_id = spark.sparkContext.applicationId

    out = {"codec": CODEC, "sf_dir": SF_DIR, "queries": {}}
    for name in NAMES:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm (plan cache, JIT)
        before = {s["stageId"] for s in _rest(f"applications/{app_id}/stages")}
        cal0 = _calibrate(spark)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            runs.append(round(time.time() - t0, 3))
        cal1 = _calibrate(spark)
        time.sleep(2)
        new = [
            s
            for s in _rest(f"applications/{app_id}/stages?status=complete")
            if s["stageId"] not in before
        ]
        write_bytes = sum(s.get("shuffleWriteBytes", 0) for s in new) // 3
        out["queries"][name] = {
            "min": min(runs),
            "runs": runs,
            "cal": [cal0, cal1],
            "shuffle_write_bytes_per_run": write_bytes,
        }
        print(f"{CODEC} {name}: min={min(runs)} runs={runs} "
              f"shuffleWrite/run={write_bytes} cal={cal0}/{cal1}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-entry DataFrame-CONSTRUCTION cost profiler (round 18).

bench.py times ``fn(spark, sf_dir).count()`` — construction inside the
timed region — so driver-side Python/py4j work rebuilding Column trees
is part of every recorded number (found in r17 O8). This measures just
the construction: ``fn(spark, sf_dir)`` with no action, best of N,
after one untimed warm build (so lazily-cached engine state and the
expression memos are populated the way a bench steady state sees them).

Usage:
  PYTHONPATH=<tree> python3 scripts/exp_construction_cost.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

TREE = os.environ.get("TREE", "/root/repo")
sys.path.insert(0, TREE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from sparksqlplus_spark.session import get_spark

    import __spark_entry__ as em
    import bench

    names = sys.argv[1:] or [
        n for n in bench.HEADLINE if not n.endswith("_noop")
    ]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="construction", master=f"local[{cpus}]")
    eng = em._engine(spark, SF_DIR)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    qs = em.queries()
    qs["events_asof_join"] = em._asof_join_batch_q

    results = {}
    for name in names:
        fn = qs[bench._base_name(name)]
        fn(spark, SF_DIR)  # warm build (memos, engine plan cache)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR)
            runs.append(round(time.time() - t0, 4))
        results[name] = min(runs)
        print(f"{name}: {min(runs)} {runs}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

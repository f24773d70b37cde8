#!/usr/bin/env python
"""Dump .explain("formatted") for the bench headline queries (round 17).

Plans-only companion to opt_measure.py: builds each query DataFrame
under the SAME context as the bench/opt_measure timing runs (all source
tables cached and materialized) and writes
``plans/r17/<name>_<suffix>.txt`` WITHOUT executing the queries, so a
capture is cheap and host-load-insensitive. Run it from the tree you
want to capture (sys.path pins the tree this file lives in); write the
before/after pairs with the same script so the only differences left in
a normalized diff are real plan changes.

Usage:
  python3 scripts/capture_plans.py <suffix> [out_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TREE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(TREE, "plans", "r17")
    )
    names = sys.argv[3:] or None

    from sparksqlplus_spark.session import get_spark

    import __spark_entry__ as em
    import bench

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="capture_plans", master=f"local[{cpus}]")
    eng = em._engine(spark, SF_DIR)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()

    qs = em.queries()
    qs["events_asof_join"] = em._asof_join_batch_q
    os.makedirs(out_dir, exist_ok=True)
    for name in names or list(bench.HEADLINE):
        df = qs[name](spark, SF_DIR)
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print(f"wrote {p}", flush=True)


if __name__ == "__main__":
    main()

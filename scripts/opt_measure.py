#!/usr/bin/env python
"""Per-query optimization harness (round 17).

Times selected bench/declared queries in ONE fresh process with the
same warm-up protocol as bench.py, min-of-N plus a fixed calibration
reading before and after every query so host-tenancy episodes
(SCALING.md r17 "Pentagon slow mode") are visible next to every
number. Optionally dumps .explain("formatted") to plans/r17/.

Usage:
  python3 scripts/opt_measure.py [--runs N] [--plans SUFFIX] [--noop] q1 q2 ...
  (no names = the full bench HEADLINE list)

--plans before  writes plans/r17/<name>_before.txt
--noop          times df.write.format('noop') instead of count()
                (guide §1.4; count() is the bench-protocol action)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from sparksqlplus_spark.session import get_spark

    import __spark_entry__ as em
    import bench

    names = args.names or list(bench.HEADLINE)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="opt_measure", master=f"local[{cpus}]")
    eng = em._engine(spark, SF_DIR)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    qs = em.queries()
    # same warm-ups as bench.py (JIT the scan-agg, shuffle-join, theta
    # and WCOJ kernel paths)
    qs["tpch_q6"](spark, SF_DIR).count()
    eng.sql(
        """SELECT g1.src AS s, COUNT(*) AS c
           FROM graph AS g1, graph AS g2,
                (SELECT dst, COUNT(*) AS cnt FROM graph GROUP BY dst) AS v
           WHERE g1.dst = g2.src AND g2.dst = v.dst
           GROUP BY g1.src"""
    ).count()
    eng.sql(
        """SELECT s.s_suppkey, n.n_nationkey
           FROM supplier AS s, nation AS n
           WHERE s.s_nationkey = n.n_nationkey
             AND s.s_acctbal > n.n_regionkey"""
    ).count()
    from sparksqlplus_spark.operators.wcoj import triangles_wcoj

    warm_edges = eng.sql(
        "SELECT src, dst FROM graph WHERE src % 97 = 0", mode="spark"
    )
    triangles_wcoj(warm_edges, "src", "dst").count()
    eng._executor.clear_cache(blocking=True)

    qs["events_asof_join"] = em._asof_join_batch_q

    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r17")
    os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in names:
        # bench HEADLINE _noop twins resolve to their base query and
        # force the noop-sink action (mirrors bench._timed_action)
        fn = qs[bench._base_name(name)]
        noop = args.noop or name.endswith("_noop")
        spark.sparkContext.setJobDescription(f"opt:{name}")
        df = fn(spark, SF_DIR)
        if args.plans:
            p = os.path.join(plans_dir, f"{name}_{args.plans}.txt")
            with open(p, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        cal0 = _calibrate(spark)
        runs = []
        rows = None
        for _ in range(args.runs):
            df_i = fn(spark, SF_DIR)
            t0 = time.time()
            if noop:
                df_i.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df_i.count()
            runs.append(round(time.time() - t0, 3))
            if rows is None:
                rows = n
            elif n != rows:
                raise AssertionError(f"{name}: rows changed {rows}->{n}")
        cal1 = _calibrate(spark)
        results[name] = {
            "min": min(runs), "runs": runs, "rows": rows,
            "cal": [cal0, cal1],
        }
        print(f"{name}: min={min(runs)} runs={runs} rows={rows} "
              f"cal={cal0}/{cal1}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

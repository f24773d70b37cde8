"""Measure the auto router's density rule (round-4 verdict item 2).

Prints the _break_blowup estimate for the sparse and dense triangle
queries, then times cyclic_strategy break/ghd/auto on each (best-of-2,
warm inputs) so GHD_BLOWUP's threshold is grounded in measurement.

Usage: python scripts/exp_ghd_router.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.plans import cyclic
from sparksqlplus_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

SPARSE_TRI = em._DENSE_TRI_SQL.replace("graph_dense", "graph")

spark = get_spark(app_name="exp_ghd_router", master="local[32]")
eng = em._engine(spark, SF_DIR)
for t in ("graph", "graph_dense"):
    eng.catalog.get(t).df.count()  # warm the persisted edge tables

for label, sql in (("sparse", SPARSE_TRI), ("dense", em._DENSE_TRI_SQL)):
    ctx = eng.context(sql)
    blowup = cyclic._break_blowup(spark, eng.catalog, ctx)
    print(f"{label}: blowup={blowup:.1f} (threshold {cyclic.GHD_BLOWUP})")
    for strat in ("break", "ghd", "auto"):
        best, rows = None, None
        for _ in range(2):
            t0 = time.time()
            rows = eng.sql(sql, cyclic_strategy=strat).count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(
            f"  {label}/{strat}: {best:.2f}s rows={rows}"
            + (f" last_strategy={cyclic.last_strategy}" if strat == "auto" else "")
        )

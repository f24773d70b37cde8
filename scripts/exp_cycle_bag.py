"""Measure the k-ary cycle-bag upgrade (round-4 verdict item 6).

Times the medium-density (deg ~12) graph_mid C4 under
cyclic_strategy='ghd' twice: with the single-bag cycle kernel (new),
and with _cycle_orientation disabled so execute_ghd falls back to the
decomposer's bags (old behavior: path-joins materializing N*d^3
three-paths through a Spark shuffle). Best-of-2, warm inputs.

Usage: python scripts/exp_cycle_bag.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.plans import cyclic
from sparksqlplus_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark(app_name="exp_cycle_bag", master="local[32]")
eng = em._engine(spark, SF_DIR)
eng.catalog.get("graph_mid").df.count()  # warm

orig = cyclic._cycle_orientation
for label, patch in (("wedge-bags (old)", lambda rels: None), ("cycle-bag (new)", orig)):
    cyclic._cycle_orientation = patch
    best, rows = None, None
    for _ in range(2):
        t0 = time.time()
        rows = eng.sql(em._C4_GHD_SQL, cyclic_strategy="ghd").count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.2f}s rows={rows} bag_kinds={cyclic.last_bag_kinds}")
cyclic._cycle_orientation = orig

"""Measure the k>=5 in-cell semi-join reduction (round-5 verdict item 4).

Times the mid-density (deg ~12) C5 pentagon through the raw k-ary
cycle kernel (operators/wcoj.py:cycle_join) twice: with the
pre-extension semi-join reduction of each edge against its cycle
neighbors (new, default) and with naive path-extend (reduce_edges
=False, the r5 behavior). Best-of-2, warm inputs.

Usage: python scripts/exp_c5_reduce.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.operators.wcoj import cycle_join
from sparksqlplus_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark(app_name="exp_c5_reduce", master="local[32]")
eng = em._engine(spark, SF_DIR)
e = eng.catalog.get("graph_mid").df.select("src", "dst")
e.count()  # warm

for label, flag in (("naive path-extend (r5)", False), ("semi-join reduced (r6)", True)):
    best, rows = None, None
    for _ in range(2):
        t0 = time.time()
        rows = cycle_join([e] * 5, reduce_edges=flag).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.2f}s rows={rows}")

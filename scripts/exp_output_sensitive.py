"""Experiment (round-3): output-sensitive two-comparison enumeration.

Reference R12 (TreeLikeArray.scala:14-77) sorts each key group by the
first comparison value and early-terminates enumeration — output-
sensitive when comparisons are selective. Spark-native candidates:

A. status quo: equi-join with both comparisons folded into the join
   condition (Catalyst applies them during the probe — no intermediate
   materialization, but every probe pair is still TESTED).
B. two-sided per-key extreme pruning: before the join, drop probe rows
   that cannot match ANY build row of their key (per-key min/max
   semi-reduction in BOTH directions), then join as in A. This is the
   Yannakakis-style bound on the TESTED pairs.

Measured on the driver's two_comparisons_edge (moderate selectivity)
and a low-selectivity variant (< 0.1% of pairs survive).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparksqlplus_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="exp_outsens", master="local[32]")

orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
    "o_orderkey", "o_totalprice"
).cache()
lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
    "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
).cache()
orders.count(), lineitem.count()


def run(label, fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        times.append(time.time() - t0)
    print(f"{label}: rows={n} best={min(times):.2f}s all={[round(t,2) for t in times]}",
          flush=True)


def plan_a(qty_factor):
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    j = j.filter(
        (F.col("l_extendedprice") < F.col("o_totalprice"))
        & (F.col("l_quantity") * qty_factor > F.col("o_totalprice"))
    )
    return j.count()


def plan_b(qty_factor):
    # per-key extremes of the lineitem side
    ext = lineitem.groupBy("l_orderkey").agg(
        F.min("l_extendedprice").alias("min_ep"),
        F.max(F.col("l_quantity") * qty_factor).alias("max_q"),
    )
    o2 = orders.join(
        ext,
        (orders.o_orderkey == ext.l_orderkey)
        & (F.col("min_ep") < F.col("o_totalprice"))
        & (F.col("max_q") > F.col("o_totalprice")),
    ).select("o_orderkey", "o_totalprice")
    j = o2.join(lineitem, o2.o_orderkey == lineitem.l_orderkey)
    j = j.filter(
        (F.col("l_extendedprice") < F.col("o_totalprice"))
        & (F.col("l_quantity") * qty_factor > F.col("o_totalprice"))
    )
    return j.count()


print("== moderate selectivity (two_comparisons_edge: factor 1000) ==")
run("A join+filter", lambda: plan_a(1000.0))
run("B extreme-pruned", lambda: plan_b(1000.0))

print("== low selectivity (factor 40: ~0 qualifying pairs) ==")
run("A join+filter", lambda: plan_a(40.0))
run("B extreme-pruned", lambda: plan_b(40.0))

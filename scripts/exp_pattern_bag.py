"""Measure the generalized pattern-bag evaluator (round-5 verdict item 5).

Evaluates ONE chorded-C4 bag (edges ab,bc,cd,da + chord ac over the
mid-density graph) both ways _eval_bag can run it: the r5 binary-join
fallback (greedy joins + final dedup — now with the bag-internal
semi-join sweep) vs the r6 generic-join pattern kernel
(operators/wcoj.py:pattern_join). Best-of-2, warm inputs.

Usage: python scripts/exp_pattern_bag.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as em
from sparksqlplus_spark.operators.wcoj import pattern_join
from sparksqlplus_spark.plans import cyclic
from sparksqlplus_spark.plans.context import Relation
from sparksqlplus_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark(app_name="exp_pattern_bag", master="local[32]")
eng = em._engine(spark, SF_DIR)
g = eng.catalog.get("graph_mid").df
g.count()  # warm

EVARS = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
rels, dfs = [], {}
for i, (u, v) in enumerate(EVARS):
    r = Relation(rid=i, alias=f"e{i}", kind="scan")
    r.col_to_var = {"src": u, "dst": v}
    rels.append(r)
    dfs[i] = g.select(F.col("src").alias(u), F.col("dst").alias(v))

VARS = ["a", "b", "c", "d"]


def run_binary():
    # force the r5 path: bypass the cyclicity dispatch by calling the
    # greedy tail directly (semi-join sweep + joins + dedup)
    reduced = {r.rid: dfs[r.rid] for r in rels}
    for r in rels:
        for other in rels:
            shared = sorted(r.variables & other.variables)
            if other.rid == r.rid or not shared:
                continue
            reduced[r.rid] = reduced[r.rid].join(
                dfs[other.rid].select(*shared), shared, "left_semi"
            )
    remaining = list(rels)
    first = remaining.pop(0)
    result = reduced[first.rid]
    have = set(first.variables)
    while remaining:
        pick = next((r for r in remaining if r.variables & have), remaining[0])
        remaining.remove(pick)
        shared = sorted(pick.variables & have)
        result = result.join(reduced[pick.rid], shared, "inner")
        have |= set(pick.variables)
    return result.select(*VARS).dropDuplicates()


def run_pattern():
    sides = [dfs[r.rid].select(*sorted(r.variables)) for r in rels]
    evars = [tuple(sorted(r.variables)) for r in rels]
    return pattern_join(sides, evars).select(*VARS)


for label, fn in (("binary joins + dedup (r5)", run_binary), ("pattern kernel (r6)", run_pattern)):
    best, rows = None, None
    for _ in range(2):
        t0 = time.time()
        rows = fn().count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.2f}s rows={rows}")

# sanity: the dispatcher itself must pick the pattern kernel
cyclic.last_bag_kinds = []
cyclic._eval_bag(rels, dfs, VARS).count()
print("dispatch:", cyclic.last_bag_kinds)

"""Interleaved A/B: graph_q1 under always-persist vs share-no-persist,
with bench-identical warm caches, in one process."""

import sys
import time

sys.path.insert(0, "/root/repo")

from sparksqlplus_spark.session import get_spark

import __spark_entry__ as em
import sparksqlplus_spark.compiler.cqc as cqc

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="exp_q1_ab", master="local[32]")
eng = em._engine(spark, SF_DIR)
for meta in eng.catalog.tables():
    if meta.df is not None:
        meta.df = meta.df.cache()
        meta.df.count()
em.queries()["tpch_q6"](spark, SF_DIR).count()

q1 = em._GRAPH_CASES["graph_q1_path_counts"][0]
q4 = em._GRAPH_CASES["graph_q4_nonfull"][0]

orig_base_cached = cqc.CqcExecutor._base_cached

variants = {
    "share_nopersist": lambda self, table: True,   # base 'cached' -> skip persist
    "always_persist": lambda self, table: False,   # base 'uncached' -> persist
}

results: dict[str, list[float]] = {k: [] for k in variants}
res4: dict[str, list[float]] = {k: [] for k in variants}
for rep in range(4):
    for name, fn in variants.items():
        cqc.CqcExecutor._base_cached = fn
        eng._executor.clear_cache()
        t0 = time.time()
        eng.sql(q1).count()
        results[name].append(time.time() - t0)
        t0 = time.time()
        eng.sql(q4).count()
        res4[name].append(time.time() - t0)
cqc.CqcExecutor._base_cached = orig_base_cached
for name in variants:
    r, r4 = results[name], res4[name]
    print(f"q1 {name}: best={min(r):.2f} med={sorted(r)[len(r)//2]:.2f} all={[round(t,2) for t in r]}")
    print(f"q4 {name}: best={min(r4):.2f} med={sorted(r4)[len(r4)//2]:.2f} all={[round(t,2) for t in r4]}")

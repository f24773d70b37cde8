"""Experiment: graph_q1 with vs without persisting the shared agg view.

Hypothesis (VERDICT r2 'What's wrong' #2): the persist() materializes
inside the timed region and Spark's physical ReuseExchange would dedup
the identical agg subtrees anyway, so persisting is pure overhead in a
single-shot timing.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from sparksqlplus_spark.session import get_spark

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(app_name="exp_q1", master="local[32]")
eng = em._engine(spark, SF_DIR)
for meta in eng.catalog.tables():
    if meta.df is not None:
        meta.df = meta.df.cache()
        meta.df.count()
em.queries()["tpch_q6"](spark, SF_DIR).count()

q1_sql = em._GRAPH_CASES["graph_q1_path_counts"][0]

import sparksqlplus_spark.compiler.cqc as cqc

orig_build = cqc.CqcExecutor._build_all


def build_no_persist(self, ctx):
    from collections import Counter

    agg_cache = {}
    dfs = {
        r.rid: cqc.build_relation_df(
            self.spark, self.catalog, r,
            ctx.local_filters.get(r.rid, []), ctx.var_map, agg_cache=agg_cache,
        )
        for r in ctx.relations
    }
    return dfs


for label, build in [("persist", orig_build), ("no_persist", build_no_persist),
                     ("persist2", orig_build), ("no_persist2", build_no_persist)]:
    cqc.CqcExecutor._build_all = build
    spark.catalog.clearCache()
    # re-warm sources (clearCache dropped them)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df.count()
    t0 = time.time()
    n = eng.sql(q1_sql).count()
    print(f"{label}: {time.time() - t0:.3f}s rows={n}", flush=True)

# plan inspection: does ReusedExchange appear without persist?
cqc.CqcExecutor._build_all = build_no_persist
plan = eng.sql(q1_sql)._jdf.queryExecution().executedPlan().toString()
reused = plan.count("ReusedExchange")
print(f"no_persist plan ReusedExchange occurrences: {reused}")

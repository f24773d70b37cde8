"""Check runtime AQE exchange reuse for graph_q1's duplicated agg view."""

import sys

sys.path.insert(0, "/root/repo")

from sparksqlplus_spark.session import get_spark

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.01"

spark = get_spark(app_name="exp_q1_reuse", master="local[8]")
eng = em._engine(spark, SF_DIR)

q1_sql = em._GRAPH_CASES["graph_q1_path_counts"][0]

import sparksqlplus_spark.compiler.cqc as cqc


def build_no_persist(self, ctx):
    agg_cache = {}
    return {
        r.rid: cqc.build_relation_df(
            self.spark, self.catalog, r,
            ctx.local_filters.get(r.rid, []), ctx.var_map, agg_cache=agg_cache,
        )
        for r in ctx.relations
    }


cqc.CqcExecutor._build_all = build_no_persist
df = eng.sql(q1_sql)
df.count()  # execute so AQE finalizes
final = df._jdf.queryExecution().executedPlan().toString()
print("ReusedExchange in final plan:", final.count("ReusedExchange"))
print("Exchange count:", final.count("Exchange"))

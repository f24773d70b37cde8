"""Warm-run comparator: our engine vs the reference's spark.sql baseline
(the DISTINCT-rewritten verbatim query, CompileController.java:98-101)
on headline queries at sf0.1 — interleaved, best of 3."""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="baseline_cmp", master="local[32]")
eng = em._engine(spark, SF)
for meta in eng.catalog.tables():
    if meta.df is not None:
        meta.df = meta.df.cache()
        meta.df.count()
em.queries()["tpch_q6"](spark, SF).count()
eng.sql(
    """SELECT g1.src AS s, COUNT(*) AS c
       FROM graph AS g1, graph AS g2,
            (SELECT dst, COUNT(*) AS cnt FROM graph GROUP BY dst) AS v
       WHERE g1.dst = g2.src AND g2.dst = v.dst GROUP BY g1.src"""
).count()

# (name, engine sql, spark.sql baseline — DISTINCT-rewritten when non-full)
CASES = []
for name in [
    "chain_theta_nonfull", "multihop_theta", "two_comparisons_edge",
    "tpch_q3", "tpch_q10", "tpch_q17", "tpch_q18",
]:
    esql, osql = em._SQL_CASES[name]
    CASES.append((name, esql, (osql or esql).replace("INTERVAL 90 DAY", "INTERVAL '90' DAY")))
for name in ["graph_q1_path_counts", "graph_q4_nonfull", "graph_q8_4hop"]:
    esql, osql = em._GRAPH_CASES[name]
    CASES.append((name, esql, osql))

print(f"{'query':28s} {'ours':>7s} {'spark.sql':>9s} {'ratio':>6s}")
for name, esql, bsql in CASES:
    ours, base = [], []
    for _ in range(3):
        t0 = time.time(); eng.sql(esql).count(); ours.append(time.time() - t0)
        t0 = time.time(); eng.sql(bsql, mode="spark").count(); base.append(time.time() - t0)
    o, b = min(ours), min(base)
    print(f"{name:28s} {o:7.2f} {b:9.2f} {o/b:6.2f}", flush=True)

"""A/B: pagerank with vs without pre-partitioning the edge table by
its join key (operators/graph.py). With prepartition, each iteration's
src-keyed join reuses the persisted edge layout and only the rank
frame shuffles; without, Spark re-plans the exchange per round.
Interleaved, best of 3, warm caches. Usage:
python scripts/exp_pagerank_prepart.py [iterations]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.operators.graph import pagerank
from sparksqlplus_spark.session import get_spark

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
spark = get_spark(app_name="pagerank_ab", master="local[32]")
eng = em._engine(spark, "/root/testdata/sf0.1")
edges = eng.catalog.get("graph").df
edges.count()  # warm

best = {"prepart": float("inf"), "plain": float("inf")}
rows = {}
for rnd in range(3):
    for tag, flag in (("prepart", True), ("plain", False)):
        t0 = time.time()
        out = pagerank(edges, iterations=ITERS, prepartition=flag)
        rows[tag] = out.count()
        out.unpersist()
        dt = time.time() - t0
        best[tag] = min(best[tag], dt)
        print(f"round {rnd} {tag}: {dt:.2f}s (rows={rows[tag]})", flush=True)

assert rows["prepart"] == rows["plain"]
print(
    f"\nbest-of-3 @ {ITERS} iterations: prepart {best['prepart']:.2f}s, "
    f"plain {best['plain']:.2f}s, ratio {best['plain'] / best['prepart']:.2f}x"
)

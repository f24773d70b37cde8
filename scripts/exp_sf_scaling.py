"""Scale-curve measurement: headline queries at sf0.001 / 0.01 / 0.1.

The correctness gate proves the answers; this measures how cost GROWS.
For each query we record warm best-of-2 wall seconds per sf and the
empirical scaling exponent alpha = log10(t_sf0.1 / t_sf0.01) — data
grows 10x between those points, so alpha ~ 1 means linear in input,
alpha well below 1 means fixed overhead still dominates at sf0.1, and
alpha > 1 flags a stage whose cost grows faster than the data (the
100-TB red flag). Output feeds the scale-curve table in SCALING.md.

Run: python scripts/exp_sf_scaling.py [query ...]
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
DEFAULT = [
    "chain_theta_nonfull",
    "multihop_theta",
    "graph_q1_path_counts",
    "graph_q4_nonfull",
    "graph_q8_4hop",
    "graph_triangle_cyclic",
    "tpch_q3",
    "tpch_q10",
    "tpch_q18",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_repetition",
    "text_boilerplate",
    "sample_mixture",
    "ann_cosine_topk",
]

names = sys.argv[1:] or DEFAULT
spark = get_spark(app_name="sf_scaling", master="local[32]")
qs = em.queries()

results: dict[str, dict[str, float]] = {n: {} for n in names}
for sf_dir in SFS:
    eng = em._engine(spark, sf_dir)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    for n in names:
        qs[n](spark, sf_dir).count()  # warm (JIT + caches + shared views)
        best = math.inf
        for _ in range(2):
            t0 = time.time()
            qs[n](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        results[n][sf_dir] = best
        print(f"  {n} @ {sf_dir.rsplit('/', 1)[1]}: {best:.3f}s", flush=True)

print(f"\n{'query':24s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'alpha':>6s}")
for n in names:
    t1, t2, t3 = (results[n][sf] for sf in SFS)
    alpha = math.log10(t3 / t2) if t2 > 0 else float("nan")
    flag = "  <-- superlinear" if alpha > 1.1 else ""
    print(f"{n:24s} {t1:8.3f} {t2:8.3f} {t3:8.3f} {alpha:6.2f}{flag}")

"""Big-scale rehearsal: measure headline queries at sf0.1 vs a K-times
key-shifted union built by make_scaled_testdata.py (default /tmp/sf0.4,
K=4) and report alpha = log(t_K / t_1) / log(K) — the 40x-window
extension of exp_sf_scaling.py's 10x curves. alpha ~ 1 is input-linear;
alpha > 1.1 flags a stage growing faster than its input (the 100 TB
red flag the 10x window can miss when fixed overhead still dominates
at sf0.1).

Run: python scripts/exp_big_scale.py [query ...]
Env: BIG_DIR (default /tmp/sf0.4), BIG_K (default 4)
"""

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from sparksqlplus_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
BIG = os.environ.get("BIG_DIR", "/tmp/sf0.4")
K = int(os.environ.get("BIG_K", "4"))

# join/agg/window/graph families only: the scaled dir replicates FACT
# tables, so per-key and per-join-group work grows exactly Kx; corpus
# ops (documents/embeddings are copied unshifted) keep their
# exp_sf_scaling.py curves instead
DEFAULT = [
    "chain_theta_nonfull",
    "multihop_theta",
    "two_comparisons_edge",
    "graph_q1_path_counts",
    "graph_q4_nonfull",
    "graph_q8_4hop",
    "graph_triangle_cyclic",
    "graph_c5_pentagon_ghd",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5_cyclic",
    "tpch_q6",
    "tpch_q10",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q21",
    "events_tumbling_window",
    "events_session_window",
    "events_asof_join",
    "window_frame_movavg",
    "window_qualify_topk",
]

names = sys.argv[1:] or DEFAULT
spark = get_spark(app_name="big_scale", master="local[32]")
qs = em.queries()

results: dict[str, dict[str, float]] = {n: {} for n in names}
for sf_dir in [BASE, BIG]:
    eng = em._engine(spark, sf_dir)
    for meta in eng.catalog.tables():
        if meta.df is not None:
            meta.df = meta.df.cache()
            meta.df.count()
    for n in names:
        qs[n](spark, sf_dir).count()  # warm
        best = math.inf
        for _ in range(2):
            t0 = time.time()
            qs[n](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        results[n][sf_dir] = best
        print(f"  {n} @ {sf_dir.rsplit('/', 1)[1]}: {best:.3f}s", flush=True)

print(f"\n{'query':24s} {'sf0.1':>8s} {f'{K}x':>8s} {'alpha':>6s}")
for n in names:
    t1, tk = results[n][BASE], results[n][BIG]
    alpha = math.log(tk / t1) / math.log(K) if t1 > 0 else float("nan")
    flag = "  <-- superlinear" if alpha > 1.1 else ""
    print(f"{n:24s} {t1:8.3f} {tk:8.3f} {alpha:6.2f}{flag}")

#!/usr/bin/env python
"""Non-binary-edge (>2-var hyperedge) cyclic bags: measurement behind
the SCALING.md adjudication that binary-join-in-bag stays the default
evaluator for them (round-9; r7 verdict item 8 carried).

Fixture: a triangle of THREE-variable relations built from the bench
graph — R(a,b,w1), S(b,c,w2), T(c,a,w3), each edge carrying a private
weight variable, cyclically joined on (a,b,c). The hypergraph is
cyclic with every hyperedge of arity 3, so no triangle/cycle/pattern
kernel applies and the GHD bag falls to pairwise joins in connected
order (plans/cyclic.py:_eval_bag tail). The sparse and dense graph
variants are both timed under every router strategy, best-of-2 warm.

Run: python scripts/exp_hyperedge_bag.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sparksqlplus_spark import get_spark  # noqa: E402

spark = get_spark(app_name="exp_hyperedge_bag", master="local[32]")
eng = E._engine(spark, sf_dir)

Q = """SELECT COUNT(*) AS n FROM r3 AS r, s3 AS s, t3 AS t
       WHERE r.b1 = s.b2 AND s.c2 = t.c3 AND t.a3 = r.a1"""

for gname in ("graph", "graph_dense"):
    base = eng.catalog.get(gname).df
    eng.catalog.register_df(
        "r3",
        base.select(
            F.col("src").alias("a1"), F.col("dst").alias("b1"),
            (F.col("src") % 7).alias("w1"),
        ).persist(),
        (),
    )
    eng.catalog.register_df(
        "s3",
        base.select(
            F.col("src").alias("b2"), F.col("dst").alias("c2"),
            (F.col("dst") % 5).alias("w2"),
        ).persist(),
        (),
    )
    eng.catalog.register_df(
        "t3",
        base.select(
            F.col("src").alias("c3"), F.col("dst").alias("a3"),
            (F.col("src") % 3).alias("w3"),
        ).persist(),
        (),
    )
    for t in ("r3", "s3", "t3"):
        eng.catalog.get(t).df.count()  # warm the persisted inputs
    results = {}
    expect = None
    for strat in ("auto", "break", "ghd", "naive"):
        runs = []
        n = None
        for _ in range(2):
            t0 = time.time()
            n = eng.sql(Q, cyclic_strategy=strat).collect()[0]["n"]
            runs.append(time.time() - t0)
        if expect is None:
            expect = n
        assert n == expect, (gname, strat, n, expect)
        results[strat] = min(runs)
    print(
        gname, f"rows={expect}",
        " ".join(f"{k}={v:.2f}s" for k, v in results.items()),
        flush=True,
    )
    for t in ("r3", "s3", "t3"):
        eng.catalog.get(t).df.unpersist()
        eng.catalog.unregister(t)

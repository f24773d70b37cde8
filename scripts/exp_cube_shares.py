#!/usr/bin/env python
"""A/B asymmetric hypercube shares for the k=5 cycle kernel (round 17).

The pentagon's 32 cells have EQUAL input (599k rows/cell measured) but
2-4x spread in in-cell kernel time — wall = slowest cell with exactly
one cell per core. More, smaller cells give the scheduler slack to
pack the data-dependent spread, at the cost of extra replication
(relation i replicated prod/ (p_i p_{i+1}) times). This measures the
trade directly on the bench pentagon shape at sf0.1: symmetric (2^5 =
32 cells, 8x replication) vs (4,2,2,2,2) = 64 cells vs (4,4,2,2,2) =
128 cells, warm best-of-2 each, counts asserted equal.

Run: PYTHONPATH=/root/repo python3 scripts/exp_cube_shares.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as em
from sparksqlplus_spark.operators.wcoj import cycle_join
from sparksqlplus_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="cube_shares", master="local[32]")
    eng = em._engine(spark, SF_DIR)
    g = eng.catalog.get("graph_mid").df.cache()
    g.count()
    e1 = g.filter(F.col("src") <= 2000).cache()
    e1.count()
    edges = [e1] + [g] * 4

    variants = [
        ("sym 2^5 (32 cells, 8x repl)", None),
        ("(4,2,2,2,2) 64 cells", [4, 2, 2, 2, 2]),
        ("(4,4,2,2,2) 128 cells", [4, 4, 2, 2, 2]),
        ("(3,3,3,3,3) 243 cells", [3, 3, 3, 3, 3]),
    ]
    base_count = None
    for name, shares in variants:
        times = []
        for _ in range(2):
            t0 = time.time()
            n = cycle_join(edges, cube_shares=shares).count()
            times.append(time.time() - t0)
        if base_count is None:
            base_count = n
        assert n == base_count, (name, n, base_count)
        print(
            f"{name}: rows {n}  runs {[round(t, 3) for t in times]} "
            f"best {min(times):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

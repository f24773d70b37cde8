"""Build a K-times-larger testdata directory from sf0.1 by unioning K
key-shifted copies of every FACT table (dimensions stay fixed, like
TPC-H itself). This extends the measured scale window from the driver's
10x (sf0.01 -> sf0.1) to 40x without touching /root/testdata.

Key families shift together so every FK join keeps exactly its sf0.1
semantics within each copy (copy i's orders reference copy i's
customers, etc.): the result is K disjoint sf0.1 "universes" sharing
the nation/region dims — output and intermediate sizes of per-key /
per-join-group operators grow exactly Kx, so the empirical exponent
alpha = log(t_K / t_1) / log(K) reads directly as input-linearity.

The derived graph family scales naturally: the node domain is
max(l_orderkey)/3, so K copies give Kx edges over a Kx domain — the
same average degree as sf0.1 (the regime the router's density rule
was tuned on), just Kx more of it.

documents/embeddings are copied UNSHIFTED (one copy): replicating a
corpus K times makes every doc a cross-copy near-duplicate, which
changes the dedup problem itself (pair output grows K^2-ish by
construction), not the operator's scaling — the corpus ops keep their
measured sf0.001->0.1 curves instead.

Usage: python scripts/make_scaled_testdata.py [K] [out_dir] [src_dir]
Defaults: K=4, out=/tmp/sf0.4, src=/root/testdata/sf0.1
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparksqlplus_spark.api import _nanos_timestamp_cols
from sparksqlplus_spark.session import get_spark

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.4"
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

# key-family columns per fact table; every column in one family shifts
# by the same per-copy offset so FK joins stay copy-local
FACT_KEYS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
}
DIMS = ["nation", "region"]
UNSHIFTED = ["documents", "embeddings"]

spark = get_spark(app_name="make_scaled", master="local[32]")
os.makedirs(OUT, exist_ok=True)


def read(table: str):
    path = f"{SRC}/{table}.parquet"
    df = spark.read.parquet(path)
    # normalize TIMESTAMP(NANOS) (read as long under nanosAsLong) to
    # microsecond timestamps so the scaled files read back plainly
    for col in _nanos_timestamp_cols(path):
        if col in df.columns:
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


# one offset per key FAMILY = (global max over every column in the
# family) + 1 EXACTLY: the derived graph's node domain is
# max(l_orderkey)/3, so a rounded-up offset would inflate the domain
# without edges and silently drop the graph's average degree — the
# density the cyclic router and kernel measurements are tuned on
family_max: dict[str, int] = {}
frames: dict[str, object] = {}
for table, keys in FACT_KEYS.items():
    df = frames[table] = read(table)
    for col, fam in keys.items():
        m = df.agg(F.max(col)).collect()[0][0]
        family_max[fam] = max(family_max.get(fam, 0), int(m))
offset = {fam: m + 1 for fam, m in family_max.items()}

for table, keys in FACT_KEYS.items():
    base = frames[table]
    copies = []
    for i in range(K):
        c = base
        for col, fam in keys.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * offset[fam]))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
    print(f"{table}: {K}x shifted copies written", flush=True)

for table in DIMS + UNSHIFTED:
    read(table).write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
    print(f"{table}: copied unshifted", flush=True)

print(f"done: {OUT} (K={K}, offsets={offset})")

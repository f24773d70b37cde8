"""Skew measurement: plain join vs AQE skew-split vs deterministic
salting (functions/skew.py) on a hot-key join at sf0.1 scale."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparksqlplus_spark.functions.skew import salted_join
from sparksqlplus_spark.session import get_spark

spark = get_spark(app_name="exp_skew", master="local[32]")

# fact side: 2M rows, 90% on ONE key (the pathological case AQE's
# skew-join split targets), joined to a 10k-row dim
n = 20_000_000
fact = spark.range(n).select(
    F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 10_000).alias("k"),
    (F.col("id") * 3 % 1000).alias("payload"),
)
dim = spark.range(10_000).select(
    F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
)
fact = fact.cache(); fact.count()
dim = dim.cache(); dim.count()
# force the shuffle path (a broadcast join would hide the skew)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")


def t(label, fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    print(f"{label}: best={min(times):.2f}s all={[round(x, 2) for x in times]}", flush=True)


def agg(df):
    return df.groupBy("attr").agg(F.sum("payload")).count()


spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
t("plain sort-merge join (AQE skew split OFF)", lambda: agg(fact.join(dim, "k")))
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
t("sort-merge join + AQE skew split", lambda: agg(fact.join(dim, "k")))
t("deterministic salted join (salt=32)", lambda: agg(salted_join(fact, dim, ["k"], salt=32)))

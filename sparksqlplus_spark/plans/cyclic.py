"""Cyclic-query execution: break rewrite + GHD decomposition.

Reference: convert/CyclicHandler.scala:26-114 (break via PK reachability),
ghd/GhdAlgorithm.scala (GHD enumeration with fractional-edge-cover
scoring), lftj (Leapfrog TrieJoin) for bag evaluation.

Round-1 state: cyclic queries execute via the greedy connected-join
baseline (binary joins over unified variables enforce every cycle edge
— joining all relations on shared variable names applies each equality
exactly once, so results are correct; a WCOJ bag evaluation is a
performance upgrade tracked for a later round). The `break` rewrite
(P3) and GHD bags (P4) land here next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksqlplus_spark.catalog import Catalog
from sparksqlplus_spark.compiler.cqc import naive_execute
from sparksqlplus_spark.plans.context import Context


def execute_cyclic(
    spark: SparkSession, catalog: Catalog, ctx: Context, mode: str = "auto"
) -> DataFrame:
    return naive_execute(spark, catalog, ctx)

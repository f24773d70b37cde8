"""sparksqlplus_spark — a PySpark-native analytics engine.

A brand-new engine with the query capabilities of SparkSQL+ (SIGMOD'23,
DOI 10.1145/3555041.3589715; reference implementation hkustDB/SparkSQLPlus):
conjunctive queries with comparisons (CQC) planned Yannakakis-style over
GYO/GHD join trees — but executed as idiomatic Spark DataFrame plans
(Catalyst + Tungsten pick the physical strategy) instead of generated
RDD code.

Top-level entry point: :class:`sparksqlplus_spark.api.SparkSQLPlus`.
"""

__version__ = "0.1.0"
__all__ = ["SparkSQLPlus", "get_spark"]


def __getattr__(name):  # lazy to keep submodule imports cheap
    if name == "SparkSQLPlus":
        from sparksqlplus_spark.api import SparkSQLPlus

        return SparkSQLPlus
    if name == "get_spark":
        from sparksqlplus_spark.session import get_spark

        return get_spark
    raise AttributeError(name)

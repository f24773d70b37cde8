from sparksqlplus_spark.parser.sql import parse_query

__all__ = ["parse_query"]

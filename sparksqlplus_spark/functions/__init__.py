"""Public column functions and join utilities.

Re-exports the engine's reusable expression-level helpers (all
JVM-side, whole-stage-codegen friendly) plus skew-handling utilities.
"""

from sparksqlplus_spark.functions.skew import salted_join
from sparksqlplus_spark.operators.dedup import h52, shingles_col, tokens_col
from sparksqlplus_spark.operators.similarity import cosine_similarity
from sparksqlplus_spark.operators.text import token_count, whitespace_token_count

__all__ = [
    "cosine_similarity",
    "h52",
    "salted_join",
    "shingles_col",
    "token_count",
    "tokens_col",
    "whitespace_token_count",
]

"""Batch sessionization: gap-based session rollup over an event log.

Engine extension (not in the reference). The batch sibling of
streaming/windows.py:session_agg — same gap semantics, but over a
bounded table where the exact windowed form is cheaper than state:
one shuffle on the user key, then two windows over the SAME partition
ordering (Spark reuses the sort — `.explain` shows a single Exchange +
Sort feeding both), then the per-session aggregate, which is
partition-local because (user, session_seq) is a refinement of the
window partitioning.

Scale shape at 100 TB: the only corpus-wide exchange is the hash
partition on the user key. Session assignment is a running sum per
user (no cross-user state), so skew is bounded by the hottest single
user; aggregates are order-insensitive, so tie timestamps cannot
change the output. No collects, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str | None = "value",
) -> DataFrame:
    """Roll events into gap-delimited sessions per user.

    A new session starts at a row whose timestamp is more than
    ``gap_minutes`` after the user's previous event (epoch-seconds
    comparison, sub-second precision kept). Output: one row per
    session — ``(user, session_seq, session_start, session_end,
    n_events[, sum_value])`` with ``session_seq`` numbering a user's
    sessions from 1 in start order.
    """
    gap_s = float(gap_minutes) * 60.0

    # NTZ-safe epoch seconds with sub-second precision: the session
    # timezone is pinned to UTC (session.py), so the NTZ->timestamp
    # cast is exact and DST-free
    def epoch(c):
        return c.cast("timestamp").cast("double")

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch(F.col(ts_col)) - epoch(prev)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = df.withColumn("session_seq", seq)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return sessions.groupBy(user_col, "session_seq").agg(*aggs)

"""As-of (nearest-preceding) join — the time-series point-in-time
lookup Spark SQL lacks (DuckDB: ASOF JOIN; pandas: merge_asof). Engine
extension beyond the reference surface (SURVEY §2.4): for every left
row, attach the single right row with the largest right timestamp
<= the left timestamp (direction='backward'; 'forward' mirrors it)
within the same key group, LEFT-preserving (unmatched lefts keep NULL
payloads).

Scale design — the union + running-`last` pattern, NOT a range join:
a range-condition join explodes into |left| x |preceding rights| per
key before dedup, and Spark plans it as BroadcastNestedLoop when the
equality keys are absent. Instead both sides union into one frame
(map-only), ONE shuffle on the key sorts each group by (ts, side),
and a running `last(payload, ignorenulls=True)` over the ordered
window carries the latest right payload forward onto each left row.
Cost: one exchange + one sort — identical shape to any windowed
aggregate; per-key skew is bounded by the same partial-ordering the
window needs anyway. No driver state, no UDFs, whole-stage codegen
throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """LEFT-preserving as-of join.

    Parameters
    ----------
    left, right : the two frames; every non-key right column comes
        back suffixed (``suffix``), including the right timestamp.
    left_ts, right_ts : timestamp (or any orderable) column names.
    by : equality key columns (same names both sides); ``None`` or
        ``[]`` means a single global group — valid, but the one-group
        window serializes on a single task at scale, so pass keys for
        big inputs.
    direction : 'backward' (largest right ts <= left ts — the ASOF
        default) or 'forward' (smallest right ts >= left ts).
    tolerance : optional max distance between the two timestamps —
        an expression comparable to their difference (e.g.
        ``F.expr("INTERVAL 10 MINUTES")`` for timestamps, a number
        for numeric ts). Matches farther than this revert to NULL.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by or [])
    payload = [c for c in right.columns if c not in by]
    if right_ts not in payload:
        raise ValueError(f"right frame has no column {right_ts!r}")
    out_payload = {c: f"{c}{suffix}" for c in payload}
    if set(out_payload.values()) & set(left.columns):
        raise ValueError("suffixed right columns collide with left columns")

    # union the two sides: left rows carry their own columns, right
    # rows only (by, ts, payload) — NULL-padded into a shared schema
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_payload[c])
          for c in payload],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by else F.col(c)
          for c in left.columns],
        *[F.col(c).alias(out_payload[c]) for c in payload],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # backward: ascending ts; a right row at the SAME ts sorts before
    # the left row (side 0 < 1), so ties match inclusively — the ASOF
    # >= convention. forward: descending ts, same tie rule.
    order = (
        [F.col("__asof_ts").asc(), F.col("__asof_side").asc()]
        if direction == "backward"
        else [F.col("__asof_ts").desc(), F.col("__asof_side").asc()]
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in payload:
        carried = carried.withColumn(
            out_payload[c],
            F.last(F.col(out_payload[c]), ignorenulls=True).over(w),
        )
    result = carried.filter(F.col("__asof_side") == 1)
    if tolerance is not None:
        matched_ts = F.col(out_payload[right_ts])
        dist = (
            F.col("__asof_ts") - matched_ts
            if direction == "backward"
            else matched_ts - F.col("__asof_ts")
        )
        within = matched_ts.isNotNull() & (dist <= tolerance)
        for c in payload:
            result = result.withColumn(
                out_payload[c],
                F.when(within, F.col(out_payload[c])),
            )
    return result.select(
        *[F.col(c) for c in left.columns],
        *[F.col(out_payload[c]) for c in payload],
    )

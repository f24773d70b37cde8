"""Bounded GLOBAL Pareto-frontier fold for keyless 2-comparison
shapes (round 13 — extracted from api.Engine._keyless_pair_flag so the
NOT IN threshold executor shares one implementation).

A keyless pair of order comparisons (``EXISTS(i: i.c1 OP1 o.d1 AND
i.c2 OP2 o.d2)`` over the whole inner table, or the three-valued facts
of a keyless pair-filtered NOT IN) reduces to a 2-D dominance query
against the GLOBAL Pareto staircase. Building that staircase with the
keyed path's window would degenerate to a single window partition over
the whole inner table — a scale-killer — so it is built as:

  (1) a ``groupBy(u)`` pre-reduction with map-side combine,
  (2) a per-Arrow-batch frontier via ``mapInPandas`` (each batch's
      staircase is a superset reduction, vectorized cummin/cummax),
  (3) a bounded plan-time merge of the batch frontiers on the driver —
      the same metadata-scale-collect class as the const-probe stats
      gates, capped at ``cap`` points (a real frontier is tiny unless
      the data is a deliberate anti-chain; above the cap we raise and
      ``mode='auto'`` rides the spark.sql fallback).

Supported dtypes: integral, date, timestamp — totally ordered with
identical semantics in Spark, pandas, and Python, so the driver-side
merge is exact. Float (NaN's order-last rule has no pandas cummin
analogue), decimal, and string columns raise and ride the fallback
instead of risking a semantic skew.

Reference parity note: the reference's TreeLikeArray (SURVEY R9/R12,
sqlplus-core TreeLikeArray) bounds its sorted dictionary by the
frontier's change points; this module is the same bound for the
keyless/global case.
"""

from __future__ import annotations

from sparksqlplus_spark.parser.sql import UnsupportedSqlError

_FRONTIER_DTYPE_MSG = (
    "keyless 2-comparison shapes support integral/date/timestamp "
    "columns only (got {dt})"
)


def global_frontier_points(inner, c1: str, c2: str, asc1: bool,
                           take_min2: bool, cap: int):
    """Fold the global Pareto staircase of ``(c1, c2)`` over ``inner``
    (rows with a NULL compared column are filtered — they can never
    satisfy an order comparison). Returns ``(points, u_type, v_type)``
    where ``points`` is the merged staircase as a list of ``(u, v)``
    tuples sorted in probe order (ascending u for ``asc1``, else
    descending) with strictly improving v. Raises UnsupportedSqlError
    on non-exact dtypes or when the frontier exceeds ``cap`` points
    (one bounded Spark job has run by then; mode='auto' replans on the
    spark.sql fallback — the documented aborted-frontier cost)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    best2 = F.min if take_min2 else F.max
    reduced = (
        inner.filter(F.col(c1).isNotNull() & F.col(c2).isNotNull())
        .select(F.col(c1).alias("u"), F.col(c2).alias("v"))
        .groupBy("u")
        .agg(best2("v").alias("v"))
    )
    schema = reduced.schema
    ok_types = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.DateType, T.TimestampType,
    )
    for f in schema.fields:
        if not isinstance(f.dataType, ok_types):
            raise UnsupportedSqlError(
                _FRONTIER_DTYPE_MSG.format(dt=f.dataType)
            )

    def batch_frontier(it):
        for pdf in it:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("u", ascending=asc1)
            run = pdf["v"].cummin() if take_min2 else pdf["v"].cummax()
            keep = run.ne(run.shift())
            yield pd.DataFrame({"u": pdf["u"][keep], "v": run[keep]})

    rows = reduced.mapInPandas(batch_frontier, schema).take(cap + 1)
    if len(rows) > cap:
        raise UnsupportedSqlError(
            "keyless 2-comparison frontier exceeds the "
            f"{cap}-point inline cap"
        )
    pts = sorted(((r["u"], r["v"]) for r in rows), reverse=not asc1)
    merged: list[tuple] = []
    best = None
    for u, v in pts:
        if best is None or (v < best if take_min2 else v > best):
            best = v
            merged.append((u, v))
    return merged, schema["u"].dataType, schema["v"].dataType


def frontier_one_row_df(spark, merged, u_type, v_type):
    """Materialize a folded frontier as a ONE-ROW DataFrame with a
    single ``__pts: array<struct<u,v>>`` column, suitable for a
    broadcast crossJoin (executor path) or a registered one-row view
    (OR-flag path). An empty frontier yields an empty array — F.exists
    over it is FALSE, exactly the empty-set fold."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(
                "__pts",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("u", u_type),
                            T.StructField("v", v_type),
                        ]
                    )
                ),
                False,
            )
        ]
    )
    return spark.createDataFrame([(merged,)], schema)

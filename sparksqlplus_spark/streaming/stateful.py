"""Custom stateful streaming operator: per-key EWMA via
``applyInPandasWithState``.

Engine extension (nothing to mirror in the reference — SURVEY §2.4).
Demonstrates the pattern for operators the built-in windowed
aggregations can't express: recursive per-event state (an
exponentially-weighted moving average needs the previous value per
event, not a window aggregate).

Batch and stream forms share `_ewma_series`, so tests can assert
bounded-stream == batch equality. State per key is O(1) (last ewma +
count) — bounded memory at any scale; keys partition across executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

STATE_SCHEMA = "last_ewma double, n long"


def _ewma_series(
    values: pd.Series, alpha: float, seed: float | None, round_to: int | None = 9
) -> list[float]:
    out = []
    cur = seed
    for v in values:
        cur = v if cur is None else alpha * v + (1 - alpha) * cur
        out.append(cur if round_to is None else round(cur, round_to))
    return out


def ewma_batch(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    round_to: int | None = 9,
    max_rows_per_key: int = 5_000_000,
) -> DataFrame:
    """Batch form: per-key EWMA over events ordered by (ts, event_id).

    Exact sequential recursion (bit-identical to the stream form), but
    ``groupBy().applyInPandas`` materializes EVERY event of a key in one
    pandas frame — a hot key at 100 TB is an executor OOM. At scale use
    :func:`ewma_batch_scalable` (windowed closed form, no per-key
    materialization) or the stream form (bounded per micro-batch).

    ``max_rows_per_key`` is the guard on that foot-gun: any key group
    larger than the bound fails fast inside the pandas kernel (before
    the sort, while the batch is still one Arrow buffer) with a message
    pointing at the scalable form, instead of grinding toward an
    executor OOM. The check is per-task — no extra Spark job.
    """

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if max_rows_per_key <= 0:
        raise ValueError("max_rows_per_key must be positive")

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_rows_per_key:
            raise ValueError(
                f"ewma_batch: key group of {len(pdf)} rows exceeds "
                f"max_rows_per_key={max_rows_per_key}; use "
                "ewma_batch_scalable (windowed closed form) for hot keys"
            )
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma"] = _ewma_series(pdf["value"], alpha, None, round_to)
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        df.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandas(per_key, OUT_SCHEMA)
    )


def ewma_batch_scalable(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    chunk: int = 1024,
    round_to: int | None = 9,
) -> DataFrame:
    """Scale-safe batch EWMA: pure windowed expressions, no per-key
    pandas materialization — a billion-event hot key costs one sort,
    not one executor's heap.

    The recursion e_t = α·v_t + (1-α)·e_{t-1} (seeded with the first
    value) unrolls to a scaled cumulative sum. Directly, the scale
    factor (1-α)^{-t} overflows past t ≈ 700, so rows are CHUNKED per
    key: within a chunk (pos < ``chunk``) the closed form is exact in
    expression space; across chunks the carried seed is
    Σ_d L_{k-d}·(1-α)^{chunk·(d-1)} over chunk-final locals L, truncated
    once the decay factor underflows — the dropped terms are below
    double resolution of the result, so agreement with the exact
    recursion is within float ulps (assert with tolerance, not
    equality).
    """
    import math

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    q = 1.0 - alpha
    if q == 0.0:
        # alpha == 1: e_t = v_t, no recursion to unroll
        return df.select(
            key_col,
            "event_id",
            "ts",
            "value",
            (
                F.round(F.col("value"), round_to)
                if round_to is not None
                else F.col("value").cast("double")
            ).alias("ewma"),
        )
    # within-chunk rescale is (1-α)^(-pos): cap the chunk so
    # (1-α)^(-(chunk-1)) stays finite in a double (10^308) with margin
    # — for α ≥ ~0.5 the default 1024 would overflow to inf/NaN
    chunk = max(2, min(chunk, int(300.0 / max(-math.log10(q), 1e-12))))
    # lag depth: stop once q^(chunk·(d-1)) can no longer move the sum
    depth = max(1, min(64, math.ceil(70.0 / max(chunk * -math.log10(q), 1e-12))))

    base = df.select(key_col, "event_id", "ts", "value")
    w = Window.partitionBy(key_col).orderBy("ts", "event_id")
    base = base.withColumn("__rn", F.row_number().over(w) - F.lit(1))
    base = base.withColumn("__chunk", (F.col("__rn") / chunk).cast("long"))
    base = base.withColumn("__pos", F.col("__rn") % chunk)

    # within-chunk closed form: local_t = Σ_{i≤t} w_i v_i (1-α)^{pos_t-pos_i}
    wgt = F.when(F.col("__rn") == 0, F.lit(1.0)).otherwise(F.lit(alpha))
    u = wgt * F.col("value") * F.pow(F.lit(q), -F.col("__pos"))
    cw = (
        Window.partitionBy(key_col, "__chunk")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn(
        "__local", F.sum(u).over(cw) * F.pow(F.lit(q), F.col("__pos"))
    )

    # chunk summaries: the local value at each chunk's last row
    summaries = base.groupBy(key_col, "__chunk").agg(
        F.max_by("__local", "__pos").alias("__L")
    )
    sw = Window.partitionBy(key_col).orderBy("__chunk")
    carry = F.lit(0.0)
    for d in range(1, depth + 1):
        decay = q ** (chunk * (d - 1))
        if decay == 0.0:
            break
        carry = carry + F.coalesce(F.lag("__L", d).over(sw), F.lit(0.0)) * F.lit(decay)
    summaries = summaries.select(key_col, "__chunk", carry.alias("__carry"))

    out = base.join(summaries, [key_col, "__chunk"], "inner")
    ewma = F.col("__local") + F.col("__carry") * F.pow(F.lit(q), F.col("__pos") + 1)
    if round_to is not None:
        ewma = F.round(ewma, round_to)
    return out.select(key_col, "event_id", "ts", "value", ewma.alias("ewma"))


def ewma_stream(
    stream: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    watermark: str = "1 hour",
    round_to: int | None = 9,
) -> DataFrame:
    """Streaming form: arbitrary per-key state via applyInPandasWithState.

    State = (last ewma, event count); each micro-batch folds its events
    (ordered by event time) into the carried state. Per-key memory is
    bounded by the micro-batch size, never by the key's history — this
    is the scale-safe form of the exact recursion (``ewma_batch``
    materializes whole keys and exists as the test comparator).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last, n = state.get if state.exists else (None, 0)
        events = pd.concat(list(batches), ignore_index=True)
        events = events.sort_values(["ts", "event_id"])
        events["ewma"] = _ewma_series(events["value"], alpha, last, round_to)
        last = float(events["ewma"].iloc[-1]) if len(events) else last
        n += len(events)
        state.update((last, n))
        yield events[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        stream.withWatermark("ts", watermark)
        .select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: bounded-state SpaceSaving per hash bucket
# ---------------------------------------------------------------------------

HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("key", T.LongType()),
        T.StructField("est", T.LongType()),
        T.StructField("err", T.LongType()),
        T.StructField("n_total", T.LongType()),
    ]
)

HH_STATE_SCHEMA = (
    "keys array<bigint>, counts array<bigint>, errs array<bigint>, n long"
)


def _space_saving_insert(
    summary: dict[int, tuple[int, int]], key: int, c: int, capacity: int
) -> None:
    """Fold ``c`` occurrences of ``key`` into a SpaceSaving summary
    (key -> (count, err)). Batched form of the classic per-item insert:
    present keys accumulate, free slots open exact, otherwise the
    minimum-count slot is evicted and charged as the new key's error.
    Invariants: true <= est <= true + err; min count <= N/capacity."""
    if key in summary:
        cnt, err = summary[key]
        summary[key] = (cnt + c, err)
    elif len(summary) < capacity:
        summary[key] = (c, 0)
    else:
        kmin = min(summary, key=lambda k: (summary[k][0], k))
        cmin = summary[kmin][0]
        del summary[kmin]
        summary[key] = (cmin + c, cmin)


def heavy_hitters_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    n_buckets: int = 8,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state — the stream form of
    operators/frequency.py's batch count-min prune.

    Keys hash into ``n_buckets`` state groups; each group carries a
    SpaceSaving summary of ``capacity`` slots (Metwally et al. 2005 —
    mergeable, deterministic, and unlike count-min it stores the
    candidate KEYS, so no second pass over the data is needed). Each
    micro-batch folds its per-key counts in descending-count order
    (key tiebreak) into the carried summary and emits the bucket's
    full snapshot stamped with n_total, so the LAST snapshot per
    bucket (max n_total) is the final answer.

    Guarantees per bucket with N items seen: every key with true
    count > N/capacity is present, and true <= est <= true + err with
    err <= N/capacity. State is O(n_buckets * capacity) at ANY input
    size — the whole point vs. a per-key running count, whose state
    grows with key cardinality.

    ``ts_col`` names the event-time column used for the watermark
    (default ``ts``). NULL keys are dropped before bucketing — a NULL
    cannot be a heavy-hitter candidate (pmod/xxhash of NULL is NULL,
    which would otherwise route to a phantom bucket).
    """
    if capacity <= 0 or n_buckets <= 0:
        raise ValueError("capacity and n_buckets must be positive")

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, errs, n = state.get
            summary = {
                int(k): (int(c), int(e))
                for k, c, e in zip(keys, counts, errs)
            }
        else:
            summary, n = {}, 0
        events = pd.concat(list(batches), ignore_index=True)
        batch_counts = events.groupby("__key").size()
        n += int(batch_counts.sum())
        for k, c in sorted(
            batch_counts.items(), key=lambda kv: (-kv[1], kv[0])
        ):
            _space_saving_insert(summary, int(k), int(c), capacity)
        ks = sorted(summary)
        state.update(
            (
                [int(k) for k in ks],
                [int(summary[k][0]) for k in ks],
                [int(summary[k][1]) for k in ks],
                int(n),
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(ks),
                "key": ks,
                "est": [summary[k][0] for k in ks],
                "err": [summary[k][1] for k in ks],
                "n_total": [n] * len(ks),
            }
        )

    keyed = (
        stream.withWatermark(ts_col, watermark)
        .filter(F.col(key_col).isNotNull())
        .select(
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
            .cast("int")
            .alias("__bucket"),
            F.col(key_col).cast("long").alias("__key"),
            F.col(ts_col).alias("ts"),
        )
    )
    return keyed.groupBy("__bucket").applyInPandasWithState(
        fold,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

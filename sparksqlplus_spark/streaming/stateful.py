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

from pyspark.sql import DataFrame
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


def _ewma_series(values: pd.Series, alpha: float, seed: float | None) -> list[float]:
    out = []
    cur = seed
    for v in values:
        cur = v if cur is None else alpha * v + (1 - alpha) * cur
        out.append(round(cur, 9))
    return out


def ewma_batch(
    df: DataFrame, alpha: float = 0.3, key_col: str = "user_id"
) -> DataFrame:
    """Batch form: per-key EWMA over events ordered by (ts, event_id)."""

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma"] = _ewma_series(pdf["value"], alpha, None)
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        df.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandas(per_key, OUT_SCHEMA)
    )


def ewma_stream(
    stream: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form: arbitrary per-key state via applyInPandasWithState.

    State = (last ewma, event count); each micro-batch folds its events
    (ordered by event time) into the carried state.
    """

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last, n = state.get if state.exists else (None, 0)
        events = pd.concat(list(batches), ignore_index=True)
        events = events.sort_values(["ts", "event_id"])
        events["ewma"] = _ewma_series(events["value"], alpha, last)
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

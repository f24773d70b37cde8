"""Event-time windowing operators — batch and Structured Streaming.

Engine extension: the reference has no streaming surface at all
(SURVEY §2.4 — zero watermarks/windows/stateful ops). Every operator
here comes in two flavors with identical semantics:

- a *batch* form (DataFrame in, DataFrame out) that a SQL oracle can
  replicate — the correctness gate;
- a *streaming* form (``readStream`` → watermark → windowed state) —
  the scale path: incremental state, late-data handling, no
  full-table reprocessing.

Batch/stream agreement is asserted in tests via the availableNow
trigger (process the whole table as a bounded stream, compare with the
batch result).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparksqlplus_spark.expr_memo import expr_cache


# ---------------------------------------------------------------------------
# batch forms (oracle-checkable)
# ---------------------------------------------------------------------------


@expr_cache
def _tumbling_frags(ts_col: str, key_col: str, minutes: int, value_col: str):
    """:func:`tumbling_agg`'s Column fragments (memoized per argument
    tuple — guide §1.2/§4 driver-side construction, round 18)."""
    return (
        F.window(F.col(ts_col), f"{minutes} minutes").alias("w"),
        F.col(key_col),
        (F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value")),
        F.col("w.start").alias("window_start"),
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    minutes: int = 5,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window aggregate (count + sum per window/key)."""
    w, key, aggs, win_start = _tumbling_frags(ts_col, key_col, minutes, value_col)
    return (
        df.groupBy(w, key)
        .agg(*aggs)
        .select(win_start, key_col, "n_events", "sum_value")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    length_minutes: int = 10,
    slide_minutes: int = 5,
    value_col: str = "value",
) -> DataFrame:
    """Sliding (hopping) event-time windows; each event lands in
    length/slide windows."""
    w = F.window(F.col(ts_col), f"{length_minutes} minutes", f"{slide_minutes} minutes")
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


@expr_cache
def _session_frags(ts_col: str, key_col: str, gap_minutes: int, value_col: str):
    """:func:`session_agg_batch`'s Column fragments (memoized per
    argument tuple — guide §1.2/§4 driver-side construction, round 18)."""
    order = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag(F.col(ts_col)).over(order)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = F.sum("__new").over(
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    aggs = (
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )
    return new_session, sess, aggs


def session_agg_batch(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Session windows, batch form: classic gaps-and-islands.

    A new session starts when the gap to the previous event of the same
    key exceeds gap_minutes; sessions aggregate count/sum/bounds.
    Matches Spark's ``session_window`` semantics for batch data.
    """
    new_session, sess, aggs = _session_frags(
        ts_col, key_col, gap_minutes, value_col
    )
    return (
        df.withColumn("__new", new_session)
        .withColumn("__sess", sess)
        .groupBy(key_col, "__sess")
        .agg(*aggs)
        .select(key_col, "session_start", "session_end", "n_events", "sum_value")
    )


def dedup_first_per_key(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Keep the earliest event per key (deterministic tie-break).

    Batch equivalent of streaming dropDuplicates-within-watermark when
    the watermark spans the whole table.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# streaming forms
# ---------------------------------------------------------------------------


def events_stream(
    spark: SparkSession, events_path: str, ts_col: str = "ts"
) -> DataFrame:
    """Bounded file stream over an events parquet file/dir.

    Handles TIMESTAMP(NANOS) parquet (read as long, converted).
    """
    import os

    static = spark.read.parquet(events_path)
    reader = spark.readStream.schema(static.schema)
    if os.path.isfile(events_path):
        # file-source streams need a directory — stream the parent dir but
        # match ONLY this exact file (a prefix glob like events*.parquet
        # would silently pull sibling files into the stream)
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path) or "."
    stream = reader.parquet(events_path)
    for f in static.schema.fields:
        if f.name == ts_col and f.dataType.simpleString() == "bigint":
            stream = stream.withColumn(
                ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
            )
        elif f.name == ts_col and f.dataType.simpleString() == "timestamp_ntz":
            # testdata parquet stores ts as TIMESTAMP_MICROS with
            # isAdjustedToUTC=0, which Spark reads as TIMESTAMP_NTZ —
            # withWatermark requires TIMESTAMP. The cast is only
            # wall-clock-preserving under a UTC session timezone; raise
            # rather than silently mutating the caller's shared session
            # config (round-5 advice — a conf.set here would change
            # timestamp semantics for every other query in the session).
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
                raise ValueError(
                    f"events_stream needs a UTC session timezone to cast "
                    f"TIMESTAMP_NTZ '{ts_col}' wall-clock-preservingly; the "
                    f"session has {tz!r}. Use get_spark() (which sets UTC) "
                    f"or set spark.sql.session.timeZone=UTC yourself."
                )
            stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def tumbling_agg_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    minutes: int = 5,
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling window aggregate with a watermark: state is
    dropped once event time passes window end + watermark — bounded
    memory at any input scale."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{minutes} minutes").alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def session_agg_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows via ``session_window`` (state merges
    adjacent events until the gap exceeds gap_minutes)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("sw"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming dedup: first event per key within the watermark horizon
    (dropDuplicatesWithinWatermark — state expires with the watermark)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
    left_cols: tuple[str, ...] = ("event_id", "ts"),
    right_cols: tuple[str, ...] = ("event_id", "ts"),
) -> DataFrame:
    """Stream-stream (or batch) interval inner join: pair each left
    event with right events for the SAME key whose timestamp falls in
    [left.ts, left.ts + within] — the click→purchase attribution
    shape. Works identically on batch and streaming frames; on streams
    BOTH sides get event-time watermarks and the time-range condition
    is what lets Spark bound the join state (rows older than
    watermark + within are evicted) — an unbounded-state stream-stream
    join is rejected by Spark, so the range bound is the scalability
    contract, not an optimization. Output columns are prefixed l_/r_.
    """
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(ts_col, watermark)
    if r.isStreaming:
        r = r.withWatermark(ts_col, watermark)
    lsel = l.select(
        F.col(key_col).alias("l_key"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
    )
    rsel = r.select(
        F.col(key_col).alias("r_key"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lsel.join(rsel, cond, "inner").drop("r_key")


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain a bounded stream (availableNow) into an in-memory table and
    return it as a DataFrame. Test/demo helper."""
    df, _ = run_stream_to_memory_counted(stream_df, name, output_mode)
    return df


def run_stream_to_memory_counted(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> tuple[DataFrame, int]:
    """:func:`run_stream_to_memory` plus the number of non-empty
    micro-batches the drain used — the probe that proves a stateful
    operator's cross-batch state carry actually ran (a single-batch
    drain never exercises it).

    Counting caveat: ``recentProgress`` retains only the last
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100)
    progress updates, so on a drain longer than that the count is a
    LOWER bound. Fine for every current caller — they assert
    ``n_batches >= 2`` — use a StreamingQueryListener if an exact
    count over a long drain is ever needed."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if p.numInputRows > 0)
    return stream_df.sparkSession.table(name), n_batches


def slice_to_files(
    df: DataFrame,
    path: str,
    n_slices: int = 3,
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> None:
    """Re-write a bounded table as ``n_slices`` event-time-ordered
    parquet slice directories (slice_0 earliest, written first), so a
    file-source stream over ``path/slice_*`` with maxFilesPerTrigger=1
    and the default latestFirst=false replays them as consecutive
    micro-batches in global event-time order. Multi-batch test harness
    for stateful operators — the single-partition ntile sort is a
    harness cost, not an operator (real deployments already receive
    time-ordered micro-batches from their source)."""
    import os

    from pyspark.sql import Window

    sliced = df.withColumn(
        "__slice",
        F.ntile(n_slices).over(Window.orderBy(ts_col, order_col)) - 1,
    )
    for i in range(n_slices):
        (
            sliced.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(path, f"slice_{i}"))
        )


def stream_from_slices(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over :func:`slice_to_files` output, admitting
    ``max_files_per_trigger`` file(s) per micro-batch (honored by the
    availableNow trigger's admission control)."""
    import os

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(os.path.join(path, "slice_*"))
    )

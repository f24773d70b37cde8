"""Streaming operators: batch/stream agreement + batch-vs-DuckDB oracle."""

import pytest
from pyspark.sql import functions as F

from sparksqlplus_spark.streaming.windows import (
    dedup_first_per_key,
    dedup_stream,
    events_stream,
    run_stream_to_memory,
    session_agg_batch,
    session_agg_stream,
    tumbling_agg,
    tumbling_agg_stream,
)
from tests.conftest import SF_DIR
from tests.helpers import assert_matches

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def events(engine):
    return engine.catalog.get("events").df


def test_tumbling_batch_oracle(events, oracle):
    df = tumbling_agg(events, minutes=5)
    assert_matches(
        df,
        oracle,
        """SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP) AS window_start,
                  event_type, COUNT(*) AS n_events, SUM(value) AS sum_value
           FROM events GROUP BY 1, 2""",
    )


def test_sliding_batch_oracle(events, oracle):
    from sparksqlplus_spark.streaming.windows import sliding_agg

    df = sliding_agg(events, length_minutes=10, slide_minutes=5)
    assert_matches(
        df,
        oracle,
        """WITH hops AS (
             SELECT e.*, CAST(to_timestamp(floor(epoch(ts) / 300) * 300 - o) AS TIMESTAMP) AS window_start
             FROM events e, UNNEST([0, 300]) AS t(o)
             WHERE epoch(ts) < floor(epoch(ts) / 300) * 300 - o + 600)
           SELECT window_start, event_type, COUNT(*) AS n_events, SUM(value) AS sum_value
           FROM hops GROUP BY 1, 2""",
    )


def test_session_batch_oracle(events, oracle):
    df = session_agg_batch(events, gap_minutes=30)
    assert_matches(
        df,
        oracle,
        """WITH marked AS (
             SELECT user_id, ts, value, event_id,
                    CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           sess AS (
             SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
             FROM marked)
           SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                  COUNT(*) AS n_events, SUM(value) AS sum_value
           FROM sess GROUP BY user_id, sid""",
    )


def test_dedup_first_oracle(events, oracle):
    df = dedup_first_per_key(events, ["user_id", "event_type"]).select(
        "event_id", "user_id", "event_type", "ts"
    )
    assert_matches(
        df,
        oracle,
        """SELECT event_id, user_id, event_type, ts FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS rn
             FROM events) WHERE rn = 1""",
    )


def test_tumbling_stream_matches_batch(spark, events):
    stream = events_stream(spark, EVENTS)
    got = run_stream_to_memory(
        tumbling_agg_stream(stream, minutes=5, watermark="10 minutes"),
        "t_tumbling",
        output_mode="complete",
    )
    want = tumbling_agg(events, minutes=5)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_session_stream_matches_batch(spark, events):
    stream = events_stream(spark, EVENTS)
    got = run_stream_to_memory(
        session_agg_stream(stream, gap_minutes=30, watermark="2 hours"),
        "t_session",
        output_mode="complete",
    )
    want = session_agg_batch(events, gap_minutes=30).select(
        "user_id", "session_start", "n_events", "sum_value"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_dedup_stream_bounded_state(spark, events):
    """dropDuplicatesWithinWatermark keeps one row per key among rows
    whose event times fall within the watermark horizon — with a
    horizon wider than the data, that's exactly one row per key."""
    stream = events_stream(spark, EVENTS)
    got = run_stream_to_memory(
        dedup_stream(stream, ["user_id", "event_type"], watermark="60 days"),
        "t_dedup",
    )
    want_keys = events.select("user_id", "event_type").distinct()
    assert got.select("user_id", "event_type").distinct().count() == want_keys.count()
    assert got.count() == want_keys.count()


def test_ewma_stream_matches_batch(spark, events):
    """Custom stateful op (applyInPandasWithState): bounded stream must
    reproduce the batch per-key EWMA exactly."""
    from sparksqlplus_spark.streaming.stateful import ewma_batch, ewma_stream

    stream = events_stream(spark, EVENTS)
    got = run_stream_to_memory(ewma_stream(stream, alpha=0.3), "t_ewma")
    want = ewma_batch(events, alpha=0.3)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ewma_stream_unrounded_bit_identical(spark, events):
    """The driver-entry configuration (round_to=None, one-batch drain):
    the stream fold must be BIT-identical to the exact recursion — this
    is what lets events_ewma_stateful hash-match the recursive-CTE
    oracle while the primary result flows through the bounded
    applyInPandasWithState form (round-3 verdict #1)."""
    from sparksqlplus_spark.streaming.stateful import ewma_batch, ewma_stream

    stream = events_stream(spark, EVENTS)
    got = run_stream_to_memory(
        ewma_stream(stream, alpha=0.3, round_to=None), "t_ewma_unrounded"
    )
    want = ewma_batch(events, alpha=0.3, round_to=None)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ewma_multibatch_state_carry_bit_identical(spark, events, tmp_path):
    """Round-4 verdict item 7: the stateful fold drained across >= 2
    micro-batches (time-ordered slice files, maxFilesPerTrigger=1) must
    carry state between batches and still be BIT-identical to the exact
    batch recursion — the driver entry events_ewma_multibatch runs this
    same path against the recursive-CTE oracle."""
    from pyspark.sql import functions as F

    from sparksqlplus_spark.streaming.stateful import ewma_batch, ewma_stream
    from sparksqlplus_spark.streaming.windows import (
        run_stream_to_memory_counted,
        slice_to_files,
        stream_from_slices,
    )

    src = events.select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    path = str(tmp_path / "slices")
    slice_to_files(src, path, n_slices=3)
    stream = stream_from_slices(spark, path, src.schema)
    got, n_batches = run_stream_to_memory_counted(
        ewma_stream(stream, alpha=0.3, round_to=None), "t_ewma_multibatch"
    )
    assert n_batches >= 2  # the state-carry path genuinely ran
    want = ewma_batch(events, alpha=0.3, round_to=None).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ewma_scalable_matches_exact(events):
    """Windowed closed-form EWMA (the 100 TB path — no per-key pandas
    materialization) agrees with the exact recursion to float ulps."""
    from sparksqlplus_spark.streaming.stateful import ewma_batch, ewma_batch_scalable

    exact = {
        (r.user_id, r.event_id): r.ewma for r in ewma_batch(events, alpha=0.3).collect()
    }
    scal = ewma_batch_scalable(events, alpha=0.3, chunk=16).collect()  # small chunk => cross-chunk carry exercised
    assert len(scal) == len(exact)
    for r in scal:
        assert abs(r.ewma - exact[(r.user_id, r.event_id)]) < 1e-6, (r.user_id, r.event_id)


def test_ewma_scalable_small_alpha_deep_carry(events):
    """Small alpha means slow decay — the carry must look back several
    chunks (depth formula), not just one."""
    from sparksqlplus_spark.streaming.stateful import ewma_batch, ewma_batch_scalable

    exact = {
        (r.user_id, r.event_id): r.ewma for r in ewma_batch(events, alpha=0.05).collect()
    }
    scal = ewma_batch_scalable(events, alpha=0.05, chunk=8).collect()
    for r in scal:
        assert abs(r.ewma - exact[(r.user_id, r.event_id)]) < 1e-6, (r.user_id, r.event_id)


def test_ewma_batch_hot_key_guard(events):
    """The per-key materialization foot-gun is guarded: a key group
    over max_rows_per_key fails fast with a message directing to
    ewma_batch_scalable, instead of grinding toward an executor OOM."""
    import pytest

    from sparksqlplus_spark.streaming.stateful import ewma_batch

    with pytest.raises(Exception, match="ewma_batch_scalable"):
        ewma_batch(events, alpha=0.3, max_rows_per_key=3).collect()
    # bound respected => identical to the unguarded result
    n = ewma_batch(events, alpha=0.3).count()
    assert ewma_batch(events, alpha=0.3, max_rows_per_key=10**9).count() == n
    with pytest.raises(ValueError):
        ewma_batch(events, alpha=0.3, max_rows_per_key=0)


def test_sinks_roundtrip(engine, tmp_path):
    """Batch writers + streaming file sink + foreachBatch custom sink
    (sparksqlplus_spark.io): written data reads back identical, and the
    streamed window aggregate equals its batch form."""
    from sparksqlplus_spark import io as eio
    from sparksqlplus_spark.streaming.windows import (
        events_stream,
        tumbling_agg,
        tumbling_agg_stream,
    )

    spark = engine.spark
    ev = engine.catalog.get("events").df.select("event_id", "user_id", "ts", "value")

    # batch parquet roundtrip (+ partitioning)
    p = str(tmp_path / "batch_parquet")
    eio.write_table(ev.withColumn("part", ev.user_id % 4), p, partition_by=["part"])
    back = eio.read_back(spark, p).select(*ev.columns)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0

    # batch JSONL roundtrip (the raw-corpus interchange format;
    # write_table passes any format through)
    j = str(tmp_path / "batch_jsonl")
    smallj = ev.select("event_id", "user_id").limit(100)
    eio.write_table(smallj, j, fmt="json")
    back_json = eio.read_back(spark, j, fmt="json", schema=smallj.schema)
    assert back_json.count() == 100
    assert back_json.exceptAll(smallj).count() == 0

    # batch CSV roundtrip (headerless — the reference's input format)
    c = str(tmp_path / "batch_csv")
    small = ev.select("event_id", "user_id").limit(100)
    eio.write_table(small, c, fmt="csv")
    back_csv = eio.read_back(spark, c, fmt="csv", schema=small.schema)
    assert back_csv.count() == 100

    # streaming file sink: windowed agg drains exactly-once to parquet
    stream = events_stream(spark, f"{SF_DIR}/events.parquet")
    agg_stream = tumbling_agg_stream(stream, minutes=5)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    eio.stream_to_files(agg_stream, out, ckpt)
    streamed = spark.read.parquet(out)
    batch = tumbling_agg(engine.catalog.get("events").df, minutes=5)
    cols = sorted(set(streamed.columns) & set(batch.columns))
    # file sinks are append-mode: a window is emitted once the watermark
    # passes its end, so windows still open at end-of-stream stay
    # unemitted — every streamed row must match batch exactly, and the
    # only batch rows missing are those inside the final watermark tail
    assert streamed.select(*cols).exceptAll(batch.select(*cols)).count() == 0
    missing = batch.select(*cols).exceptAll(streamed.select(*cols))
    import pyspark.sql.functions as F

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    late = missing.filter(
        F.col("window_start") < F.lit(max_ts) - F.expr("INTERVAL 15 MINUTES")
    )
    assert late.count() == 0, late.collect()

    # foreachBatch custom sink: per-batch callback sees every row once
    seen = {"rows": 0, "batches": 0}

    def collect(batch_df, batch_id):
        seen["rows"] += batch_df.count()
        seen["batches"] += 1

    eio.stream_foreach_batch(
        events_stream(spark, f"{SF_DIR}/events.parquet"), collect,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    assert seen["rows"] == ev.count()
    assert seen["batches"] >= 1


def test_interval_join_batch_oracle(events, oracle):
    """Batch interval join (click->purchase attribution within 10 min)
    matches the DuckDB time-range join exactly."""
    from sparksqlplus_spark.streaming.windows import interval_join

    got = interval_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        within="10 minutes",
    )
    assert_matches(
        got,
        oracle,
        """SELECT l.user_id AS l_key, l.event_id AS l_event_id,
                  l.ts AS l_ts, r.event_id AS r_event_id, r.ts AS r_ts
           FROM events l, events r
           WHERE l.event_type = 'click' AND r.event_type = 'purchase'
             AND l.user_id = r.user_id
             AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE""",
    )


def test_interval_join_stream_matches_batch(spark, events):
    """Stream-stream interval join with watermarks on both sides: the
    availableNow drain over the file stream must equal the batch form
    row for row (the time-range bound is what lets Spark evict state)."""
    from sparksqlplus_spark.streaming.windows import interval_join

    s = events_stream(spark, EVENTS)
    got = run_stream_to_memory(
        interval_join(
            s.filter(F.col("event_type") == "click"),
            s.filter(F.col("event_type") == "purchase"),
            within="10 minutes",
            watermark="30 minutes",
        ),
        "t_ivjoin",
    )
    want = interval_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        within="10 minutes",
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_asof_stream_matches_batch(spark, events):
    """Streaming as-of join (applyInPandasWithState, O(1) state per
    key): the bounded time-ordered stream must reproduce the batch
    asof_join exactly — clicks matched to the latest preceding
    purchase per user."""
    from pyspark.sql import functions as F

    from sparksqlplus_spark.operators.asof import asof_join, asof_stream
    from sparksqlplus_spark.streaming.windows import (
        events_stream,
        run_stream_to_memory,
    )

    def sides(ev):
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        buys = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("buy_event"),
            F.col("value").alias("buy_value"),
        )
        return clicks, buys

    want = asof_join(*sides(events), "ts", "ts", by=["user_id"])
    stream = events_stream(spark, EVENTS)
    got = run_stream_to_memory(
        asof_stream(*sides(stream), "ts", "ts", by=["user_id"]),
        "t_asof",
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_asof_stream_multibatch_state_carry(spark, events, tmp_path):
    """The as-of fold drained across >= 2 time-ordered micro-batches:
    a purchase seen in batch N must match clicks in batch N+1 through
    the carried O(1) state, reproducing the batch asof_join exactly."""
    from pyspark.sql import functions as F

    from sparksqlplus_spark.operators.asof import asof_join, asof_stream
    from sparksqlplus_spark.streaming.windows import (
        run_stream_to_memory_counted,
        slice_to_files,
        stream_from_slices,
    )

    src = events.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    path = str(tmp_path / "asof_slices")
    slice_to_files(src, path, n_slices=3)
    stream = stream_from_slices(spark, path, src.schema)

    def sides(ev):
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        buys = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("buy_event")
        )
        return clicks, buys

    got, n_batches = run_stream_to_memory_counted(
        asof_stream(*sides(stream), "ts", "ts", by=["user_id"]),
        "t_asof_multibatch",
    )
    assert n_batches >= 2
    want = asof_join(*sides(src), "ts", "ts", by=["user_id"])
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_asof_stream_null_payload_row_atomic(spark, tmp_path):
    """NULL right-payload fields must carry atomically through the
    streaming fold and across micro-batch state — the round-8 bug
    ffilled each payload column independently, mixing values from
    different right rows (and the per-column state seed had the same
    hole). Rights (t=5, x=NULL, y='A') then (t=8, x=99, y=NULL), left
    at t=10 must get (99, NULL) even when the rights land in an
    EARLIER micro-batch than the left."""
    import datetime

    from pyspark.sql import functions as F

    from sparksqlplus_spark.operators.asof import asof_join, asof_stream
    from sparksqlplus_spark.streaming.windows import (
        run_stream_to_memory_counted,
        slice_to_files,
        stream_from_slices,
    )

    def t(m):
        return datetime.datetime(2026, 1, 1, 0, m)

    src = spark.createDataFrame(
        [
            # (user, ts, side, x, y): side L rows have NULL payloads
            (1, t(5), "R", None, "A"),
            (1, t(6), "L", None, None),
            (1, t(8), "R", 99, None),
            (1, t(10), "L", None, None),
            (2, t(3), "R", None, None),   # all-NULL right row still matches
            (2, t(4), "L", None, None),
            (3, t(9), "L", None, None),   # no rights for this key
        ],
        "user_id int, ts timestamp, side string, x int, y string",
    )
    path = str(tmp_path / "asof_null_slices")
    slice_to_files(src, path, n_slices=3, order_col="user_id")
    stream = stream_from_slices(spark, path, src.schema)

    def sides(ev):
        lefts = ev.filter(F.col("side") == "L").select("user_id", "ts")
        rights = ev.filter(F.col("side") == "R").select(
            "user_id", "ts", "x", "y"
        )
        return lefts, rights

    got, n_batches = run_stream_to_memory_counted(
        asof_stream(*sides(stream), "ts", "ts", by=["user_id"]),
        "t_asof_nullpay",
    )
    assert n_batches >= 2
    rows = {(r["user_id"], r["ts"].minute): (r["x_r"], r["y_r"])
            for r in got.collect()}
    assert rows[(1, 6)] == (None, "A")
    assert rows[(1, 10)] == (99, None)   # not (99, 'A')
    assert rows[(2, 4)] == (None, None)
    assert rows[(3, 9)] == (None, None)
    want = asof_join(*sides(src), "ts", "ts", by=["user_id"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_heavy_hitters_stream_bounded_state(spark, tmp_path):
    """Streaming SpaceSaving heavy hitters (round 11,
    applyInPandasWithState with ARRAY state): a multi-batch drain over
    planted skew must surface every true-heavy key with
    true <= est <= true + err and err <= n_total/capacity, while state
    stays at capacity slots per bucket regardless of key cardinality."""
    from pyspark.sql import functions as F

    from sparksqlplus_spark.streaming.stateful import heavy_hitters_stream
    from sparksqlplus_spark.streaming.windows import (
        run_stream_to_memory_counted,
        slice_to_files,
        stream_from_slices,
    )

    # planted skew: keys 1..3 heavy (1200/900/600 rows), 400 light keys
    # with 1-3 rows each; deterministic timestamps
    rows = []
    eid = 0
    for k, c in [(1, 1200), (2, 900), (3, 600)]:
        for _ in range(c):
            rows.append((eid, k)); eid += 1
    for k in range(100, 500):
        for _ in range(1 + k % 3):
            rows.append((eid, k)); eid += 1
    src = (
        spark.createDataFrame(rows, "event_id long, user_id long")
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id")))
        .select("user_id", "event_id", "ts")
    )
    path = str(tmp_path / "hh_slices")
    slice_to_files(src, path, n_slices=3)
    stream = stream_from_slices(spark, path, src.schema)
    capacity, n_buckets = 32, 4
    got, n_batches = run_stream_to_memory_counted(
        heavy_hitters_stream(
            stream, key_col="user_id", capacity=capacity, n_buckets=n_buckets
        ),
        "t_hh_stream",
    )
    assert n_batches >= 2  # cross-batch state carry genuinely ran
    # final snapshot per bucket = rows at that bucket's max n_total
    import pandas as pd

    pdf = got.toPandas()
    finals = []
    for b, grp in pdf.groupby("bucket"):
        finals.append(grp[grp["n_total"] == grp["n_total"].max()])
    final = pd.concat(finals, ignore_index=True)
    # bounded state: at most `capacity` slots per bucket survived
    assert final.groupby("bucket").size().max() <= capacity
    exact = {
        r["user_id"]: r["count"]
        for r in src.groupBy("user_id").count().collect()
    }
    bucket_totals = final.groupby("bucket")["n_total"].max().to_dict()
    est = {int(r.key): (int(r.est), int(r.err), int(r.bucket))
           for r in final.itertuples()}
    # every true-heavy key (count > its bucket's N/capacity) survives
    from pyspark.sql.functions import xxhash64

    bucket_of = {
        r["user_id"]: r["b"]
        for r in src.select("user_id")
        .distinct()
        .withColumn("b", F.pmod(xxhash64(F.col("user_id")), F.lit(n_buckets)).cast("int"))
        .collect()
    }
    for k in (1, 2, 3):
        b = bucket_of[k]
        assert exact[k] > bucket_totals[b] / capacity
        assert k in est, f"heavy key {k} missing from final snapshot"
    # estimate bounds for EVERY surviving key; err <= N_bucket/capacity
    for k, (e, err, b) in est.items():
        true = exact[k]
        assert true <= e <= true + err, (k, true, e, err)
        assert err <= bucket_totals[b] / capacity + 1e-9

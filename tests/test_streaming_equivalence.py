"""Replay-to-batch equivalence for the streaming sessionizer.

The strongest evidence a custom stateful streaming operator is
correct: replay REAL data (the driver's events table) through it in
event-time-ordered micro-batches and require the emitted sessions to
equal a batch sessionization of the same rows computed with plain
DataFrame window functions (the same logic the oracle-checked
``events_sessions`` query uses). This closes the gap the SQL oracle
can't cover — DuckDB can't run a Structured Streaming query.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from flycatcher_spark.streaming import timeout_sessions

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP_S = 1800
N_ROWS = 900  # first N events by time — 3 micro-batches of 300 (sf0.001 has 1000)


def _events(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(EVENTS)
    if raw.schema["ts"].dataType.simpleString() == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return (
        raw.select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        )
        .orderBy("ts", "user_id", "value")
        .limit(N_ROWS)
    )


def _batch_sessions(df):
    """Reference sessionization: lag-gap boundaries + running session
    index, grouped to (start_ms, end_ms, n, total) per session."""
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "value")
    new_sess = (
        (ms - F.lag(ms).over(w)).isNull()
        | ((ms - F.lag(ms).over(w)) > GAP_S * 1000)
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("__new", new_sess)
        .withColumn("__sess", F.sum("__new").over(run))
        .groupBy("user_id", "__sess")
        .agg(
            F.min(ms).alias("session_start_ms"),
            F.max(ms).alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("__sess")
    )


def test_stream_replay_matches_batch_sessionization(spark, tmp_path):
    events = _events(spark).cache()
    n = events.count()
    assert n == N_ROWS

    # Replay in 3 event-time-ordered chunks so the watermark advances
    # monotonically (out-of-order files would drop late rows and the
    # comparison would be vacuous).
    chunks = [
        events.orderBy("ts", "user_id", "value").limit((i + 1) * 300)
        for i in range(3)
    ]
    src = str(tmp_path / "replay")
    chunks[0].coalesce(1).write.mode("append").parquet(src)

    sdf = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(src)
    out = timeout_sessions(
        sdf,
        key_cols=["user_id"],
        ts_col="ts",
        value_col="value",
        gap_seconds=GAP_S,
        watermark_delay="1 second",
    )
    name = f"replay_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for i in (1, 2):
            # append only the rows not yet streamed
            chunks[i].exceptAll(chunks[i - 1]).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()

        # Flush: two far-future sentinel batches push the watermark
        # past every open session's deadline, then deliver the fired
        # timeouts to the sink.
        far = events.agg(
            F.max(F.col("ts")).alias("m")
        ).first()["m"]
        for bump in (1, 2):
            spark.createDataFrame(
                [(-1, far, 0.0)],
                "user_id bigint, ts timestamp, value double",
            ).withColumn(
                "ts",
                F.col("ts")
                + F.expr(f"INTERVAL {GAP_S * 2 * bump} SECONDS"),
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()

        got = {
            (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events,
             round(r.total_value, 6))
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r.user_id != -1
        }
    finally:
        q.stop()

    want = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events,
         round(r.total_value, 6))
        for r in _batch_sessions(events).collect()
    }
    assert got == want
    assert len(want) > 50  # real corpus: many users, many sessions

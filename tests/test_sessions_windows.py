"""Sessionization + windowed aggregation tests: batch session_window vs
hand-computed sessions, tumbling counts batch/stream parity, and the
applyInPandasWithState running-total operator across micro-batches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.operators.sessions import sessionize, tumbling_counts


def _ts(minute):
    return dt.datetime(2024, 5, 1, 12, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, _ts(0), "a", 1.0),
        (1, _ts(10), "a", 2.0),   # same session (gap 10 < 30)
        (1, _ts(50), "b", 3.0),   # new session (gap 40)
        (2, _ts(5), "a", 4.0),    # single-event session
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type", "value"])


def test_sessionize_gap_semantics(spark, ev):
    out = {
        (r.user_id, r.session_start.minute): (r.session_end.minute, r.n_events)
        for r in sessionize(ev, gap="30 minutes").collect()
    }
    assert out == {
        (1, 0): (10, 2),   # events at :00 and :10 chain; end = last event
        (1, 50): (50, 1),
        (2, 5): (5, 1),
    }


def test_tumbling_counts_batch(spark, ev):
    out = {
        (r.event_type, r.window_start.hour): r.n_events
        for r in tumbling_counts(ev, width="1 hour").collect()
    }
    assert out == {("a", 12): 3, ("b", 12): 1}


def test_tumbling_stream_matches_batch(spark, ev, tmp_path):
    """§2.9 windows: the same tumbling expression over a file stream
    (availableNow + watermark) must equal the batch result.

    Append mode only emits a window once the watermark passes its end,
    and the watermark advances at micro-batch boundaries — so the
    12:xx windows are finalized by a later-event file processed in a
    second availableNow pass (exactly how late-closing windows flush in
    production)."""
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ev.coalesce(1).write.mode("overwrite").json(str(src / "batch1"))

    def run_pass():
        stream = (
            spark.readStream.schema(ev.schema)
            .json(str(src) + "/*")
            .withWatermark("ts", "1 minute")
        )
        q = (
            tumbling_counts(stream, width="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_pass()
    # Sentinel event two hours later pushes the watermark past 13:00.
    sentinel = ev.limit(1).select(
        "user_id", (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("ts"),
        "event_type", "value",
    )
    sentinel.coalesce(1).write.mode("overwrite").json(str(src / "batch2"))
    run_pass()

    got = {
        (r.event_type, r.window_start.hour): r.n_events
        for r in spark.read.parquet(out).collect()
        if r.window_start.hour == 12
    }
    want = {
        (r.event_type, r.window_start.hour): r.n_events
        for r in tumbling_counts(ev, width="1 hour").collect()
    }
    assert got == want


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches —
    two availableNow passes over incrementally arriving files."""
    from pyspark.sql import types as T

    from scalable_etl_spark.streaming.stateful import running_user_totals

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_pass():
        # update-mode stateful output through foreachBatch -> parquet
        # append: file sinks reject update mode directly, and the memory
        # sink cannot recover from a checkpoint — foreachBatch is the
        # durable-sink pattern for stateful operators.
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda batch_df, _id: batch_df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "b1.jsonl").write_text(
        '{"user_id": 1, "value": 10.0}\n{"user_id": 1, "value": 5.0}\n'
        '{"user_id": 2, "value": 1.0}\n'
    )
    run_pass()
    (src / "b2.jsonl").write_text('{"user_id": 1, "value": 2.5}\n')
    run_pass()

    # Latest emission per user reflects lifetime totals — pass 2 only
    # saw one user-1 event, so n_events=3 proves state was restored
    # from the checkpoint, not recomputed from the batch.
    latest = {}
    for r in spark.read.parquet(out).collect():
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest == {1: (3, 17.5), 2: (1, 1.0)}


def test_streaming_enriched_counts_matches_batch(spark):
    """Stream-static join drain equals the equivalent batch join."""
    from scalable_etl_spark.queries_streaming import streaming_enriched_counts
    from scalable_etl_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r.c_mktsegment: (r.n_events, r.total_value)
        for r in streaming_enriched_counts(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 40)
    dim = load_table(spark, sf, "customer")
    exp = {
        r.c_mktsegment: (r.n_events, r.total_value)
        for r in ev.join(dim, ev["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == exp

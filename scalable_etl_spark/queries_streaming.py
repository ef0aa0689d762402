"""Graded streaming queries.

Each query materializes a real streaming execution (file source ->
watermark -> windowed aggregation -> availableNow drain) over data
derived deterministically from the testdata tables, then returns the
result as a DataFrame. Where the drained result is deterministic batch
SQL (complete-mode tumbling counts), the query carries a full DuckDB
oracle; batch-parity is additionally proven in
tests/test_sessions_windows.py and test_streaming_ingest.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sessions import tumbling_counts
from .registry import query
from .tables import load_table


@query(
    "streaming_event_counts",
    oracle="""
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           COUNT(*) AS n_events
    FROM events WHERE user_id < 40
    GROUP BY 1, 2
    """,
)
def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts per event_type computed BY A STREAM: the
    events table is spooled to JSON files, read back through
    ``readStream`` with a watermark, aggregated with the same
    ``tumbling_counts`` expression the batch path uses, and drained with
    ``availableNow`` into a complete-mode sink.

    The drained result IS SQL-expressible: complete-mode output with an
    availableNow drain counts every spooled row exactly once, and 1-hour
    tumbling windows are epoch-aligned, so ``window.start`` equals
    ``date_trunc('hour', ts)`` — the oracle replays the aggregation as
    plain batch SQL and the value hash must match bit-for-bit."""
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "ts", "event_type")
    )
    ev.coalesce(4).write.mode("overwrite").json(src)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .json(src)
        .withWatermark("ts", "1 minute")
    )
    agg = tumbling_counts(stream, ts_col="ts", key_col="event_type")
    qname = "streaming_event_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname).select("event_type", "window_start", "n_events")

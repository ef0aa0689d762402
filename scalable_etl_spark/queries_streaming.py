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

# State-store task count is pinned by spark.sql.shuffle.partitions at the
# FIRST micro-batch and written into the checkpoint. These drains produce
# tiny keyed state (tens-hundreds of keys), so 32 state-store tasks per
# batch is pure scheduling overhead — and with applyInPandasWithState it
# is 32 Python workers per batch, which made streaming_stateful_totals
# hypersensitive to box contention (BENCH_r04). On a real cluster the
# same knob would be sized to keyspace/executor count, not defaulted.
_STREAM_SHUFFLE_PARTITIONS = "8"


def _drain_to_df(spark: SparkSession, writer_df: DataFrame, qname: str,
                 ckpt: str, output_mode: str) -> DataFrame:
    """Drain a streaming aggregation into a memory sink with availableNow,
    return the drained result, and clean up.

    WARNING — TEST-HARNESS HELPER, NOT A PRODUCTION PATTERN. The
    ``memory`` sink materializes the ENTIRE result on the driver; it
    exists so the correctness gate can hash a drained stream's final
    state (tiny keyed aggregates here, by construction). A production
    stream writes to parquet / a snapshot table
    (``acid.write_stream_snapshot``, ``ingest.start_bronze_ingest``) —
    never copy this helper into a pipeline, where an unbounded result
    would OOM the driver.

    The memory-sink temp view is dropped before returning: ``spark.table``
    analyzes eagerly, so the returned DataFrame keeps its resolved plan
    over the (driver-resident) sink while the catalog stays free of
    leftover temp views (they crashed SHOW TABLES-driven introspection,
    see sinks.describe_tables)."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            writer_df.writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(qname)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    spark.catalog.dropTempView(qname)
    return out


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
    out = _drain_to_df(
        spark, agg, "streaming_event_counts_sink", ckpt, "complete"
    )
    return out.select("event_type", "window_start", "n_events")


@query(
    "streaming_stateful_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events WHERE user_id < 30 GROUP BY 1
    """,
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator under the gate:
    ``applyInPandasWithState`` running per-user totals
    (streaming/stateful.py), drained with ``maxFilesPerTrigger=1`` so
    the state genuinely carries across MULTIPLE micro-batches. Update
    mode emits a row per user per batch; the final state is the row
    with the highest n_events (monotone per user), and that lifetime
    total must equal the plain batch aggregation — which is exactly
    what the oracle computes."""
    from .streaming.stateful import running_user_totals

    src = tempfile.mkdtemp(prefix="state_src_")
    ckpt = tempfile.mkdtemp(prefix="state_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "value")
    )
    ev.coalesce(2).write.mode("overwrite").json(src)

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    totals = running_user_totals(stream)
    drained = _drain_to_df(
        spark, totals, "streaming_stateful_totals_sink", ckpt, "update"
    )
    final = (
        drained
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
    )
    return final.select(
        "user_id",
        F.col("m.n_events").alias("n_events"),
        F.round(F.col("m.total_value"), 2).alias("total_value"),
    )


@query(
    "streaming_sliding_counts",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE user_id < 40),
    w AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts)
               - k.k * INTERVAL '15 minutes' AS window_start
      FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
    SELECT event_type, window_start, COUNT(*) AS n_events
    FROM w GROUP BY 1, 2
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window streaming counts (1 h window, 15 min slide): every
    event lands in 4 overlapping windows. Same spool -> readStream ->
    watermark -> complete-mode drain protocol as the tumbling query;
    sliding windows are also epoch-aligned, so window_start enumerates
    as time_bucket(15 min, ts) - k*15 min for k in 0..3 — fully
    SQL-expressible, full value-hash oracle."""
    src = tempfile.mkdtemp(prefix="slide_src_")
    ckpt = tempfile.mkdtemp(prefix="slide_ckpt_")
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
    agg = (
        stream.groupBy(
            F.col("event_type"),
            F.window(F.col("ts"), "1 hour", "15 minutes"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.col("window.start").alias("window_start"),
            "n_events",
        )
    )
    return _drain_to_df(
        spark, agg, "streaming_sliding_counts_sink", ckpt, "complete"
    )


@query(
    "streaming_enriched_counts",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE user_id < 40
    GROUP BY 1
    """,
)
def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the event stream is enriched against the
    static customer dimension mid-flight, then aggregated per market
    segment — the standard streaming-ETL enrichment shape (facts arrive
    continuously, dims are slowly-changing tables).

    Scale shape: Spark broadcasts the static side into every micro-batch
    task (re-planned per batch, so dim refreshes are picked up) — the
    unbounded stream side is never shuffled before the join; only the
    5-row segment aggregate shuffles. Same spool -> readStream ->
    availableNow drain protocol as the other streaming queries; the
    drained complete-mode result is plain batch SQL, full value-hash
    oracle."""
    src = tempfile.mkdtemp(prefix="enrich_src_")
    ckpt = tempfile.mkdtemp(prefix="enrich_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "user_id", "value")
    )
    ev.coalesce(4).write.mode("overwrite").json(src)

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream = spark.readStream.schema(
        "event_id BIGINT, user_id BIGINT, value DOUBLE"
    ).json(src)
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return _drain_to_df(
        spark, agg, "streaming_enriched_counts_sink", ckpt, "complete"
    )

"""Graded streaming queries.

Each query materializes a real streaming execution (file source ->
watermark -> windowed aggregation -> availableNow drain) over data
derived deterministically from the testdata tables, then returns the
result as a DataFrame. As of round 10 EVERY query drains through the
PRODUCTION sink — ``acid.write_stream_snapshot`` via
``_drain_to_table`` (complete/update/append modes under the per-query
txn batch ledger) — never a memory sink. Where the drained result is
deterministic batch SQL (complete-mode tumbling counts), the query
carries a full DuckDB oracle; batch-parity is additionally proven in
tests/test_sessions_windows.py and test_streaming_ingest.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.vectors import multi_table_buckets_sql
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

# JSON spool timestamp format preserving MICROSECONDS: Spark's default
# JSON timestampFormat truncates to milliseconds, which is invisible to
# the hour-aligned window queries but corrupts any query whose output
# carries raw event times (session starts, join-matched timestamps).
_MICROS_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _drain_to_table(
    spark: SparkSession,
    agg: DataFrame,
    query_id: str,
    ckpt: str,
    output_mode: str = "complete",
    merge_on: tuple[str, ...] = (),
) -> DataFrame:
    """availableNow drain through the PRODUCTION sink (round 10,
    verdict #6): micro-batches commit via
    ``acid.write_stream_snapshot`` under the per-query txn batch
    ledger — "complete" replaces the table per batch, "update" MERGEs
    changed keys on ``merge_on``, "append" accumulates — and the
    returned DataFrame reads the COMMITTED snapshot table. One
    protocol, one place — as of round 10 EVERY streaming query
    drains through here (or calls ``write_stream_snapshot``
    directly); the memory sink is fully retired from the corpus. The
    drain runs at ``_STREAM_SHUFFLE_PARTITIONS``: tiny keyed
    micro-batch aggregates on full-width shuffles are pure task
    overhead."""
    import shutil

    from .acid import SnapshotTable, write_stream_snapshot

    tbl = tempfile.mkdtemp(prefix=f"{query_id}_tbl_")
    shutil.rmtree(tbl)  # SnapshotTable owns the dir; start absent
    t = SnapshotTable(spark, tbl)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS
    )
    try:
        q = write_stream_snapshot(
            agg, t, ckpt, query_id=query_id,
            output_mode=output_mode, merge_on=merge_on,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return t.read()


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
    plain batch SQL and the value hash must match bit-for-bit.

    Round 10 (verdict #6): drains through the PRODUCTION sink —
    ``_drain_to_table`` commits each complete-mode batch as a
    whole-table replace under the per-query txn batch ledger; the
    final aggregate reads the COMMITTED snapshot table."""
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "ts", "event_type")
    )
    # repartition (NOT coalesce) before every spool write in this
    # module: coalesce(n) collapses the UPSTREAM parquet scan to n
    # tasks (it erases the stage boundary, guide §2.4/§6), so spooling
    # a small filtered slice was paying a near-serial scan of the whole
    # events table. The round-robin exchange moves only the spooled
    # rows and keeps the scan at full parallelism; file count (and the
    # single availableNow batch) is unchanged.
    ev.repartition(4).write.mode("overwrite").json(src)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .json(src)
        .withWatermark("ts", "1 minute")
    )
    agg = tumbling_counts(stream, ts_col="ts", key_col="event_type")
    out = _drain_to_table(spark, agg, "event_counts_sink", ckpt)
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
    mode emits a row per user per batch; round 10 drains it through
    the PRODUCTION update-mode sink — each batch's changed users
    MERGE into an ACID table on user_id under the txn batch ledger
    (the Delta foreachBatch-upsert pattern), so the table holds
    exactly the LATEST row per user, and the per-user totals are
    monotone, so that latest row IS the lifetime total the oracle's
    plain batch aggregation computes."""
    from .streaming.stateful import running_user_totals

    src = tempfile.mkdtemp(prefix="state_src_")
    ckpt = tempfile.mkdtemp(prefix="state_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "value")
    )
    ev.repartition(2).write.mode("overwrite").json(src)

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    totals = running_user_totals(stream)
    out = _drain_to_table(
        spark, totals, "stateful_totals_sink", ckpt,
        output_mode="update", merge_on=("user_id",),
    )
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("total_value"), 2).alias("total_value"),
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
    SQL-expressible, full value-hash oracle. Round 10: drains through
    the production complete-mode ACID sink (``_drain_to_table``);
    oracle unchanged."""
    src = tempfile.mkdtemp(prefix="slide_src_")
    ckpt = tempfile.mkdtemp(prefix="slide_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "ts", "event_type")
    )
    # repartition (NOT coalesce) before every spool write in this
    # module: coalesce(n) collapses the UPSTREAM parquet scan to n
    # tasks (it erases the stage boundary, guide §2.4/§6), so spooling
    # a small filtered slice was paying a near-serial scan of the whole
    # events table. The round-robin exchange moves only the spooled
    # rows and keeps the scan at full parallelism; file count (and the
    # single availableNow batch) is unchanged.
    ev.repartition(4).write.mode("overwrite").json(src)

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
    return _drain_to_table(spark, agg, "sliding_counts_sink", ckpt)


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
    oracle. Round 10: drains through the production complete-mode ACID
    sink (``_drain_to_table``); oracle unchanged."""
    src = tempfile.mkdtemp(prefix="enrich_src_")
    ckpt = tempfile.mkdtemp(prefix="enrich_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "user_id", "value")
    )
    ev.repartition(4).write.mode("overwrite").json(src)

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
    return _drain_to_table(spark, agg, "enriched_counts_sink", ckpt)


@query(
    "streaming_session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, ts FROM events WHERE user_id < 20),
    x AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION windows computed BY A STREAM (§2.9 beyond tumbling/
    sliding): ``F.session_window(ts, gap)`` merges events closer than
    the 2-hour gap into dynamic, data-driven windows — the streaming
    state machine handles window GROWTH and MERGE as events arrive,
    which fixed windows never exercise. Complete-mode availableNow
    drain emits the final merged sessions.

    Session semantics are batch-replayable: a session breaks exactly
    when the time to the previous event is >= gap (Spark merges while
    next_start < prev_end with end = ts + gap), so the oracle's
    LAG/cumulative-sum sessionization produces the identical
    (user, session_start = first event ts, n_events) rows and the
    value hash must match bit-for-bit.

    Scale: state is one in-flight session per user key (bounded by the
    key domain, reclaimed on emit); the shuffle is on user_id — the
    same single-exchange shape as the batch sessionizer
    (operators/sessions.py)."""
    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts")
    )
    # session_start is a RAW event time in the output (unlike the
    # hour-aligned fixed windows), so the spool must round-trip
    # microseconds — the default JSON timestamp format truncates to
    # millis and the value hash would diverge from the oracle.
    ev.repartition(4).write.mode("overwrite").option(
        "timestampFormat", _MICROS_TS_FMT
    ).json(src)

    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src)
        .withWatermark("ts", "1 minute")
    )
    agg = stream.groupBy(
        F.session_window("ts", "2 hours").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = _drain_to_table(
        spark, agg, "session_windows_sink", ckpt
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        "n_events",
    )


@query(
    "streaming_stream_join",
    oracle="""
    WITH v AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'view' AND user_id < 10),
    p AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 10)
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MIN(p.ts) AS first_purchase
    FROM v JOIN p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
    GROUP BY 1
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (§2.9 beyond stream-static
    enrichment): two independent file-source streams — views and
    purchases — joined on user within a 24-hour attribution window,
    BOTH sides watermarked so the state store can discard a buffered
    view once no future purchase can match it (the published
    stream-stream join design: watermark + time-range condition =>
    bounded state; without the range the state grows forever).

    Inner stream-stream joins emit each matched pair exactly once, so
    an availableNow drain's output equals the batch interval join —
    the oracle — row for row; the drained pairs are then aggregated
    per user (batch agg AFTER the drain, keeping the streaming query
    single-stateful-operator).

    Scale: state is per-user buffered events inside the watermark
    horizon; the join shuffles both sides on user_id — the same
    equi-key exchange a batch join uses, plus state cleanup driven by
    the 24h+1m watermark delta."""
    src_v = tempfile.mkdtemp(prefix="ssj_v_")
    src_p = tempfile.mkdtemp(prefix="ssj_p_")
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    # microsecond-preserving spool: first_purchase is a raw event time
    ev.filter(F.col("event_type") == "view").select("user_id", "ts") \
        .repartition(2).write.mode("overwrite") \
        .option("timestampFormat", _MICROS_TS_FMT).json(src_v)
    ev.filter(F.col("event_type") == "purchase").select("user_id", "ts") \
        .repartition(2).write.mode("overwrite") \
        .option("timestampFormat", _MICROS_TS_FMT).json(src_p)

    views = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src_v)
        .withWatermark("ts", "1 minute")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    )
    purchases = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src_p)
        .withWatermark("ts", "25 hours")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    pairs = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 24 HOURS"
        ),
    )
    drained = _drain_to_table(
        spark, pairs, "stream_join_sink", ckpt, output_mode="append"
    )
    return drained.groupBy(F.col("v_user").alias("user_id")).agg(
        F.count("*").alias("n_pairs"),
        F.min("p_ts").alias("first_purchase"),
    )


@query(
    "streaming_dedup_counts",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events
    FROM events WHERE user_id < 25
    GROUP BY 1
    """,
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARKED STREAM DEDUP under the gate (§2.9's remaining
    concern; production path streaming/ingest.py dedup_in_stream): the
    spool is written TWICE (every event is a duplicate pair), the
    stream drops duplicates on event_id via
    ``dropDuplicatesWithinWatermark`` — the operator whose state the
    watermark ACTUALLY reclaims (plain ``dropDuplicates`` on a
    non-event-time subset keeps one state entry per key forever, even
    under a watermark — the 100 TB leak dedup_content_hash's caveats
    describe). Each duplicate is admitted exactly once provided its
    copies arrive within the watermark delay of each other — true here
    by construction (copies carry identical event times) and the
    contract real ingest duplicates (retries, re-delivered files)
    satisfy. The per-type aggregation runs batch-side AFTER the drain
    (keeping the streaming query single-stateful-operator); the oracle
    is the plain COUNT(DISTINCT) the dedup must reproduce.

    Round 9 (verdict #5): drains through the PRODUCTION sink — the
    deduped rows land in an on-disk ACID snapshot table via
    ``acid.write_stream_snapshot`` (foreachBatch + per-query txn batch
    ledger), generalizing the pattern ``streaming_snapshot_sink``
    proved beyond one query. The final aggregate reads the COMMITTED
    table, never driver memory."""
    import shutil

    from .acid import SnapshotTable, write_stream_snapshot

    src = tempfile.mkdtemp(prefix="sdedup_src_")
    ckpt = tempfile.mkdtemp(prefix="sdedup_ckpt_")
    tbl = tempfile.mkdtemp(prefix="sdedup_tbl_")
    shutil.rmtree(tbl)  # SnapshotTable owns the dir; start absent
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 25)
        .select("event_id", "ts", "event_type")
    )
    ev.unionAll(ev).repartition(4).write.mode("overwrite").json(src)

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, event_type STRING"
        )
        .json(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    t = SnapshotTable(spark, tbl)
    q = write_stream_snapshot(
        stream, t, ckpt, query_id="dedup_counts_sink"
    )
    q.awaitTermination()
    return t.read().groupBy("event_type").agg(
        F.count("*").alias("n_events")
    )


@query(
    "streaming_join_windowed",
    oracle="""
    WITH v AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'view' AND user_id < 10),
    p AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 10),
    pairs AS (
      SELECT v.user_id, p.ts AS p_ts
      FROM v JOIN p
        ON p.user_id = v.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR),
    wm AS (
      SELECT LEAST((SELECT MAX(ts) FROM v), (SELECT MAX(ts) FROM p))
             - INTERVAL 1 MINUTE - INTERVAL 24 HOUR AS w)
    SELECT CAST(date_trunc('day', p_ts) AS TIMESTAMP) AS window_start,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY 1, 2
    HAVING window_start + INTERVAL 1 DAY <= (SELECT w FROM wm)
    """,
)
def streaming_join_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED STATEFUL OPERATORS in one streaming query (supported
    since Spark 3.4): a watermarked stream-stream interval join feeding
    a tumbling-window aggregation — two state stores in one pipeline,
    no intermediate sink. This is the production spelling the separate
    drain-then-batch-agg queries approximate.

    Emission semantics, made oracle-exact: append mode emits only
    windows FINALIZED by the watermark the AGGREGATION sees — which is
    the global input watermark (min(max view ts, max purchase ts) -
    1 minute; multipleWatermarkPolicy = min) DELAYED a further 24 hours
    by the upstream join: a joined row's p_ts can trail the view-side
    watermark by up to the time-range span, so Spark propagates
    watermark - 24h downstream (verified empirically: the emitted set
    cuts off exactly one extra day). The oracle's HAVING clause encodes
    precisely that bound; the trailing (unfinalized) windows are
    withheld by DESIGN on both sides of the comparison.

    Scale: join state retention is derived from the time-range
    condition (views persist only while a future purchase could still
    match), agg state is one row per open (window, user) — both
    bounded by watermarks; the two exchanges are both on user keys."""
    src_v = tempfile.mkdtemp(prefix="sjw_v_")
    src_p = tempfile.mkdtemp(prefix="sjw_p_")
    ckpt = tempfile.mkdtemp(prefix="sjw_ckpt_")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    ev.filter(F.col("event_type") == "view").select("user_id", "ts") \
        .repartition(2).write.mode("overwrite") \
        .option("timestampFormat", _MICROS_TS_FMT).json(src_v)
    ev.filter(F.col("event_type") == "purchase").select("user_id", "ts") \
        .repartition(2).write.mode("overwrite") \
        .option("timestampFormat", _MICROS_TS_FMT).json(src_p)

    views = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src_v)
        .withWatermark("ts", "1 minute")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    )
    purchases = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src_p)
        .withWatermark("ts", "1 minute")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    pairs = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 24 HOURS"
        ),
    )
    agg = pairs.groupBy(
        F.window("p_ts", "1 day").alias("w"),
        F.col("v_user").alias("user_id"),
    ).agg(F.count("*").alias("n_pairs"))
    out = _drain_to_table(
        spark, agg, "join_windowed_sink", ckpt, output_mode="append"
    )
    return out.select(
        F.col("w.start").alias("window_start"), "user_id", "n_pairs"
    )


@query(
    "streaming_snapshot_sink",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_cents
    FROM events
    WHERE user_id < 40 AND value >= 10
    GROUP BY 1
    """,
)
def streaming_snapshot_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION streaming sink spelling, graded end-to-end: a file
    stream is drained through ``acid.write_stream_snapshot`` —
    ``foreachBatch`` appending into an ACID snapshot table with a
    per-query batch-id ledger (the published Delta ``txn`` idempotent-
    sink pattern; reference anchor: the continuous ingest loop,
    ingest_job.py:200-213) — the first query graded through this sink,
    and since round 10 the protocol every graded stream drains
    through. After the first drain the
    CHECKPOINT IS DELETED and the stream re-drained: Structured
    Streaming replays every micro-batch from scratch, and the ledger
    must skip each one (``batch_id <= txn[query_id]``), so the value
    hash doubles as an exactly-once proof — one duplicated batch would
    change every aggregate. The final read comes from the committed
    snapshot table on disk, never from driver memory."""
    import shutil

    from .acid import SnapshotTable, write_stream_snapshot

    src = tempfile.mkdtemp(prefix="stream_snap_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_snap_ckpt_")
    tbl = tempfile.mkdtemp(prefix="stream_snap_tbl_")
    shutil.rmtree(tbl)  # SnapshotTable owns the dir; start absent
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "user_id", "event_type", "value")
    )
    ev.repartition(4).write.mode("overwrite").json(src)

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, user_id BIGINT, event_type STRING, "
            "value DOUBLE"
        )
        .json(src)
        .filter(F.col("value") >= 10)  # row-level silver transform
    )
    t = SnapshotTable(spark, tbl)
    q = write_stream_snapshot(
        stream, t, ckpt, query_id="graded_sink", stats_cols=["value"]
    )
    q.awaitTermination()
    # Worst-case crash recovery: checkpoint lost entirely -> every
    # batch replays -> the manifest txn ledger must skip them all.
    shutil.rmtree(ckpt)
    q = write_stream_snapshot(stream, t, ckpt, query_id="graded_sink")
    q.awaitTermination()
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr(
                "CAST(ROUND(SUM(value) * 100, 0) AS BIGINT)"
            ).alias("value_cents"),
        )
    )


@query(
    "streaming_outer_join",
    oracle="""
    WITH v AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'view' AND user_id < 10),
    p AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 10)
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(p.ts) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN p.ts IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched_views
    FROM v LEFT JOIN p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
    GROUP BY 1
    """,
)
def streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join — the semantically hard
    variant: an unmatched view can only be emitted (with nulls) once
    the GLOBAL watermark proves no future purchase can ever match it,
    i.e. has passed ``v_ts + 24h``. An availableNow drain would
    otherwise never finalize the tail of the data (the watermark stops
    at max_ts - delay), silently swallowing the last day of unmatched
    views — so both spools carry a far-future SENTINEL row that pushes
    the final watermark beyond every legitimate view's finalization
    bound, and sentinels are filtered from the drained output. The
    oracle is the plain batch LEFT JOIN: matched pairs must agree AND
    every unmatched view must surface exactly once with a null — a
    drain that loses (or double-emits) null rows fails the value hash.

    Scale: same bounded per-user state as the inner join (watermark +
    time-range condition); the null-emission path adds no state, only
    eviction-time output."""
    import datetime

    src_v = tempfile.mkdtemp(prefix="soj_v_")
    src_p = tempfile.mkdtemp(prefix="soj_p_")
    ckpt = tempfile.mkdtemp(prefix="soj_ckpt_")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts + datetime.timedelta(days=40))],
        "user_id BIGINT, ts TIMESTAMP",
    )
    ev.filter(F.col("event_type") == "view").select("user_id", "ts") \
        .unionByName(sentinel).repartition(2).write.mode("overwrite") \
        .option("timestampFormat", _MICROS_TS_FMT).json(src_v)
    ev.filter(F.col("event_type") == "purchase").select("user_id", "ts") \
        .unionByName(sentinel).repartition(2).write.mode("overwrite") \
        .option("timestampFormat", _MICROS_TS_FMT).json(src_p)

    views = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src_v)
        .withWatermark("ts", "1 minute")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    )
    purchases = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("timestampFormat", _MICROS_TS_FMT)
        .json(src_p)
        .withWatermark("ts", "25 hours")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 24 HOURS"
        ),
        "leftOuter",
    )
    drained = _drain_to_table(
        spark, joined, "outer_join_sink", ckpt, output_mode="append"
    )
    return (
        drained.filter(F.col("v_user") >= 0)  # drop watermark sentinels
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count("p_ts").alias("n_matched"),
            F.sum(
                F.when(F.col("p_ts").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_unmatched_views"),
        )
    )


@query(
    "streaming_cdf_dedup",
    oracle="""
    WITH u AS (
      SELECT text, doc_id, lang, n_chars, 1 AS b
      FROM documents WHERE text IS NOT NULL AND doc_id % 10 <= 5
      UNION ALL
      SELECT text, doc_id, lang, n_chars, 2 AS b
      FROM documents WHERE text IS NOT NULL
        AND doc_id % 10 BETWEEN 4 AND 7
    ),
    batch_rep AS (
      SELECT b, text,
             ARG_MIN(lang, doc_id) AS lang,
             ARG_MIN(n_chars, doc_id) AS n_chars
      FROM u GROUP BY b, text
    ),
    final AS (
      SELECT text, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY b DESC)
                 AS rn
      FROM batch_rep
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM final WHERE rn = 1
    GROUP BY lang
    """,
)
def streaming_cdf_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus dedup fed by a streaming CHANGE DATA FEED
    (round-11, verdict #5): instead of re-reading the corpus per
    refresh (the batch ``incremental_corpus_dedup`` shape), a
    Structured Streaming query consumes the corpus table's COMMIT LOG
    through the first-class ``snapshot_changes`` source
    (streaming/cdf.py — PySpark Python Data Source API; offsets are
    commit versions, checkpointed by Spark, so a restart resumes
    exactly after the last processed commit) and applies each commit's
    rows as a MERGE into the dedup table IN COMMIT ORDER (grouping on
    ``_commit_version`` inside foreachBatch — the deterministic
    CDC-apply pattern, independent of micro-batch packing). The merge
    rides the txn ledger (``txn_update={qid: version}``, monotonic),
    so a replayed batch after checkpoint recovery no-ops — end-to-end
    exactly-once from commit log to dedup table.

    Two overlapping crawl batches land in the corpus (re-crawled URLs:
    doc_id%10 in 0..5, then 4..7, each pre-reduced to one
    min-doc_id representative per content fingerprint); the stream
    upserts them by fp, so the LATEST crawl's representative wins for
    re-crawled content — Delta CDF's "apply changes" recipe.

    At 100 TB: the consumer touches only the dirs each commit added
    (never rescans the corpus), offset planning is O(dirs-per-commit)
    manifest metadata, file reads are executor-side Arrow batches, and
    the MERGE prunes untouched dirs by fp range stats.

    Reference anchor: the ledger-driven incremental ingest
    (reference src/jobs/ingest_job.py:59-88) is exactly
    "process-only-what-changed"; this is its table-level dual."""
    import shutil

    from .acid import SnapshotTable
    from .streaming.cdf import SnapshotChangesSource

    spark.dataSource.register(SnapshotChangesSource)
    corpus_dir = tempfile.mkdtemp(prefix="cdfdedup_corpus_")
    dedup_dir = tempfile.mkdtemp(prefix="cdfdedup_tbl_")
    for d in (corpus_dir, dedup_dir):
        shutil.rmtree(d)  # SnapshotTable owns the dir; start absent
    ckpt = tempfile.mkdtemp(prefix="cdfdedup_ckpt_")

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )

    def crawl(pred):
        return (
            docs.filter(pred)
            .withColumn("fp", F.sha2(F.col("text"), 256))
            .groupBy("fp")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("lang", "doc_id").alias("lang"),
                F.min_by("n_chars", "doc_id").alias("n_chars"),
            )
        )

    mod = F.col("doc_id") % 10
    corpus = SnapshotTable(spark, corpus_dir)
    corpus.append(crawl(mod <= 5), stats_cols=["fp"])
    corpus.append(crawl((mod >= 4) & (mod <= 7)), stats_cols=["fp"])

    dedup = SnapshotTable(spark, dedup_dir)
    qid = "cdf_dedup"

    def apply_changes(b: DataFrame, _batch_id: int) -> None:
        b = b.persist()
        try:
            versions = sorted(
                r[0]
                for r in b.select("_commit_version").distinct().collect()
            )
            for v in versions:
                dedup.merge(
                    b.filter(F.col("_commit_version") == v).drop(
                        "_commit_version"
                    ),
                    ["fp"],
                    txn_update={qid: int(v)},
                )
        finally:
            b.unpersist()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS
    )
    try:
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", corpus_dir)
            .load()
            .writeStream.foreachBatch(apply_changes)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        dedup.read()
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "streaming_constraint_gate",
    oracle="""
    SELECT event_type AS etype, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents,
           1 AS rejected_ok
    FROM events WHERE user_id < 35
    GROUP BY 1
    """,
)
def streaming_constraint_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint enforcement INSIDE the streaming sink, graded
    end-to-end (round 12, verdict #4): a constrained snapshot table
    takes three independent file-stream drains through the production
    ``write_stream_snapshot`` sink. The second drain's micro-batch
    VIOLATES the constraint (values negated): per-micro-batch
    validation (acid.py ``_enforce_constraints`` before the manifest
    commit) fails the STREAM with the ConstraintViolation surfaced
    through Spark's StreamingQueryException, and the table stays at
    its pre-batch version — nothing committed, no orphan dirs, the
    Delta invariant-enforcement contract for streaming writes. The
    valid third drain then lands normally; ``rejected_ok`` pins that
    the violation raised AND versions didn't move, and the value hash
    proves no negated cent ever entered the table. Crash-recovery
    (same checkpoint retried after DROP CONSTRAINT commits the held
    batch exactly once) is pinned in
    tests/test_streaming_ingest.py::test_stream_constraint_*."""
    import shutil

    from .acid import SnapshotTable, write_stream_snapshot

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 35)
        .select("event_id", "user_id", "event_type", "value")
    )
    schema_ddl = (
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE"
    )
    tbl = tempfile.mkdtemp(prefix="cgate_tbl_")
    shutil.rmtree(tbl)  # SnapshotTable owns the dir; start absent
    t = SnapshotTable(spark, tbl)

    def drain(df: DataFrame, leg: str):
        src = tempfile.mkdtemp(prefix=f"cgate_src_{leg}_")
        ckpt = tempfile.mkdtemp(prefix=f"cgate_ckpt_{leg}_")
        df.repartition(2).write.mode("overwrite").json(src)
        q = write_stream_snapshot(
            spark.readStream.schema(schema_ddl).json(src),
            t,
            ckpt,
            query_id=f"cgate_{leg}",
        )
        q.awaitTermination()

    even = F.col("event_id") % 2 == 0
    drain(ev.filter(even), "a")
    t.add_constraint("value_ok", "value >= 0")
    v_before = t.latest_version()
    rejected = 0
    try:
        drain(
            ev.filter(~even).withColumn(
                "value", -F.abs(F.col("value")) - F.lit(1.0)
            ),
            "b",
        )
    except Exception as exc:  # StreamingQueryException wraps it
        if "ConstraintViolation" in str(exc) or "value_ok" in str(exc):
            rejected = 1
        else:
            raise
    rejected_ok = int(rejected == 1 and t.latest_version() == v_before)
    drain(ev.filter(~even), "c")
    return (
        t.read()
        .groupBy(F.col("event_type").alias("etype"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")
            ).cast("long").alias("cents"),
        )
        .withColumn("rejected_ok", F.lit(rejected_ok))
        .select("etype", "n_rows", "cents", "rejected_ok")
    )


@query(
    "streaming_cdf_gold_refresh",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS event_date,
             COUNT(*) AS listen_count,
             COUNT(DISTINCT event_type) AS unique_types
      FROM events GROUP BY 1, 2),
    corrected AS (
      SELECT user_id, event_date,
             listen_count
               + CASE WHEN EXTRACT(DAY FROM event_date) = 10
                      THEN 100 ELSE 0 END AS listen_count,
             unique_types
      FROM daily),
    final AS (
      SELECT * FROM corrected
      WHERE NOT (user_id % 10 = 3
                 AND EXTRACT(DAY FROM event_date) > 2)),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id
               ORDER BY listen_count DESC, event_date ASC) AS rank
      FROM final)
    SELECT user_id, event_date, listen_count, unique_types, rank
    FROM ranked WHERE rank <= 3
    """,
)
def streaming_cdf_gold_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL GOLD REFRESH from silver's change data feed (round
    12, verdicts #2/#6): the reference's daily job recomputes gold
    top-3 from ALL of silver every run (daily_job.py:33-46); here gold
    is maintained incrementally by a stream consuming silver's commit
    log with ``readChangeFeed=true`` — across a REWRITE commit, no
    ignoreChanges re-delivery caveats. Silver (per-user daily counts)
    takes a base load, an append (late days), and then a MERGE
    correction (+100 listens for day-10 rows) committed under
    ``enableChangeDataFeed``, so the stream receives exact
    update_postimage rows for the rewrite — then a DELETE commit
    removes most of one user cohort's days (round-13, verdict #3:
    users shrinking BELOW k must vacate their stale rank rows). Per
    commit version, IN COMMIT ORDER, the consumer derives the
    AFFECTED users from the change rows (insert + update_postimage +
    delete), recomputes ONLY their top-3 from silver AS OF that
    commit (time travel pins the snapshot the commit produced), and
    applies them to gold keyed (user_id, rank) as ONE
    ``merge(delete_where=...)`` — upserts for the fresh top-k rows
    plus tombstones for each affected user's now-vacant ranks —
    under the txn ledger: replay-safe, exactly-once. The oracle is
    the full batch recompute: incremental maintenance must equal it
    bit-for-bit.

    At 100 TB: the stream plans O(dirs-per-commit) metadata and reads
    only each commit's files (for the rewrite, only its _change_data
    row images — proportional to the CORRECTION, not the table); the
    gold recompute touches only affected users via a semi-join (at
    cluster scale the same join prunes silver's dirs by user range
    stats); the reference's alternative rescans silver per refresh."""
    import shutil

    from .acid import SnapshotTable
    from .operators.topk import top_k_per_group
    from .streaming.cdf import SnapshotChangesSource

    spark.dataSource.register(SnapshotChangesSource)
    silver_dir = tempfile.mkdtemp(prefix="cdfgold_silver_")
    gold_dir = tempfile.mkdtemp(prefix="cdfgold_gold_")
    for d in (silver_dir, gold_dir):
        shutil.rmtree(d)  # SnapshotTable owns the dir; start absent
    ckpt = tempfile.mkdtemp(prefix="cdfgold_ckpt_")

    ev = load_table(spark, sf_dir, "events")
    # NOTE (round 18): deliberately NOT persisted, although three
    # silver commits each re-evaluate this aggregate. A persisted
    # frame pins its pre-AQE partitioning (Spark keeps
    # canChangeCachedPlanOutputPartitioning=false), so the overwrite
    # would write shuffle.partitions tiny files per entry and every
    # downstream time-travel read in the refresh loop pays that file
    # count — measured 2x SLOWER end-to-end with the pin (30.3s vs
    # 14.9s medians of 3) than re-running the agg per commit.
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("event_date")
    ).agg(
        F.count("*").alias("listen_count"),
        F.countDistinct("event_type").alias("unique_types"),
    )
    dom = F.dayofmonth("event_date")

    silver = SnapshotTable(spark, silver_dir)
    silver.overwrite(daily.filter(dom <= 15))               # v0 base
    silver.enable_change_data_feed()                        # v1
    silver.append(daily.filter(dom > 15))                   # v2 late days
    silver.merge(                                           # v3 rewrite
        daily.filter(dom == 10).withColumn(
            "listen_count", F.col("listen_count") + F.lit(100)
        ),
        ["user_id", "event_date"],
    )
    silver.delete(                                          # v4 shrink a cohort
        "user_id % 10 = 3 AND dayofmonth(event_date) > 2"
    )

    gold = SnapshotTable(spark, gold_dir)
    # merge(delete_where=...) needs a declared target (genesis gate):
    # create gold empty with the top-k schema before the stream runs
    gold.overwrite(
        spark.createDataFrame(
            [],
            "user_id BIGINT, rank INT, event_date DATE, "
            "listen_count BIGINT, unique_types BIGINT",
        )
    )
    qid = "cdf_gold"

    def refresh(b: DataFrame, _batch_id: int) -> None:
        b = b.persist()
        try:
            versions = sorted(
                r[0]
                for r in b.select("_commit_version").distinct().collect()
            )
            for v in versions:
                # deletes COUNT as affecting: a user whose rows were
                # only removed must recompute (and may vacate ranks)
                affected = (
                    b.filter(
                        (F.col("_commit_version") == v)
                        & F.col("_change_type").isin(
                            "insert", "update_postimage", "delete"
                        )
                    )
                    .select("user_id")
                    .distinct()
                )
                snap = silver.read(int(v)).join(
                    affected, "user_id", "left_semi"
                )
                top3 = top_k_per_group(
                    snap,
                    ["user_id"],
                    [
                        F.col("listen_count").desc(),
                        F.col("event_date").asc(),
                    ],
                    3,
                ).select(
                    "user_id", "rank", "event_date",
                    "listen_count", "unique_types",
                )
                # tombstones: each affected user's ranks 1..3 the new
                # top-k no longer fills (user shrank below k, or
                # vanished entirely) — deleted in the SAME atomic
                # merge via delete_where (APPLY CHANGES shape);
                # unmatched tombstones no-op by merge contract
                vacated = (
                    affected.withColumn(
                        "rank",
                        F.explode(F.sequence(F.lit(1), F.lit(3))),
                    )
                    .join(
                        top3.select("user_id", "rank"),
                        ["user_id", "rank"],
                        "left_anti",
                    )
                    .select(
                        "user_id",
                        "rank",
                        F.lit(None).cast("date").alias("event_date"),
                        F.lit(None).cast("long").alias("listen_count"),
                        F.lit(None).cast("long").alias("unique_types"),
                        F.lit(True).alias("_tomb"),
                    )
                )
                gold.merge(
                    top3.withColumn("_tomb", F.lit(False)).unionByName(
                        vacated
                    ),
                    ["user_id", "rank"],
                    delete_where="_tomb",
                    txn_update={qid: int(v)},
                )
        finally:
            b.unpersist()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS
    )
    try:
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", silver_dir)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.foreachBatch(refresh)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return gold.read().select(
        "user_id", "event_date", "listen_count", "unique_types", "rank"
    )


@query(
    "streaming_cdf_row_id_replica",
    oracle="""
    WITH s2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 6 = 0
                  THEN CASE WHEN n_chars >= 90
                            THEN 'm2' ELSE 'rev' END
                  ELSE lang END AS lang,
             source, n_chars
      FROM documents
      WHERE n_chars >= 90 OR doc_id % 6 = 0
    )
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           1 AS replica_equals_snapshot
    FROM s2 WHERE doc_id % 11 <> 3
    GROUP BY 1
    """,
)
def streaming_cdf_row_id_replica(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STREAMING spelling of the round-16 id-keyed consumer: a
    replica keyed by the source's stable ``_row_id`` maintained by a
    Structured Streaming query over the ``snapshot_changes`` source
    with ``readChangeFeed=true`` + ``withRowIds=true`` — every
    delivered row (append inserts, recorded MOR-delete / MERGE /
    delete_rows images, compaction invisible) carries its id, and
    foreachBatch applies each commit IN ORDER as one MERGE on the id
    with ``delete_where`` (retractions name exactly the ids the
    delete legs carried), the txn ledger making checkpoint-recovery
    replays no-op. Offsets are commit versions; a restarted stream
    resumes after the last applied commit — the continuous dual of
    ``cdf_row_id_replica``'s one-shot sync and the scale-correct
    inversion of the reference's daily full-rescan job
    (daily_job.py:33-46). ``replica_equals_snapshot`` (hashed into
    the oracle) pins exact id fidelity end-to-end through the stream
    plumbing."""
    import shutil

    from .acid import SnapshotTable
    from .streaming.cdf import SnapshotChangesSource

    spark.dataSource.register(SnapshotChangesSource)
    corpus_dir = tempfile.mkdtemp(prefix="cdfrid_corpus_")
    rep_dir = tempfile.mkdtemp(prefix="cdfrid_rep_")
    for d in (corpus_dir, rep_dir):
        shutil.rmtree(d)
    ckpt = tempfile.mkdtemp(prefix="cdfrid_ckpt_")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    corpus = SnapshotTable(spark, corpus_dir)
    corpus.overwrite(d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0))
    corpus.enable_row_tracking()
    corpus.enable_change_data_feed()
    v_start = corpus.latest_version()
    replica = SnapshotTable(spark, rep_dir)
    replica.overwrite(
        corpus.read(with_row_ids=True).withColumnRenamed(
            "_row_id", "rid"
        )
    )
    # mixed DML the stream must span with ids intact
    corpus.append(d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1))
    corpus.delete(F.col("n_chars") < 90, mode="merge-on-read")
    batch = d.filter(F.pmod(F.col("doc_id"), F.lit(6)) == 0).withColumn(
        "lang",
        F.when(F.col("n_chars") >= 90, F.lit("m2")).otherwise(
            F.lit("rev")
        ),
    )
    corpus.merge(batch, ["doc_id"])
    drop = (
        corpus.read(with_row_ids=True)
        .filter(F.pmod(F.col("doc_id"), F.lit(11)) == 3)
        .select("_row_id")
    )
    corpus.delete_rows(drop)
    corpus.compact()  # invisible to the feed

    qid = "cdf_rid_replica"

    def apply_changes(b: DataFrame, _batch_id: int) -> None:
        b = b.persist()
        try:
            versions = sorted(
                r[0]
                for r in b.select("_commit_version")
                .distinct()
                .collect()
            )
            for v in versions:
                one = b.filter(
                    F.col("_commit_version") == v
                ).filter(F.col("_change_type") != "update_preimage")
                # within-commit tiebreak (derived restore diffs can
                # deliver one id as delete AND insert): non-delete
                # wins — the id is live after the commit
                w = Window.partitionBy("_row_id").orderBy(
                    F.when(
                        F.col("_change_type") == "delete", 1
                    ).otherwise(0)
                )
                one = (
                    one.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
                replica.merge(
                    one.select(
                        F.col("_row_id").alias("rid"),
                        "doc_id",
                        "lang",
                        "source",
                        "n_chars",
                        "_change_type",
                    ),
                    ["rid"],
                    delete_where="_change_type = 'delete'",
                    txn_update={qid: int(v)},
                )
        finally:
            b.unpersist()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS
    )
    try:
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", corpus_dir)
            .option("sinceVersion", str(v_start))
            .option("readChangeFeed", "true")
            .option("withRowIds", "true")
            .load()
            .writeStream.foreachBatch(apply_changes)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    snap = corpus.read(with_row_ids=True).select(
        F.col("_row_id").alias("rid"),
        "doc_id",
        "lang",
        "source",
        "n_chars",
    )
    rep = replica.read().select(
        "rid", "doc_id", "lang", "source", "n_chars"
    )
    # ONE verification job with early exit (isEmpty limits to the
    # first diff row) instead of two counted exceptAll passes
    flag = int(
        rep.exceptAll(snap).unionAll(snap.exceptAll(rep)).isEmpty()
    )
    return (
        rep.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
        )
        .withColumn("replica_equals_snapshot", F.lit(flag))
    )


@query(
    "streaming_ann_index",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {multi_table_buckets_sql("embedding", 2, 8)} AS bks
      FROM embeddings WHERE vec_id % 5 <> 1),
    eb AS (SELECT vec_id, generate_subscripts(bks, 1) AS tbl,
                  unnest(bks) AS bucket
           FROM e),
    q AS (SELECT vec_id AS query_id, tbl, bucket FROM eb WHERE vec_id < 10),
    cand AS (
      SELECT DISTINCT query_id, eb.vec_id AS neighbor_id
      FROM q JOIN eb USING (tbl, bucket) WHERE eb.vec_id <> query_id),
    scored AS (
      SELECT query_id, neighbor_id, qe.v AS qv, ne.v AS cv
      FROM cand
      JOIN e qe ON qe.vec_id = query_id
      JOIN e ne ON ne.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROUND(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv))
                   * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY ROUND(list_dot_product(qv, cv)
                        / (sqrt(list_dot_product(qv, qv))
                           * sqrt(list_dot_product(cv, cv))), 6) DESC,
                        neighbor_id ASC) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank,
           1 AS index_equals_rebuild
    FROM ranked WHERE rank <= 5
    """,
)
def streaming_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING spelling of ``ann_index_row_ids``: the 8-table
    sign-LSH bucket index maintained by a Structured Streaming query
    over the corpus's ``snapshot_changes`` source (readChangeFeed +
    withRowIds) — foreachBatch applies each commit IN ORDER, inserts
    bucketing only the delivered rows, deletes retracting exactly the
    delivered ids via ``delete_in("rid", ...)``, compaction invisible.
    Exactly-once EFFECT without a ledger: the apply is IDEMPOTENT on
    the stable row id — inserts anti-join the index's committed rids
    (pruned by rid stats, O(batch) probes), and delete_in of
    already-absent ids no-ops — so at-least-once delivery after a
    checkpoint replay converges to the same index. The final top-5
    search runs AGAINST THE MAINTAINED INDEX and must equal the
    oracle's one-shot bucketing of the final corpus;
    ``index_equals_rebuild`` pins maintained == rebuilt exactly. The
    continuous dual of the batch sync loop, closing derived-index
    maintenance in both consumption modes (reference daily_job.py's
    full-rescan inverted twice)."""
    import shutil

    from .acid import SnapshotTable
    from .functions.vectors import (
        EMBEDDING_DIM,
        as_double,
        dot_pandas,
        multi_table_buckets_pandas,
        norm_pandas,
    )
    from .streaming.cdf import SnapshotChangesSource

    spark.dataSource.register(SnapshotChangesSource)
    corpus_dir = tempfile.mkdtemp(prefix="sann_corpus_")
    index_dir = tempfile.mkdtemp(prefix="sann_index_")
    for d in (corpus_dir, index_dir):
        shutil.rmtree(d)
    ckpt = tempfile.mkdtemp(prefix="sann_ckpt_")

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = SnapshotTable(spark, corpus_dir)
    corpus.overwrite(
        emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0).select(
            "vec_id", "embedding"
        )
    )
    corpus.enable_row_tracking()
    corpus.enable_change_data_feed()
    v_start = corpus.latest_version()

    def bucket_rows(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("_row_id").alias("rid"),
            "vec_id",
            F.posexplode(
                multi_table_buckets_pandas("embedding", 2, 8, EMBEDDING_DIM)
            ).alias("tbl", "bucket"),
        )

    index = SnapshotTable(spark, index_dir)
    index.overwrite(
        bucket_rows(corpus.read(with_row_ids=True)), stats_cols=["rid"]
    )

    # DML the stream must span with ids intact
    corpus.append(
        emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1).select(
            "vec_id", "embedding"
        )
    )
    drop = (
        corpus.read(with_row_ids=True)
        .filter(F.pmod(F.col("vec_id"), F.lit(5)) == 1)
        .select("_row_id")
    )
    corpus.delete_rows(drop)
    corpus.compact()  # invisible to the feed

    def apply_changes(b: DataFrame, _batch_id: int) -> None:
        b = b.persist()
        try:
            versions = sorted(
                r[0]
                for r in b.select("_commit_version").distinct().collect()
            )
            for v in versions:
                one = b.filter(
                    F.col("_commit_version") == v
                ).filter(F.col("_change_type") != "update_preimage")
                ins = one.filter(
                    F.col("_change_type") == "insert"
                ).select("vec_id", "embedding", "_row_id")
                if not ins.isEmpty():
                    fresh = bucket_rows(ins).join(
                        index.read().select("rid"), "rid", "left_anti"
                    )
                    index.append(fresh, stats_cols=["rid"])
                dels = one.filter(
                    F.col("_change_type") == "delete"
                ).select(F.col("_row_id").alias("rid"))
                index.delete_in("rid", dels)  # idempotent no-op when
                # the ids are already retracted (checkpoint replay)
        finally:
            b.unpersist()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS
    )
    try:
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", corpus_dir)
            .option("sinceVersion", str(v_start))
            .option("readChangeFeed", "true")
            .option("withRowIds", "true")
            .load()
            .writeStream.foreachBatch(apply_changes)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    # maintained == rebuilt, ONE early-exit action; then top-5 FROM
    # THE MAINTAINED INDEX (same contract as ann_index_row_ids)
    rebuild = bucket_rows(corpus.read(with_row_ids=True)).persist()
    got = index.read().select("rid", "vec_id", "tbl", "bucket").persist()
    try:
        flag = int(
            got.exceptAll(rebuild)
            .unionAll(rebuild.exceptAll(got))
            .isEmpty()
        )
        final = corpus.read()
        queries = final.filter(F.col("vec_id") < 10)
        q_keyed = queries.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(
                multi_table_buckets_pandas("embedding", 2, 8, EMBEDDING_DIM)
            ).alias("tbl", "bucket"),
        )
        cand = (
            got.join(F.broadcast(q_keyed), ["tbl", "bucket"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
            .distinct()
        )
        qv = queries.select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv"),
        ).withColumn("qn", norm_pandas(F.col("qv")))
        cv = final.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double("embedding").alias("cv"),
        ).withColumn("cn", norm_pandas(F.col("cv")))
        scored = (
            cand.join(F.broadcast(qv), "query_id")
            .join(cv, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    dot_pandas(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")),
                    6,
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        rows = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "cos_sim", "rank")
            .withColumn("index_equals_rebuild", F.lit(flag))
            .collect()  # <= 10 queries x 5 rows by construction
        )
    finally:
        rebuild.unpersist()
        got.unpersist()
    return spark.createDataFrame(
        rows,
        "query_id BIGINT, neighbor_id BIGINT, cos_sim DOUBLE, "
        "rank INT, index_equals_rebuild INT",
    )

"""Structured Streaming ingest: the reference's entire procedural loop —
watchdog FS events, 30 s S3 polling, and the processed-files ledger
(reference src/jobs/ingest_job.py:59-64,114-156,200-229) — collapses
into ONE declarative streaming query:

    readStream.schema(LISTEN_SCHEMA).json(in_dir)   # the file source IS
                                                    # the watcher/poller
      -> flatten_listens                            # same bronze shape
      -> writeStream.partitionBy("user_name")       # partitioned sink
         .option("checkpointLocation", ...)         # IS the ledger
         .trigger(...)

Exactly-once: the file-source checkpoint records which input files have
been committed (replacing the reference's ``processed_files`` DuckDB
table), and the parquet sink's ``_spark_metadata`` transaction log makes
the write side idempotent across restarts. No user threads, no poll
loop, no manual ledger inserts.

Scale notes: the file source lists the input directory each trigger —
at object-store scale keep per-directory file counts bounded (date
partitdirs) and set ``maxFilesPerTrigger`` to bound micro-batch size;
``cleanSource``/``maxFileAge`` manage retention. Late/duplicate events
are handled downstream by watermarked dedup (``dedup_in_stream``).

S8 (object-store listing) mapping: the reference polls S3 with boto3
``list_objects_v2`` every 30 s (ingest_job.py:114-156). On Spark the
SAME ``readStream`` works unchanged against ``s3a://bucket/prefix`` —
the file source's directory listing goes through the Hadoop FileSystem
API, so local FS, HDFS, and S3A differ only in the URI scheme; no
boto3 analog is needed. ``session.configure_object_store`` is the
endpoint/credential surface (MinIO parity with the reference's
docker-compose + boto3 client). For high-file-rate buckets swap the
listing for notification-driven discovery (S3 event -> SQS -> a
file-index table) while keeping this query shape; this sandbox has no
object store, so the file:// path carries the tested semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..medallion import flatten_listens
from ..schemas import LISTEN_SCHEMA


def read_listen_stream(
    spark: SparkSession,
    in_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of raw listens (S8/S9): Spark's own directory
    listing replaces the reference's watchdog thread + 30 s S3 poll.
    Schema is declared, never inferred (streaming requires it)."""
    reader = spark.readStream.schema(LISTEN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(in_dir)


def dedup_in_stream(
    flat: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup on the reference's unique key (user_name,
    listened_at) with a watermark bounding state (§2.9): duplicates
    arriving within the watermark horizon are dropped exactly once;
    older-than-watermark state is reclaimed."""
    return (
        flat.withColumn("event_time", F.timestamp_seconds("listened_at"))
        .withWatermark("event_time", watermark)
        .dropDuplicates(["user_name", "listened_at"])
        .drop("event_time")
    )


def dedup_content_hash(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """S10 content-hash variant of exactly-once: the reference keys its
    processed-files ledger by sha256 of file CONTENT (reference
    notebooks/analysis.ipynb:95-110), so a renamed copy of an already-
    ingested file is skipped even though its path is new. Spark's
    file-source checkpoint is path-keyed and would re-admit that file —
    this stage closes the gap at row granularity: sha256 over the
    serialized row, deduped against streaming state persisted in the
    checkpoint. Every row of a renamed duplicate file hashes to an
    already-seen key and is dropped; row granularity is strictly
    stronger than the reference's file granularity (it also drops
    duplicate rows shared between otherwise-distinct files).

    CAVEATS (production guidance): (1) dedup is at ROW granularity with
    UNWATERMARKED state — two genuinely distinct events with identical
    field values (plausible for listens lacking a unique id) collapse
    to one; include a unique id column in ``cols`` when the source has
    one, or hash per-file (``input_file_name()`` based) for exact
    file-granularity parity with the reference ledger. (2) State grows
    one 32-byte key per ingested row forever; PREFER the watermarked
    variant (``dedup_in_stream``) whenever the duplicate-arrival
    horizon is known — unbounded state is only right for bounded
    backfills. The dropDuplicates shuffle per micro-batch is the
    ledger's lookup cost (RocksDB-backed state store on a cluster)."""
    src_cols = list(cols or df.columns)
    hashed = df.withColumn(
        "_content_sha",
        F.sha2(F.to_json(F.struct(*[F.col(c) for c in src_cols])), 256),
    )
    return hashed.dropDuplicates(["_content_sha"]).drop("_content_sha")


def start_bronze_ingest(
    spark: SparkSession,
    in_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str = "30 seconds",
    max_files_per_trigger: int | None = None,
    content_dedup: bool = False,
) -> StreamingQuery:
    """Continuous bronze ingest (S8/S9/S10 + K1).

    ``available_now=True`` drains everything currently in ``in_dir``
    then stops (batch-parity mode, used by tests and backfills);
    ``False`` runs the reference's 30 s cadence forever via
    ``Trigger.ProcessingTime`` — but as one declarative query instead of
    three coordinating threads (reference src/jobs/ingest_job.py:209-229).
    ``content_dedup=True`` adds the sha256 content ledger
    (``dedup_content_hash``) so renamed duplicate input files commit
    nothing — full parity with the reference's content-keyed
    processed-files table."""
    flat = flatten_listens(
        read_listen_stream(spark, in_dir, max_files_per_trigger)
    )
    if content_dedup:
        flat = dedup_content_hash(flat)
    writer = (
        flat.writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("user_name")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def ingest_available(
    spark: SparkSession, in_dir: str, bronze_dir: str, checkpoint_dir: str
) -> None:
    """Drain-now ingest pass: process every not-yet-committed file in
    ``in_dir`` exactly once, then return. Re-running after new files
    appear processes only the new files (checkpoint = ledger); re-running
    with no new files is a no-op — the two properties the reference's
    ``processed_files`` table provided."""
    q = start_bronze_ingest(
        spark, in_dir, bronze_dir, checkpoint_dir, available_now=True
    )
    q.awaitTermination()

"""Graded queries that drive the file-source and sink surfaces through
the correctness gate (SURVEY §2 S4/P9/X6 glob + recursive + corrupt-
tolerant scans; K1/R1/R3 partitioned sinks with pruning; K5/R2
single-file export; S8/S9/S10 streaming ingest with checkpoint ledger).

Each query performs a real write -> read-back round trip in a temp
location, then returns a DataFrame whose values the DuckDB oracle
reproduces straight from the source table — so the round trip itself
is under the bit-for-bit value-hash check. Side effects use fresh
``tempfile.mkdtemp`` dirs, so driver re-runs are stable.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .sinks import export_single_parquet
from .sources import read_parquet_glob
from .tables import load_table


@query(
    "source_glob_recursive",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events WHERE user_id < 60 GROUP BY 1
    """,
)
def source_glob_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/P9 through the gate: spool an events subset as a *nested*
    (partitioned) parquet layout, then scan it back with
    ``recursiveFileLookup`` + ``pathGlobFilter='*.parquet'`` — the
    listing-time glob prunes non-data files (e.g. _SUCCESS) without
    reading a byte of them. Recursive lookup disables hive partition
    inference, so the partition column must be carried in the files:
    the spool writes it as a data column too.

    Reference behavior: DuckDB ``read_json_auto('dir/*.txt')`` glob
    scans (reference notebooks/analysis.ipynb) re-expressed as Spark
    reader options."""
    out = tempfile.mkdtemp(prefix="glob_src_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 60)
        .select("event_id", "user_id", "event_type")
    )
    # partitionBy creates the nested dirs; duplicating event_type as a
    # plain column keeps it visible to the recursive (non-hive) scan.
    ev.withColumn("etype", F.col("event_type")).write.mode(
        "overwrite"
    ).partitionBy("etype").parquet(out)
    back = read_parquet_glob(
        spark, out, glob="*.parquet", recursive=True, ignore_corrupt=True
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "sink_partitioned_prune",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY 1
    """,
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/R1/R3 through the gate: ``repartition(event_type)`` ->
    ``partitionBy(event_type)`` parquet sink (one file per partition
    value, the reference's bronze layout — src/jobs/ingest_job.py
    partitioned writes), read back through the hive-partitioned scan
    with a filter on the partition column.

    The filter prunes at listing time: only the 'purchase' and 'signup'
    directories are ever opened (PartitionFilters in the scan node —
    asserted in tests/test_layout.py), which is the property that
    keeps a 100 TB date-partitioned table queryable."""
    out = tempfile.mkdtemp(prefix="part_sink_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    # repartition on the partition column -> each output dir written by
    # the tasks owning that key (no small-files explosion: R1).
    ev.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("event_type").isin("purchase", "signup")
    )
    return back.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "sink_single_file_export",
    oracle="""
    SELECT n_nation, ROUND(total_acctbal, 2) AS total_acctbal
    FROM (
      SELECT COUNT(DISTINCT n_nationkey) AS n_nation,
             SUM(c_acctbal) AS total_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    """,
)
def sink_single_file_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/R2 through the gate: aggregate -> ``coalesce(1)`` single-file
    parquet export (the reference's ``COPY ... TO 'report.parquet'`` BI
    hand-off, notebooks/analysis.ipynb:145-146) -> read the exported
    file back and return it. coalesce(1) is correct exactly here:
    post-aggregation, export-sized data."""
    out = tempfile.mkdtemp(prefix="single_export_")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    report = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .agg(
            F.countDistinct("n_nationkey").alias("n_nation"),
            F.sum("c_acctbal").alias("total_acctbal"),
        )
        .select("n_nation", F.round("total_acctbal", 2).alias("total_acctbal"))
    )
    export_single_parquet(report, out)
    return spark.read.parquet(out)


@query(
    "streaming_ingest_exactly_once",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events WHERE user_id < 50 GROUP BY 1
    """,
)
def streaming_ingest_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/S9/S10+K1 through the gate: file-source streaming ingest with
    a path-keyed checkpoint ledger PLUS the sha256 content ledger
    (streaming/ingest.py dedup_content_hash), drained in FOUR passes.

    Pass 1 ingests half the files; pass 2 (same checkpoint) picks up
    only the files that appeared since; pass 3 with nothing new commits
    nothing; pass 4 re-spools pass-1's CONTENT under new file names — a
    renamed duplicate the path-keyed ledger re-admits but the content
    hash drops, matching the reference's sha256-keyed processed-files
    table (notebooks/analysis.ipynb:95-110). The final partitioned
    parquet sink must therefore hold every source row exactly once —
    which the oracle checks by value hash against the original table.
    The checkpoint replaces the reference's ``processed_files`` DuckDB
    ledger (src/jobs/ingest_job.py:59-64); the sink's _spark_metadata
    log makes the write side idempotent across restarts."""
    from .streaming.ingest import dedup_content_hash

    src = tempfile.mkdtemp(prefix="ing_src_")
    sink = tempfile.mkdtemp(prefix="ing_sink_")
    ckpt = tempfile.mkdtemp(prefix="ing_ckpt_")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("event_id", "user_id", "event_type")
    )
    first = ev.filter(F.col("user_id") < 25).repartition(2)
    first.write.mode("append").json(src)

    def drain() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, user_id BIGINT, event_type STRING"
        ).json(src)
        q = (
            dedup_content_hash(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .partitionBy("event_type")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # The content ledger is a stateful op: cap its state-store task
    # count (pinned into the checkpoint at pass 1) — 4 drains x 32
    # near-empty state partitions is pure scheduling overhead at sf0.01.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        drain()  # pass 1: first half
        ev.filter(F.col("user_id") >= 25).repartition(2).write.mode(
            "append"
        ).json(src)
        drain()  # pass 2: only the new files (path ledger skips committed)
        drain()  # pass 3: no new files -> no-op
        first.write.mode("append").json(src)  # renamed duplicate content
        drain()  # pass 4: content ledger drops every row
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )

"""File-source surfaces beyond plain directory scans (SURVEY §2 S4, P9,
X6): glob-filtered, recursive-discovery, and corrupt-tolerant reads.

The reference gets these behaviors from DuckDB's glob scan
(``read_json_auto('dir/*.txt')``) and Spark's ``ignoreCorruptFiles``
(reference src/jobs/transform_job.py:30); here they are explicit,
composable reader options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet_glob(
    spark: SparkSession,
    base_dir: str,
    glob: str | None = None,
    recursive: bool = False,
    ignore_corrupt: bool = False,
) -> DataFrame:
    """Parquet scan with path-glob filtering (P9), recursive lookup (S4)
    and corrupt-file tolerance (X6).

    ``pathGlobFilter`` prunes at file-listing time (no bytes of filtered
    files are read); ``recursiveFileLookup`` discovers nested layouts
    while *disabling* hive partition inference — use plain
    ``spark.read.parquet(dir)`` when partition-column pruning matters.
    ``ignoreCorruptFiles`` logs-and-skips unreadable files instead of
    failing the job (the right default for petabyte-scale backfills,
    the wrong one for audited finance loads — hence opt-in)."""
    reader = spark.read
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if ignore_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    return reader.parquet(base_dir)


def read_json_glob(
    spark: SparkSession,
    base_dir: str,
    schema: StructType,
    glob: str | None = None,
    recursive: bool = False,
    drop_malformed: bool = True,
) -> DataFrame:
    """NDJSON scan with glob/recursive discovery and declared schema
    (never inferred — a schema inference pass reads the data twice)."""
    reader = spark.read.schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if drop_malformed:
        reader = reader.option("mode", "DROPMALFORMED")
    return reader.json(base_dir)

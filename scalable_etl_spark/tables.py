"""Table loading for the driver testdata star schema.

The testdata parquet stores timestamps as TIMESTAMP(NANOS,false), which
Spark only reads with ``spark.sql.legacy.parquet.nanosAsLong=true`` (as
raw BIGINT nanos). ``load_table`` normalizes those columns to proper
TimestampType at microsecond precision — truncating, which matches how
DuckDB casts TIMESTAMP_NS -> TIMESTAMP — so every downstream operator
sees ordinary timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as parquet TIMESTAMP(NANOS) that arrive as BIGINT nanos.
_TS_NANOS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing timestamp physical types.

    The driver has shipped the same logical tables under two parquet
    spellings across rounds: TIMESTAMP(NANOS) (arrives as BIGINT nanos
    under ``nanosAsLong``) and plain micros TIMESTAMP with
    isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ under Spark 4's NTZ
    inference). Both are normalized to session-zoned TimestampType; with
    the session pinned to UTC the NTZ->TZ cast is value-identical to how
    the DuckDB oracle reads the same column.
    """
    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    dtypes = dict(df.dtypes)
    for c in _TS_NANOS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            # Integer FLOOR division (not fp — 1.7e18 ns exceeds double's
            # exact range, and not `div` — Spark's div truncates toward
            # zero while DuckDB's TIMESTAMP_NS cast floors, so pre-1970
            # nanos would round the other way): floor(a/b) for b>0 is
            # (a - ((a % b + b) % b)) / b.
            df = df.withColumn(
                c,
                F.expr(
                    f"timestamp_micros(({c} - (({c} % 1000 + 1000) % 1000))"
                    " div 1000)"
                ),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}

"""Date band-join (rolling window over days) as a shuffle-friendly
explode + equi-join instead of a BroadcastNestedLoopJoin.

The reference expresses "distinct users active in the trailing 7 days"
as a range self-join:

    daily curr LEFT JOIN daily past
      ON past.d BETWEEN curr.d - INTERVAL 6 DAYS AND curr.d
(reference src/jobs/daily_job_glue.py:31-39, notebooks/analysis.ipynb:136-144)

Catalyst plans a non-equi self-join as a nested-loop join — quadratic
at 100 TB. The rewrite below is algebraically identical for trailing
windows: each (day d, key) fact is *exploded* to the window of days it
contributes to (d .. d+span-1), then a plain hash aggregation counts
distinct keys per day. One shuffle, no nested loop, linear in
rows x window_days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_distinct_count(
    df: DataFrame,
    date_col: str,
    key_col: str,
    window_days: int = 7,
    out_count_col: str = "active_keys",
) -> DataFrame:
    """Per distinct date in ``df``: COUNT(DISTINCT key) over the
    trailing ``window_days`` (inclusive of the date itself).

    Only dates actually present in ``df`` appear in the output, matching
    the reference's self-join semantics (curr comes from the same table).
    """
    daily = df.select(
        F.col(date_col).alias("__d"), F.col(key_col).alias("__k")
    ).distinct()
    span = window_days - 1
    exploded = daily.select(
        F.explode(
            F.sequence(F.col("__d"), F.date_add(F.col("__d"), span))
        ).alias("__d"),
        "__k",
    )
    present = daily.select("__d").distinct()
    return (
        exploded.join(F.broadcast(present), "__d")
        .groupBy("__d")
        .agg(F.countDistinct("__k").alias(out_count_col))
        .withColumnRenamed("__d", date_col)
    )

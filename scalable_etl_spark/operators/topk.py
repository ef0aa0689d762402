"""Deterministic top-k helpers.

The reference uses bare ``row_number()`` over ties
(reference src/jobs/transform_job.py:114-119, daily_job.py:38-40) which
is nondeterministic across runs/engines; these wrappers always append
explicit tiebreak columns so golden tests and the DuckDB oracle agree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """row_number() <= k per group with a caller-supplied total order.

    ``order_cols`` must be a total order within each partition
    (append a unique id as the last key).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_top_k(
    df: DataFrame, order_cols: Sequence[Column], k: int
) -> DataFrame:
    """ORDER BY ... LIMIT k — Spark plans TakeOrderedAndProject, which
    does per-partition partial top-k then a single driver merge: no full
    sort, safe at any scale."""
    return df.orderBy(*order_cols).limit(k)

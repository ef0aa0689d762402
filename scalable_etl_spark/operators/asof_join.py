"""As-of join (latest-value-at-or-before lookup) without a join.

The textbook spelling — ``left JOIN right ON key AND right.ts <=
left.ts`` then keep the max right.ts per left row — is a non-equi join
Catalyst plans as a nested loop, quadratic per key at scale. The
standard scale-out formulation instead UNIONs both sides into one
time-ordered stream per key and carries the most recent right-side
value forward with ``last_value(..., ignorenulls) OVER (PARTITION BY
key ORDER BY ts, side ROWS UNBOUNDED PRECEDING)``:

  one shuffle on the key, one sort within each partition, linear work —
  exactly what a 1000-executor cluster needs for "price as of trade
  time" over 100 TB. Skewed keys shard like any window (the partition
  is (key,), the same layout a sort-merge join would need anyway).

The reference has only the band-join shape (rolling 7-day range,
src/jobs/daily_job_glue.py:31-39); as-of is the other classic
inequality join a complete engine needs, and DuckDB's native ``ASOF
JOIN`` gives the correctness gate an independent oracle for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: the right-side ``value_cols`` from the most
    recent right row with the same ``key_col`` and ``right.ts <=
    left.ts`` (``<`` when ``strict``). Left rows with no earlier right
    row keep NULLs — LEFT ASOF JOIN semantics.

    Ties at identical timestamps: with ``strict=False`` a right row at
    exactly left.ts wins (DuckDB ``ASOF JOIN ... ON r.ts <= l.ts``);
    ordering marks right rows before left rows at equal ts so the
    window sees them first.
    """
    lcols = left.columns
    # side: right=0 sorts before left=1 at equal ts  ->  a right row at
    # the same instant is visible to the left row (non-strict); strict
    # mode flips the order so it is not.
    r_side, l_side = (0, 1) if not strict else (1, 0)
    r = right.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(l_side).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).select(
        "__side",
        *[F.col(f"__l_{c}") for c in lcols],
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    out = merged.filter(F.col("__side") == l_side).drop("__side")
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(c) for c in value_cols],
    )

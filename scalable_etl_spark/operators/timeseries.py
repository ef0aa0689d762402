"""Grouped time-series gap-fill: densify a per-group daily series to a
contiguous day scaffold and forward-fill missing values.

The staple feature-pipeline op the reference lacks entirely (its window
surface stops at dedup/top-k — SURVEY §2.5): ML feature tables need one
row per (entity, day) even when the raw events skip days, with carried-
forward values and an explicit gap marker.

Scale shape:
- The scaffold is built per group from its own [min, max] day span via
  ``sequence`` + ``explode`` — rows created = sum of group spans, never
  |groups| x |global calendar| (a global-calendar cross join explodes
  when one entity has years of history and most have days).
- One shuffle total: the daily pre-aggregation keys by (group, day);
  the span agg, scaffold join-back, and forward-fill window all key by
  group — AQE reuses/aligns these exchanges, and the forward-fill is a
  single running ``last(ignorenulls)`` frame, O(1) memory per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    group_cols: Sequence[str],
    day_col: str,
    agg: Column,
    value_name: str = "day_value",
) -> DataFrame:
    """Densify ``df`` (already one row per (group, day) is NOT required
    — ``agg`` collapses it) to a contiguous per-group day scaffold.

    ``day_col`` must be an integer epoch-day column. Returns one row
    per (group, day-in-span) with:
      - ``value_name``: the day's aggregate, NULL on gap days,
      - ``filled``: forward-filled value (last non-null at or before
        the day),
      - ``is_gap``: true where the day had no input rows.
    """
    gcols = list(group_cols)
    daily = df.groupBy(*gcols, day_col).agg(agg.alias(value_name))
    span = daily.groupBy(*gcols).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    scaffold = span.select(
        *gcols,
        F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(day_col),
    )
    dense = scaffold.join(daily, [*gcols, day_col], "left")
    w = (
        Window.partitionBy(*gcols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        *gcols,
        day_col,
        value_name,
        F.last(value_name, ignorenulls=True).over(w).alias("filled"),
        F.col(value_name).isNull().alias("is_gap"),
    )

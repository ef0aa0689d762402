"""Interval (range-containment) join as a binned equi-join.

``points JOIN intervals ON key AND ts BETWEEN start AND end`` is a
non-equi join — Catalyst falls back to BroadcastNestedLoopJoin, which
is quadratic work at scale. The standard rewrite buckets time into
fixed-width bins: every interval is exploded to the bins it overlaps,
every point belongs to exactly one bin, and the join becomes a plain
hash join on (key, bin) followed by the exact BETWEEN filter. Each
(interval, point) pair can only meet in the point's single bin, so no
dedup is needed and the rewrite is exactly equivalent.

Cost: |intervals| x (span/bin_width + 1) exploded rows + one hash
shuffle — linear, and tunable: pick ``bin_width`` ~ the typical
interval span so each interval explodes to O(1) bins. (DuckDB attacks
the same problem with its IEJoin; the oracle uses that native path,
making the two engines independent witnesses.)

The reference's only non-equi shape is the trailing-days band join
(rewritten in band_join.py); this operator generalizes it to arbitrary
interval containment — sessions, promo windows, validity ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_width_sec: int = 1800,
) -> DataFrame:
    """Inner join of ``points`` to every containing interval (same
    ``key_col``, ``start <= ts <= end``, bounds inclusive).

    Output: all interval columns + all point columns (names must not
    collide except ``key_col``).
    """
    w = F.lit(bin_width_sec)
    start_bin = (F.unix_timestamp(F.col(start_col)) / w).cast("long")
    end_bin = (F.unix_timestamp(F.col(end_col)) / w).cast("long")
    binned_intervals = intervals.select(
        "*",
        F.explode(F.sequence(start_bin, end_bin)).alias("__bin"),
    )
    binned_points = points.select(
        "*",
        (F.unix_timestamp(F.col(ts_col)) / w).cast("long").alias("__bin"),
    )
    return (
        binned_intervals.join(binned_points, [key_col, "__bin"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bin")
    )

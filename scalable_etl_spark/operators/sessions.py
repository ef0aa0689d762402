"""Event sessionization + time-window aggregation.

Spark-native windowing (SURVEY §2.9 row "Windows"): tumbling/sliding
windows via ``F.window``, sessions via ``F.session_window`` — the same
expressions work identically over batch DataFrames and streams (with a
watermark bounding streaming state).

Scale: both are single-shuffle hash aggregations on (key, window);
session merging happens inside the aggregation operator, never as a
self-join. The batch session oracle (gaps-and-islands with LAG +
running SUM) is the classic SQL spelling — quadratic-free but two
window passes; Spark's native operator is one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key sessions with inactivity gap: events closer than ``gap``
    chain into one session.

    Output: (key, session_start, session_end, n_events) where
    session_end is the LAST EVENT time (gaps-and-islands convention;
    Spark's session_window.end is last-event + gap — subtracted out so
    the result is engine-neutral)."""
    w = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(F.col(key_col), w).agg(F.count("*").alias("n_events"))
    return out.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        (
            F.col("session_window.end") - F.expr(f"INTERVAL {gap}")
        ).alias("session_end"),
        "n_events",
    )


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts per key — same expression batch or
    streaming (add ``withWatermark`` upstream for streams)."""
    return (
        df.groupBy(F.col(key_col), F.window(F.col(ts_col), width))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("window.start").alias("window_start"),
            "n_events",
        )
    )

"""Graded analytics-breadth queries: grouping sets (ROLLUP), pivot,
ranking tiles, and custom window frames.

The reference's aggregate surface stops at plain GROUP BY (SURVEY
§2.4 "no grouping sets / cube / rollup"); a complete engine needs the
rest of the standard analytic toolkit, so each family is registered
here with a DuckDB oracle. All are single-shuffle hash aggregations or
single-sort window passes — no shape that degrades at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation): per-nation, per-region subtotal, and
    grand-total rows in one aggregation pass. Spark plans one Expand +
    one hash aggregate — the subtotal levels share the shuffle instead
    of issuing three queries."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count("*").alias("n_customers"),
        )
    )


@query(
    "pivot_event_values",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           ROUND(COALESCE(SUM(value) FILTER (event_type = 'click'), 0), 2) AS click,
           ROUND(COALESCE(SUM(value) FILTER (event_type = 'error'), 0), 2) AS error,
           ROUND(COALESCE(SUM(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase,
           ROUND(COALESCE(SUM(value) FILTER (event_type = 'signup'), 0), 2) AS signup,
           ROUND(COALESCE(SUM(value) FILTER (event_type = 'view'), 0), 2) AS view
    FROM events GROUP BY 1
    """,
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type, summed value per day. The
    explicit value list keeps the plan single-pass (Spark needs no
    distinct-values pre-query) and makes the output schema static —
    both required for a sane pivot over 100 TB."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum("value"))
    )
    return out.select(
        "event_date",
        *[
            F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t)
            for t in EVENT_TYPES
        ],
    )


@query(
    "user_value_deciles",
    oracle="""
    WITH totals AS (
      SELECT user_id, ROUND(SUM(value), 2) AS total_value
      FROM events GROUP BY 1),
    tiled AS (
      SELECT user_id, total_value,
             NTILE(10) OVER (ORDER BY total_value DESC, user_id ASC) AS decile
      FROM totals)
    SELECT decile, COUNT(*) AS n_users,
           ROUND(MIN(total_value), 2) AS min_value,
           ROUND(MAX(total_value), 2) AS max_value
    FROM tiled GROUP BY 1
    """,
)
def user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) user-value deciles. The user_id tiebreak pins tile
    boundaries so both engines split ties identically."""
    e = load_table(spark, sf_dir, "events")
    totals = e.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    tiled = totals.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.round(F.min("total_value"), 2).alias("min_value"),
        F.round(F.max("total_value"), 2).alias("max_value"),
    )


@query(
    "rolling_weekly_value",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 2) AS day_value
      FROM events GROUP BY 1, 2)
    SELECT event_type, d AS epoch_day,
           ROUND(SUM(day_value) OVER (
             PARTITION BY event_type ORDER BY d
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS week_value,
           LEAD(d) OVER (PARTITION BY event_type ORDER BY d) - d
             AS days_to_next
    FROM daily
    """,
)
def rolling_weekly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day value per event type via a RANGE frame over
    epoch-day (value-based frame — skipped days still bound the window
    correctly, unlike a ROWS frame), plus LEAD for the gap to the next
    active day. One sort per partition; the frame is O(1) memory per
    row at any scale."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-6, Window.currentRow)
    )
    wl = Window.partitionBy("event_type").orderBy("d")
    return daily.select(
        "event_type",
        F.col("d").alias("epoch_day"),
        F.round(F.sum("day_value").over(w), 2).alias("week_value"),
        (F.lead("d").over(wl) - F.col("d")).alias("days_to_next"),
    )


@query(
    "session_event_join",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered),
    sess AS (
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM numbered GROUP BY user_id, session_no)
    SELECT s.user_id, s.session_start, s.session_end,
           COUNT(e.event_id) AS n_matched,
           ROUND(SUM(e.value), 2) AS session_value
    FROM sess s
    JOIN events e
      ON e.user_id = s.user_id
     AND e.ts BETWEEN s.session_start AND s.session_end
    GROUP BY 1, 2, 3
    """,
)
def session_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join at scale: sessionize (native
    session_window), then join every event back to its containing
    session via the binned equi-join rewrite
    (operators/range_join.py) — no nested-loop join anywhere in the
    plan. The oracle runs the naive BETWEEN join (DuckDB plans its
    IEJoin), so two fundamentally different physical strategies must
    produce the identical pair set."""
    from .operators.range_join import interval_join
    from .operators.sessions import sessionize

    e = load_table(spark, sf_dir, "events")
    sess = sessionize(e, ts_col="ts", key_col="user_id", gap="30 minutes")
    joined = interval_join(
        sess.drop("n_events"),
        e.select("user_id", "ts", "event_id", "value"),
        key_col="user_id",
        start_col="session_start",
        end_col="session_end",
        ts_col="ts",
        bin_width_sec=1800,
    )
    return joined.groupBy("user_id", "session_start", "session_end").agg(
        F.count("event_id").alias("n_matched"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@query(
    "salted_segment_revenue",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof join (operators/partitioning.py salted_join): the big
    fact side is salted deterministically, the dimension replicated
    n_salts times, and the join runs on (key, salt) — a hot user_id
    spreads over 8 reducers instead of stalling one. The oracle's plain
    join proves the rewrite is row-identical."""
    from .operators.partitioning import salted_join

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(e, c, ["user_id"], n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "unpivot_daily_values",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS event_date,
             ROUND(COALESCE(SUM(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase,
             ROUND(COALESCE(SUM(value) FILTER (event_type = 'view'), 0), 2) AS view
      FROM events GROUP BY 1)
    SELECT event_date, 'purchase' AS metric, purchase AS metric_value FROM daily
    UNION ALL
    SELECT event_date, 'view' AS metric, view AS metric_value FROM daily
    """,
)
def unpivot_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-day metric columns back to long
    (event_date, metric, metric_value) rows via DataFrame.unpivot —
    the Expand-based single-pass inverse of pivot. The oracle spells it
    as the portable UNION ALL."""
    e = load_table(spark, sf_dir, "events")
    wide = (
        e.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", ["purchase", "view"])
        .agg(F.sum("value"))
    )
    wide = wide.select(
        "event_date",
        *[
            F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t)
            for t in ("purchase", "view")
        ],
    )
    return wide.unpivot(
        ["event_date"],
        ["purchase", "view"],
        "metric",
        "metric_value",
    )


@query(
    "cube_type_daily",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events WHERE user_id < 50
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
)
def cube_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, day): all four grouping levels — cell,
    per-type, per-day, grand total — in one Expand + one hash
    aggregation (completes the grouping-sets family next to
    rollup_revenue)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        e.cube("event_type", F.to_date("ts").alias("event_date"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "gapfill_user_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day,
             ROUND(SUM(value), 2) AS day_value
      FROM events WHERE event_type = 'purchase' AND user_id < 40
      GROUP BY 1, 2),
    span AS (SELECT user_id, min(epoch_day) AS d0, max(epoch_day) AS d1
             FROM daily GROUP BY 1),
    scaffold AS (SELECT user_id, unnest(generate_series(d0, d1)) AS epoch_day
                 FROM span),
    dense AS (SELECT s.user_id, s.epoch_day, d.day_value
              FROM scaffold s
              LEFT JOIN daily d USING (user_id, epoch_day))
    SELECT user_id, epoch_day, day_value,
           last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY epoch_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           day_value IS NULL AS is_gap
    FROM dense
    """,
)
def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped gap-fill: densify each user's purchase-value series to a
    contiguous daily scaffold (per-group span, sequence + explode) and
    forward-fill gaps with a running last(ignorenulls) frame — the
    feature-table densification op (see operators/timeseries.py for the
    scale shape)."""
    from .operators.timeseries import gap_fill_daily

    e = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") < 40))
        .withColumn(
            "epoch_day",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")),
        )
    )
    return gap_fill_daily(
        e, ["user_id"], "epoch_day", F.round(F.sum("value"), 2)
    )

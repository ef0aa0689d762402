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


# ----------------------------------------------------- funnel analysis


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
    SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM c
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM p
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    counts at step N only with an event strictly AFTER their step-N-1
    time (ordering matters, not mere presence — the thing a naive
    INTERSECT of user sets gets wrong).

    Scale shape: three user-keyed aggregations co-partitioned on the
    same key — AQE reuses the user_id exchange across steps; each step
    joins to the (always smaller) previous-step frontier. No windows,
    no self-join over raw events.
    """
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(n).alias("step"),
            F.lit(name).alias("event_type"),
            F.count("*").alias("n_users"),
        )

    return (
        step(v, 1, "view")
        .unionAll(step(c, 2, "click"))
        .unionAll(step(p, 3, "purchase"))
    )


# ---------------------------------------------------- cohort retention


@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY 1),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            date_trunc('week', e.ts)) / 7 AS BIGINT)
               AS week_n
      FROM events e JOIN first f ON f.user_id = e.user_id)
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_n,
           COUNT(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by the ISO week of
    their first event; cell (cohort, N) = distinct users of that cohort
    active in week N after it. Both engines truncate weeks to Monday and
    count whole-day differences, so the matrix is exact.

    Scale shape: one user-keyed min-aggregation, an AQE-broadcastable
    join-back of the (users-sized) cohort table, then a distinct +
    count over (cohort, week) — the classic two-shuffle retention plan;
    nothing quadratic, no per-cohort scans.
    """
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_n"),
        )
        .distinct()
    )
    return act.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_n"
    ).agg(F.count("*").alias("n_users"))


# ------------------------------------------------- FK integrity audit


@query(
    "fk_integrity_audit",
    oracle="""
    SELECT 'orders->customer' AS relation,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_keys,
           COUNT(*) FILTER (c_custkey IS NULL) AS n_orphans
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'lineitem->orders', COUNT(*), COUNT(DISTINCT l_orderkey),
           COUNT(*) FILTER (o_orderkey IS NULL)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'customer->nation', COUNT(*), COUNT(DISTINCT c_nationkey),
           COUNT(*) FILTER (n_nationkey IS NULL)
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: per FK
    relation, total rows, distinct keys, and orphans (fact keys with no
    dim row). Zero orphans is the healthy steady state — the query is
    the gate that PROVES it before a join-heavy pipeline runs on the
    assumption.

    Scale shape: each relation is one left join against the dim's key
    column only (pruned scan, broadcast where the dim is small) feeding
    a single-row aggregate; relations union trivially. The fact table
    is scanned once per relation and never shuffled beyond its join.
    """
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")

    def audit(fact, fk, dim, pk, name):
        j = fact.select(fk).join(
            dim.select(pk), fact[fk] == dim[pk], "left"
        )
        return j.agg(
            F.lit(name).alias("relation"),
            F.count("*").alias("n_rows"),
            F.countDistinct(fk).alias("n_keys"),
            F.count(F.when(F.col(pk).isNull(), 1)).alias("n_orphans"),
        )

    return (
        audit(o, "o_custkey", cu, "c_custkey", "orders->customer")
        .unionAll(audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"))
        .unionAll(audit(cu, "c_nationkey", na, "n_nationkey", "customer->nation"))
    )


# -------------------------------------- state intervals (temporal RLE)


@query(
    "event_state_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o)
    SELECT user_id, CAST(run_id AS INT) AS run_id, event_type,
           MIN(ts) AS valid_from, MAX(ts) AS valid_to,
           COUNT(*) AS n_events
    FROM r GROUP BY 1, 2, 3
    """,
)
def event_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal run-length encoding — collapse each user's event stream
    into maximal constant-state intervals (the change-detection +
    validity-range construction that builds SCD-2 style history tables
    from change logs): LAG marks state changes, a running sum numbers
    runs, one aggregate emits [valid_from, valid_to] per run.

    Scale shape: both windows share ONE user-keyed sort exchange
    (same partition + order spec), then a hash aggregate on the run
    key; linear, no self-joins. The (ts, event_id) order key is a
    total order, so run numbering is deterministic on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("int")
    r = e.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    return r.groupBy(
        "user_id", F.col("run_id").cast("int").alias("run_id"), "event_type"
    ).agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count("*").alias("n_events"),
    )


# -------------------------------------- incremental view maintenance


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(ts) AS last_seen
    FROM events GROUP BY 1
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-view maintenance: the standing view (90%
    of history) and a late-arriving delta batch are BOTH reduced to
    mergeable partial states (count, sum, max), then merged by re-
    aggregation — the update path that never rescans history. The
    oracle is the full recompute: merged partials must equal it
    exactly, which is precisely the algebraic-aggregate property
    (commutative monoid) this query pins down.

    Scale shape: the delta aggregation touches only delta rows; the
    merge shuffles per-key partial states (5 rows here, |keys| in
    general), never raw events. Same mechanics as the streaming
    complete-mode state updates and the HLL register merge
    (`hll_union_users`), spelled for batch."""
    e = load_table(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("pn"),
            F.sum("value").alias("pv"),
            F.max("ts").alias("pt"),
        )

    base = partials(e.filter(F.col("event_id") % 10 != 0))
    delta = partials(e.filter(F.col("event_id") % 10 == 0))
    return (
        base.unionAll(delta)
        .groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv"), 2).alias("total_value"),
            F.max("pt").alias("last_seen"),
        )
    )


@query(
    "grouping_sets_activity",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           GROUPING(event_type) AS g_type,
           GROUPING(CAST(ts AS DATE)) AS g_date
    FROM events
    GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                            (event_type), (CAST(ts AS DATE)))
    """,
)
def grouping_sets_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    for, with a set list neither of them produces ((type, date),
    (type), (date): no grand total, no empty set). Spark plans the
    same single Expand + shared exchange as ROLLUP (one scan, one
    shuffle, all levels); GROUPING() flags disambiguate a NULL group
    key from a subtotal row — the standard cube-consumer contract.
    SQL text modality (GROUPING SETS has no DataFrame sugar)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "gs_events"
    )
    out = spark.sql(
        """
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               GROUPING(event_type) AS g_type,
               GROUPING(CAST(ts AS DATE)) AS g_date
        FROM gs_events
        GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                                (event_type), (CAST(ts AS DATE)))
        """
    )
    spark.catalog.dropTempView("gs_events")
    return out

"""SQL-text query surface: temp views + ``spark.sql`` + ``spark.table``.

The reference drives a whole modality through SQL text —
``createOrReplaceTempView`` then CTEs with ordinal GROUP BY and a band
self-join (reference src/jobs/daily_job_glue.py:18-39,
ingest_job_glue.py:20-41) and catalog scans via ``spark.table``
(reference src/jobs/daily_job.py:33). These queries exercise that
surface end-to-end; results are identical to their DataFrame twins in
queries.py, so the oracles are shared shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .tables import load_table


def _view(spark: SparkSession, sf_dir: str, name: str, view: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(view)


@query(
    "sql_top_users_ordinal",
    oracle="""
    SELECT user_id, COUNT(*) AS listen_count
    FROM events GROUP BY 1
    ORDER BY 2 DESC, 1 ASC LIMIT 10
    """,
)
def sql_top_users_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal GROUP BY / ORDER BY through spark.sql over a temp view
    (reference src/jobs/daily_job_glue.py:21-25; A3 + S7)."""
    _view(spark, sf_dir, "events", "events_v")
    return spark.sql(
        """
        SELECT user_id, COUNT(*) AS listen_count
        FROM events_v GROUP BY 1
        ORDER BY 2 DESC, 1 ASC LIMIT 10
        """
    )


@query(
    "sql_rolling_band_cte",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS event_date, user_id FROM events),
    curr AS (SELECT DISTINCT event_date FROM daily)
    SELECT curr.event_date, COUNT(DISTINCT past.user_id) AS active_users
    FROM curr LEFT JOIN daily past
      ON past.event_date BETWEEN curr.event_date - 6 AND curr.event_date
    GROUP BY curr.event_date
    """,
)
def sql_rolling_band_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's band self-join as literal SQL text (reference
    src/jobs/daily_job_glue.py:28-39): CTE + LEFT JOIN ... BETWEEN +
    COUNT(DISTINCT). This is the *parity* spelling (Catalyst plans a
    BroadcastNestedLoopJoin); the scale path is the explode rewrite in
    operators/band_join.py, checked by rolling_active_users."""
    _view(spark, sf_dir, "events", "events_v")
    return spark.sql(
        """
        WITH daily AS (
          SELECT DISTINCT CAST(ts AS DATE) AS event_date, user_id
          FROM events_v),
        curr AS (SELECT DISTINCT event_date FROM daily)
        SELECT curr.event_date, COUNT(DISTINCT past.user_id) AS active_users
        FROM curr LEFT JOIN daily past
          ON past.event_date BETWEEN curr.event_date - INTERVAL 6 DAY
                                 AND curr.event_date
        GROUP BY curr.event_date
        """
    )


@query(
    "sql_catalog_scan",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def sql_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.table() catalog scan (reference src/jobs/daily_job.py:33;
    S6): register a view, then consume it via the catalog API rather
    than a DataFrame handle."""
    from pyspark.sql import functions as F

    _view(spark, sf_dir, "events", "events_catalog_v")
    t = spark.table("events_catalog_v")
    return t.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "sql_type_share_cte",
    oracle="""
    WITH by_type AS (
      SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1),
    total AS (SELECT SUM(cnt) AS total_cnt FROM by_type)
    SELECT event_type, cnt,
           ROUND(CAST(cnt AS DOUBLE) * 100.0
                 / (SELECT CAST(total_cnt AS DOUBLE) FROM total), 2) AS pct
    FROM by_type
    """,
)
def sql_type_share_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + uncorrelated scalar subquery through SQL text (reference
    notebooks/analysis.ipynb:136-144 uses the same shape)."""
    _view(spark, sf_dir, "events", "events_v")
    return spark.sql(
        """
        WITH by_type AS (
          SELECT event_type, COUNT(*) AS cnt FROM events_v GROUP BY 1),
        total AS (SELECT SUM(cnt) AS total_cnt FROM by_type)
        SELECT event_type, cnt,
               -- DOUBLE on both engines: Spark parses 100.0 as DECIMAL,
               -- whose ROUND renders trailing zeros ('18.80') while the
               -- oracle's double renders '18.8' - same number, different
               -- string under the value hash
               ROUND(CAST(cnt AS DOUBLE) * 100.0
                     / (SELECT CAST(total_cnt AS DOUBLE) FROM total), 2)
                 AS pct
        FROM by_type
        """
    )


@query(
    "sql_correlated_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT AVG(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey)
      AND EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery + correlated EXISTS through spark.sql:
    customers above their nation's average balance who have orders.
    Catalyst decorrelates both into aggregate + join / left-semi —
    there is no per-row re-execution at any scale (the plan is two hash
    joins); the oracle runs the identical SQL text on DuckDB."""
    _view(spark, sf_dir, "customer", "customer_v")
    _view(spark, sf_dir, "orders", "orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
        FROM customer_v c
        WHERE c.c_acctbal > (
          SELECT AVG(c2.c_acctbal) FROM customer_v c2
          WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (
            SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey)
        """
    )

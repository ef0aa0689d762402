"""Fixture tests for the funnel / cohort / FK-audit / state-interval
queries — hand-reasoned expectations on tiny synthetic tables written
to a temp sf_dir (the queries' only input contract).
"""

from __future__ import annotations

import datetime as dt

from scalable_etl_spark.queries_analytics import (
    cohort_retention,
    event_state_intervals,
    fk_integrity_audit,
    funnel_view_click_purchase,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_requires_strict_ordering(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 1: view -> click -> purchase (full conversion)
            (1, _ts(1), 1, "view", 0.0, "{}"),
            (2, _ts(2), 1, "click", 0.0, "{}"),
            (3, _ts(3), 1, "purchase", 0.0, "{}"),
            # user 2: click BEFORE first view -> not a step-2 user
            (4, _ts(1), 2, "click", 0.0, "{}"),
            (5, _ts(2), 2, "view", 0.0, "{}"),
            # user 3: view only
            (6, _ts(1), 3, "view", 0.0, "{}"),
            # user 4: purchase with no view at all -> nowhere
            (7, _ts(1), 4, "purchase", 0.0, "{}"),
        ],
    )
    out = {r.step: r.n_users for r in funnel_view_click_purchase(spark, sf).collect()}
    assert out == {1: 3, 2: 1, 3: 1}


def test_cohort_retention_weeks(spark, tmp_path):
    # 2024-01-01 is a Monday. User 1 starts week 0, returns week 1;
    # user 2 starts week 1 only.
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _ts(1), 1, "view", 0.0, "{}"),   # Mon wk0
            (2, _ts(3), 1, "view", 0.0, "{}"),   # Wed wk0 (same cell)
            (3, _ts(9), 1, "view", 0.0, "{}"),   # Tue wk1
            (4, _ts(8), 2, "view", 0.0, "{}"),   # Mon wk1
        ],
    )
    out = {
        (r.cohort_week.isoformat(), r.week_n): r.n_users
        for r in cohort_retention(spark, sf).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_fk_integrity_audit_counts_orphans(spark, tmp_path):
    spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], "o_orderkey BIGINT, o_custkey BIGINT"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 0)], "c_custkey BIGINT, c_nationkey INT"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1.0), (7, 1.0)], "l_orderkey BIGINT, l_quantity DOUBLE"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(0, "ZERO")], "n_nationkey INT, n_name STRING"
    ).write.parquet(str(tmp_path / "nation.parquet"))

    out = {
        r.relation: (r.n_rows, r.n_keys, r.n_orphans)
        for r in fk_integrity_audit(spark, str(tmp_path)).collect()
    }
    assert out == {
        "orders->customer": (3, 2, 1),   # custkey 99 orphaned
        "lineitem->orders": (2, 2, 1),   # orderkey 7 orphaned
        "customer->nation": (1, 1, 0),
    }


def test_event_state_intervals_runs(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _ts(1, 1), 1, "view", 0.0, "{}"),
            (2, _ts(1, 2), 1, "view", 0.0, "{}"),
            (3, _ts(1, 3), 1, "click", 0.0, "{}"),
            (4, _ts(1, 4), 1, "view", 0.0, "{}"),
        ],
    )
    out = {
        (r.user_id, r.run_id): (r.event_type, r.valid_from, r.valid_to, r.n_events)
        for r in event_state_intervals(spark, sf).collect()
    }
    # Runs are 1-based: the first row's LAG is NULL, which IS DISTINCT
    # FROM any state on both engines, so it opens run 1.
    assert out == {
        (1, 1): ("view", _ts(1, 1), _ts(1, 2), 2),
        (1, 2): ("click", _ts(1, 3), _ts(1, 3), 1),
        (1, 3): ("view", _ts(1, 4), _ts(1, 4), 1),
    }

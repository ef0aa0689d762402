"""Unit tests for operators/topk.py (W2/O1/O5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_etl_spark.operators.topk import global_top_k, top_k_per_group


def test_top_k_per_group_basic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 20), ("b", 4, 5)],
        ["grp", "id", "score"],
    )
    out = top_k_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], k=2
    )
    rows = {(r.grp, r.id, r.rank) for r in out.collect()}
    assert rows == {("a", 2, 1), ("a", 3, 2), ("b", 4, 1)}


def test_top_k_per_group_deterministic_tiebreak(spark):
    # Two rows tie on score; id asc must pin the winner every run.
    df = spark.createDataFrame(
        [("a", 2, 10), ("a", 1, 10), ("a", 3, 10)], ["grp", "id", "score"]
    )
    out = top_k_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], k=1
    )
    assert [r.id for r in out.collect()] == [1]


def test_global_top_k_plans_take_ordered(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    out = global_top_k(df, [F.col("v").desc(), F.col("id").asc()], k=3)
    assert [r.id for r in out.collect()] == [6, 13, 20]
    # ORDER BY + LIMIT must plan TakeOrderedAndProject (partial per-
    # partition top-k, no global sort) — the scale-safe physical form.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

"""Bucketed co-located join (no Exchange in the plan) and salted skew
aggregation correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.operators.partitioning import (
    count_exchanges,
    salted_agg,
    save_bucketed,
)
from scalable_etl_spark.sinks import create_namespace, drop_table_and_location


def test_bucketed_join_is_shuffle_free(spark):
    create_namespace(spark, "bkt")
    for t in ("bkt.orders_b", "bkt.lines_b"):
        drop_table_and_location(spark, t)
    orders = spark.range(1000).select(
        F.col("id").alias("o_id"), (F.col("id") % 7).alias("status")
    )
    lines = spark.range(5000).select(
        (F.col("id") % 1000).alias("o_id"), F.col("id").alias("line_id")
    )
    save_bucketed(orders, "bkt.orders_b", ["o_id"], n_buckets=8)
    save_bucketed(lines, "bkt.lines_b", ["o_id"], n_buckets=8)

    # hint("merge") forces SortMergeJoin (the tables are broadcast-small
    # here; at real scale the optimizer picks SMJ itself) — the point is
    # the co-located buckets make it shuffle-free.
    joined = spark.table("bkt.orders_b").join(
        spark.table("bkt.lines_b").hint("merge"), "o_id"
    )
    assert joined.count() == 5000
    assert count_exchanges(joined) == 0

    # Control: the same sort-merge join over non-bucketed data shuffles
    # both sides (broadcast disabled so the comparison is SMJ vs SMJ).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = orders.join(lines, "o_id")
        assert count_exchanges(plain) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("bkt.orders_b", "bkt.lines_b"):
        drop_table_and_location(spark, t)


def test_bucketed_agg_reuses_layout(spark):
    create_namespace(spark, "bkt")
    drop_table_and_location(spark, "bkt.ev_b")
    ev = spark.range(2000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("v")
    )
    save_bucketed(ev, "bkt.ev_b", ["user_id"], n_buckets=8)
    agg = spark.table("bkt.ev_b").groupBy("user_id").agg(F.sum("v").alias("s"))
    assert agg.count() == 50
    assert count_exchanges(agg) == 0  # aggregation inherits bucketing
    drop_table_and_location(spark, "bkt.ev_b")


def test_salted_agg_matches_plain(spark):
    # Heavy skew: 90% of rows share one key.
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    got = {
        r.k: (r.v_sum, r.v_count, r.v_min, r.v_max)
        for r in salted_agg(
            df, ["k"], {"v": "sum"} | {}, n_salts=8
        )
        .join(
            salted_agg(df, ["k"], {"v": "count"}, n_salts=8), "k"
        )
        .join(salted_agg(df, ["k"], {"v": "min"}, n_salts=8), "k")
        .join(salted_agg(df, ["k"], {"v": "max"}, n_salts=8), "k")
        .collect()
    }
    want = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_avg(spark):
    df = spark.range(10).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"v": "avg"})

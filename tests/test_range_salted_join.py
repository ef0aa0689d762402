"""interval_join and salted_join: row-identical to the naive joins they
replace, including bin-boundary and hot-key cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scalable_etl_spark.operators.partitioning import salted_join
from scalable_etl_spark.operators.range_join import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_interval_join_matches_naive(spark):
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "a"),
            (1, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:45:00"), "b"),
            (2, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"), "c"),
        ],
        ["k", "start", "end", "iv"],
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),  # == start (inclusive)
            (1, _ts("2024-01-01 10:30:00"), 101),  # bin boundary, 2 hits
            (1, _ts("2024-01-01 11:00:00"), 102),  # == end (inclusive)
            (1, _ts("2024-01-01 11:00:01"), 103),  # just outside
            (2, _ts("2024-01-01 23:59:59"), 104),
            (3, _ts("2024-01-01 10:30:00"), 105),  # no interval for key
        ],
        ["k", "ts", "pid"],
    )
    got = sorted(
        (r.iv, r.pid)
        for r in interval_join(
            intervals, points, "k", "start", "end", "ts", bin_width_sec=1800
        ).collect()
    )
    naive = sorted(
        (r.iv, r.pid)
        for r in intervals.join(points, "k")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    )
    assert got == naive
    assert ("a", 101) in got and ("b", 101) in got  # overlapping intervals


def test_salted_join_matches_plain(spark):
    # 10k rows on ONE hot key plus a tail — the shape salting exists for.
    big = spark.range(11000).select(
        F.when(F.col("id") < 10000, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = (
        big.join(small, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("dim").alias("s"))
    )
    salted = (
        salted_join(big, small, ["k"], n_salts=8)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("dim").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )

"""asof_join (union+window rewrite) vs hand-computed expectations and
vs the naive non-equi join it replaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_etl_spark.operators.asof_join import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", 10),
            (2, "k1", 20),
            (3, "k1", 5),   # before any right row -> NULL
            (4, "k2", 15),  # key with no right rows at all -> NULL
        ],
        ["lid", "k", "t"],
    )
    right = spark.createDataFrame(
        [
            ("k1", 8, 0.8),
            ("k1", 10, 1.0),   # same instant as lid=1
            ("k1", 18, 1.8),
        ],
        ["k", "t", "px"],
    )
    return left, right


def test_asof_non_strict(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, "k", "t", ["px"])
    got = {r.lid: r.px for r in out.collect()}
    # lid=1 sees the same-instant right row (<=); lid=2 the t=18 row;
    # lid=3 predates every right row; k2 has none.
    assert got == {1: 1.0, 2: 1.8, 3: None, 4: None}
    assert out.count() == left.count()  # LEFT semantics: no row loss


def test_asof_strict(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, "k", "t", ["px"], strict=True)
    got = {r.lid: r.px for r in out.collect()}
    # Strict (<): lid=1 must NOT see the t=10 row, falls back to t=8.
    assert got == {1: 0.8, 2: 1.8, 3: None, 4: None}


def test_asof_matches_naive_join(spark):
    """Union+window result == the quadratic greatest-ts-per-left-row
    join on randomized-ish data."""
    left = spark.range(60).select(
        F.col("id").alias("lid"),
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 37) % 100).alias("t"),
    )
    right = spark.range(40).select(
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 53) % 100).alias("t"),
        (F.col("id") * 1.5).alias("px"),
    ).groupBy("k", "t").agg(F.max("px").alias("px"))

    out = asof_join(left, right, "k", "t", ["px"])

    best = (
        left.join(right.withColumnRenamed("t", "rt"), "k", "left")
        .filter(F.col("rt") <= F.col("t"))
        .groupBy("lid")
        .agg(F.max(F.struct("rt", "px")).alias("m"))
        .select("lid", F.col("m.px").alias("px"))
    )
    naive = {r.lid: r.px for r in best.collect()}
    got = {r.lid: r.px for r in out.collect()}
    for lid, px in got.items():
        assert naive.get(lid) == px or (px is None and lid not in naive)

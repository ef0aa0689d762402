"""HLL sketch: accuracy vs exact distinct counts, determinism, and the
linear-counting/raw regime switch."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_etl_spark.functions.sketches import HLL_M, hll_distinct


def test_hll_accuracy_small_and_large(spark):
    # Small cardinality (linear-counting regime) and larger-than-m
    # cardinality (raw regime) per group; HLL with m=256 has std error
    # ~1.04/sqrt(256) = 6.5% — assert a loose 3-sigma bound.
    df = spark.range(30000).select(
        F.when(F.col("id") % 3 == 0, "small").otherwise("large").alias("g"),
        F.when(F.col("id") % 3 == 0, F.col("id") % 50)
        .otherwise(F.col("id"))
        .alias("k"),
    )
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    est = {r.g: r.est_distinct for r in hll_distinct(df, "k", ["g"]).collect()}
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.20, (g, n, est[g])


def test_hll_deterministic(spark):
    df = spark.range(5000).select(
        F.lit("x").alias("g"), (F.col("id") * 7919 % 1000).alias("k")
    )
    a = hll_distinct(df, "k", ["g"]).collect()[0]
    b = hll_distinct(df.repartition(13), "k", ["g"]).collect()[0]
    assert a.est_distinct == b.est_distinct
    assert a.n_registers <= HLL_M


def test_histogram_quantiles_accuracy(spark):
    from scalable_etl_spark.functions.sketches import histogram_quantiles

    df = spark.range(10000).select(
        F.lit("g").alias("g"), (F.col("id") % 100 + 0.5).alias("v")
    )
    row = histogram_quantiles(df, "v", ["g"], bin_width=1.0).collect()[0]
    # Uniform over [0.5, 99.5]: estimates within one bin of the truth.
    assert row.n_rows == 10000
    assert abs(row.p50 - 50) <= 1
    assert abs(row.p95 - 95) <= 1
    assert abs(row.p99 - 99) <= 1


def test_hll_merge_equals_direct(spark):
    from scalable_etl_spark.functions.sketches import (
        hll_merge_estimate,
        hll_registers,
    )

    a = spark.range(0, 800).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    merged = hll_merge_estimate(
        hll_registers(a, "k"), hll_registers(b, "k")
    ).collect()[0]
    direct = hll_merge_estimate(
        hll_registers(a.unionByName(b), "k")
    ).collect()[0]
    # Sketch of union == union of sketches, bit for bit.
    assert merged.est_distinct == direct.est_distinct
    assert merged.n_registers == direct.n_registers
    # And the estimate tracks the true union cardinality (1500).
    assert abs(merged.est_distinct - 1500) / 1500 < 0.20

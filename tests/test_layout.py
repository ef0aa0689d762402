"""Physical-layout behaviors: partition pruning reaches the scan (X4),
predicate pushdown reaches parquet (X5), and dynamic partition
overwrite only rewrites touched partitions (X8)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_in_scan(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 1.0) for i in range(100)],
        ["id", "grp", "v"],
    )
    df.write.partitionBy("grp").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("grp") == "a")
    plan = _executed(scan)
    assert "PartitionFilters" in plan and "grp" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert scan.count() == 50


def test_predicate_pushdown_and_column_pruning(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.createDataFrame(
        [(i, f"s{i}", i * 1.0, i % 7) for i in range(100)],
        ["id", "s", "v", "k"],
    ).write.parquet(path)
    q = spark.read.parquet(path).filter(F.col("id") > 90).select("id", "v")
    plan = _executed(q)
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThan(id,90)" in pushed
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "s:" not in read_schema and "k:" not in read_schema  # pruned
    assert q.count() == 9


def test_dynamic_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "grp"]
    )
    base.write.partitionBy("grp").parquet(path)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Overwrite ONLY partition grp=a; grp=b must survive.
        spark.createDataFrame([(10, "a"), (11, "a")], ["id", "grp"]).write.mode(
            "overwrite"
        ).partitionBy("grp").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {(r.id, r.grp) for r in spark.read.parquet(path).collect()}
    assert got == {(10, "a"), (11, "a"), (2, "b")}

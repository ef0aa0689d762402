"""Sink + catalog surface tests (K2/K3/K5/K6/K7/K8, R2) and file-source
surfaces (S4/P9/X6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.sinks import (
    create_namespace,
    create_or_replace_table,
    describe_tables,
    export_single_parquet,
    insert_ignore,
    save_as_table,
)
from scalable_etl_spark.sources import read_json_glob, read_parquet_glob


@pytest.fixture()
def df3(spark):
    return spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], ["id", "val", "part"]
    )


def test_create_or_replace_table_v2(spark, df3):
    create_namespace(spark, "wh_test")
    create_or_replace_table(
        df3, "wh_test.t1", partition_cols=["part"],
        properties={"format-version": "2"},
    )
    got = spark.table("wh_test.t1")
    assert got.count() == 3
    # Replace with different content — createOrReplace semantics (K2/K3).
    create_or_replace_table(df3.filter("id = 1"), "wh_test.t1")
    assert spark.table("wh_test.t1").count() == 1
    spark.sql("DROP TABLE wh_test.t1")


def test_save_as_table_and_describe(spark, df3):
    create_namespace(spark, "wh_test")
    save_as_table(df3, "wh_test.t2", partition_cols=["part"])
    info = describe_tables(spark, "wh_test")
    assert "wh_test.t2" in info
    cols = {r.col_name for r in info["wh_test.t2"].collect()}
    assert {"id", "val", "part"} <= cols
    spark.sql("DROP TABLE wh_test.t2")


def test_insert_ignore_on_conflict_do_nothing(spark, df3):
    create_namespace(spark, "wh_test")
    spark.sql("DROP TABLE IF EXISTS wh_test.t3")
    # Initial load inserts all 3; key = id.
    assert insert_ignore(spark, "wh_test.t3", df3, ["id"]) == 3
    # Conflicting batch: ids 2,3 exist -> only 4 inserted; the batch's
    # own internal duplicate of 4 collapses to one row.
    batch = spark.createDataFrame(
        [(2, "dup", "x"), (4, "new", "y"), (4, "new2", "y")],
        ["id", "val", "part"],
    )
    assert insert_ignore(spark, "wh_test.t3", batch, ["id"]) == 1
    t = spark.table("wh_test.t3")
    assert t.count() == 4
    assert t.filter("id = 2 AND val = 'dup'").count() == 0  # DO NOTHING
    spark.sql("DROP TABLE wh_test.t3")


def test_export_single_parquet(spark, df3, tmp_path):
    out = str(tmp_path / "export")
    export_single_parquet(df3, out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1  # K5/R2: exactly one data file
    assert spark.read.parquet(out).count() == 3


def test_parquet_glob_and_recursive(spark, df3, tmp_path):
    df3.filter("id = 1").write.parquet(str(tmp_path / "d1" / "inner"))
    df3.filter("id > 1").write.parquet(str(tmp_path / "d2" / "inner"))
    got = read_parquet_glob(
        spark, str(tmp_path), glob="*.parquet", recursive=True
    )
    assert got.count() == 3


def test_ignore_corrupt_files(spark, df3, tmp_path):
    base = tmp_path / "mix"
    df3.write.parquet(str(base))
    # Drop a corrupt "parquet" file into the directory.
    with open(base / "part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")
    with pytest.raises(Exception):
        spark.read.parquet(str(base)).count()
    got = read_parquet_glob(spark, str(base), ignore_corrupt=True)
    assert got.count() == 3


def test_json_glob_filter(spark, tmp_path):
    from scalable_etl_spark.schemas import LISTEN_SCHEMA

    import json

    rec = {
        "listened_at": 1000,
        "recording_msid": "m1",
        "user_name": "u",
        "track_metadata": {"track_name": "t", "artist_name": "a",
                           "release_name": None, "additional_info": {}},
    }
    with open(tmp_path / "good.jsonl", "w") as f:
        f.write(json.dumps(rec) + "\n")
    with open(tmp_path / "skip.txt", "w") as f:
        f.write("not json\n")
    got = read_json_glob(spark, str(tmp_path), LISTEN_SCHEMA, glob="*.jsonl")
    assert got.count() == 1

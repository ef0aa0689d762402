"""Medallion bronze->silver->gold end-to-end on a tiny listens fixture:
duplicates across files, one malformed line, null track fields.

Mirrors the reference pipeline semantics (src/jobs/ingest_job.py +
transform_job.py) with the deterministic tiebreaks documented in
medallion.py.
"""

from __future__ import annotations

import json

import pytest

from scalable_etl_spark.medallion import run_medallion

LISTENS = [
    # user alice: 3 listens on 2024-01-01 (one duplicated ts), 1 on 01-02
    {"listened_at": 1704103200, "recording_msid": "m1", "user_name": "alice",
     "track_metadata": {"track_name": "Song A", "artist_name": "X",
                        "release_name": "R1", "additional_info": {}}},
    {"listened_at": 1704103200, "recording_msid": "m0", "user_name": "alice",
     "track_metadata": {"track_name": "Song A dup", "artist_name": "X",
                        "release_name": None, "additional_info": {}}},
    {"listened_at": 1704106800, "recording_msid": "m2", "user_name": "alice",
     "track_metadata": {"track_name": "Song B", "artist_name": "Y",
                        "release_name": None, "additional_info": {}}},
    {"listened_at": 1704189600, "recording_msid": "m3", "user_name": "alice",
     "track_metadata": {"track_name": "Song C", "artist_name": None,
                        "release_name": None, "additional_info": {}}},
    # user bob: 1 listen
    {"listened_at": 1704103260, "recording_msid": "m4", "user_name": "bob",
     "track_metadata": {"track_name": "Song D", "artist_name": "Z",
                        "release_name": "R2", "additional_info": {}}},
]


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("medallion")
    src = root / "in"
    src.mkdir()
    with open(src / "listens1.jsonl", "w") as f:
        for rec in LISTENS[:3]:
            f.write(json.dumps(rec) + "\n")
        f.write("{this is not json\n")  # malformed -> DROPMALFORMED
    with open(src / "listens2.jsonl", "w") as f:
        for rec in LISTENS[3:]:
            f.write(json.dumps(rec) + "\n")
    wh = root / "wh"
    counts = run_medallion(spark, str(src), str(wh))
    return spark, str(wh), counts


def test_layer_counts(warehouse):
    _, _, counts = warehouse
    assert counts == {"bronze": 5, "silver": 4, "gold": 3}
    # bronze: malformed line dropped; silver: alice's duplicate ts
    # collapsed; gold: top-3 days -> alice has 2 days, bob 1.


def test_silver_dedup_winner_deterministic(warehouse):
    spark, wh, _ = warehouse
    silver = spark.read.parquet(f"{wh}/silver_listens")
    dup = silver.filter(
        (silver.user_name == "alice") & (silver.listened_at == 1704103200)
    ).collect()
    assert len(dup) == 1
    assert dup[0].recording_msid == "m0"  # min msid wins (asc_nulls_last)


def test_silver_time_dims(warehouse):
    spark, wh, _ = warehouse
    silver = spark.read.parquet(f"{wh}/silver_listens")
    row = silver.filter(silver.recording_msid == "m3").first()
    assert (row.year, row.month, row.day) == (2024, 1, 2)
    assert str(row.listened_date) == "2024-01-02"


def test_gold_user_peaks(warehouse):
    spark, wh, _ = warehouse
    gold = spark.read.parquet(f"{wh}/gold_user_peaks")
    alice = {
        str(r.listened_date): (r.listen_count, r.unique_tracks)
        for r in gold.filter(gold.user_name == "alice").collect()
    }
    assert alice == {"2024-01-01": (2, 2), "2024-01-02": (1, 1)}


def test_bronze_partitioned_by_user(warehouse):
    import os

    _, wh, _ = warehouse
    parts = {
        d for d in os.listdir(f"{wh}/bronze_listens") if d.startswith("user_name=")
    }
    assert parts == {"user_name=alice", "user_name=bob"}

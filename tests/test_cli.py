"""Lifecycle CLI tests: ingest (batch + stream) -> transform -> daily ->
report, in-process via cli.main (same SparkSession via getOrCreate)."""

from __future__ import annotations

import json

import pytest

from scalable_etl_spark.cli import main


@pytest.fixture(scope="module")
def listens_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_in")
    recs = [
        {"listened_at": 1704103200 + i * 3600, "recording_msid": f"m{i}",
         "user_name": "alice" if i % 2 else "bob",
         "track_metadata": {"track_name": f"T{i}", "artist_name": "A",
                            "release_name": None, "additional_info": {}}}
        for i in range(6)
    ]
    with open(d / "listens.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return str(d)


def _run(capsys, *argv):
    assert main(list(argv)) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_full_lifecycle(spark, listens_dir, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    out = _run(capsys, "ingest", "--in", listens_dir, "--warehouse", wh)
    assert out == {"bronze_rows": 6}

    # Unique ts -> no silver dupes; gold = top listening DAYS per user,
    # and all events land on 2024-01-01 -> one row per user.
    out = _run(capsys, "transform", "--warehouse", wh)
    assert out == {"silver_rows": 6, "gold_rows": 2}

    daily_out = str(tmp_path / "daily")
    out = _run(capsys, "daily", "--warehouse", wh, "--out", daily_out)
    assert out == {"days": 1}  # all events on 2024-01-01

    report = _run(capsys, "report", "--warehouse", wh)
    assert set(report) == {"bronze_listens", "silver_listens", "gold_user_peaks"}
    assert report["silver_listens"]["rows"] == 6
    assert any(c.startswith("hour:") for c in report["silver_listens"]["schema"])


def test_stream_ingest_cli(spark, listens_dir, tmp_path, capsys):
    wh = str(tmp_path / "whs")
    out = _run(capsys, "ingest", "--in", listens_dir, "--warehouse", wh,
               "--stream")
    assert out == {"bronze_rows": 6}
    # Second run: checkpoint makes it a no-op, not a duplication.
    out = _run(capsys, "ingest", "--in", listens_dir, "--warehouse", wh,
               "--stream")
    assert out == {"bronze_rows": 6}


def test_registry_contract():
    """Driver-contract invariants: every registered query has a full
    value-hash oracle, and the driver-graded window (first 50 entries,
    dict insertion order) spans every SURVEY §2 family — core, SQL
    text, sources, sinks, streaming. COVERAGE.md's counts must match."""
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) == 151, f"registry has {len(q)} queries; update COVERAGE.md"
    assert set(o) == set(q), "every query needs an oracle (none rows-only)"
    graded = list(q)[:50]
    for prefix in ("sql_", "source_", "sink_", "streaming_"):
        assert any(n.startswith(prefix) for n in graded), (
            f"driver-graded window lost the {prefix}* family"
        )
    # The window IS the explicit rotation list: exactly 50 real names.
    assert len(e._WINDOW) == 50
    assert len(set(e._WINDOW)) == 50
    assert list(e._WINDOW) == graded
    missing = [n for n in e._WINDOW if n not in q]
    assert not missing, f"window names not in registry: {missing}"
    # Rotation hygiene (verdict r14 #3/#4): the window must contain
    # every STALEST query — nothing outside it may have an older last
    # driver-green round than the newest one inside it (derived from
    # CORRECTNESS files, never hand-tracked).
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from grading_rounds import last_green_rounds

    greens = last_green_rounds()
    outside_rounds = {
        n: greens.get(n, 0) for n in q if n not in set(e._WINDOW)
    }
    stalest_outside = min(outside_rounds.values())
    inside_max = max(greens.get(n, 0) for n in e._WINDOW)
    assert stalest_outside >= inside_max or stalest_outside >= 13, (
        "a query outside the window is staler than the window's "
        f"newest member: {sorted(outside_rounds.items(), key=lambda kv: kv[1])[:5]}"
    )


def test_stream_sink_cli(spark, listens_dir, tmp_path, capsys):
    """`stream-sink` drains the NDJSON stream into an ACID snapshot
    table via foreachBatch + txn ledger; a re-run replays nothing (the
    checkpoint short-circuits) and a checkpoint wipe + re-run is
    ledger-skipped — exactly-once either way."""
    import shutil

    wh = str(tmp_path / "whx")
    out = _run(capsys, "stream-sink", "--in", listens_dir,
               "--warehouse", wh)
    assert out == {"table_version": 0, "rows": 6}
    out = _run(capsys, "stream-sink", "--in", listens_dir,
               "--warehouse", wh)
    assert out["rows"] == 6
    shutil.rmtree(f"{wh}/_checkpoints/bronze_tx")
    out = _run(capsys, "stream-sink", "--in", listens_dir,
               "--warehouse", wh)
    assert out["rows"] == 6, "replayed batches must be ledger-skipped"


def test_convert_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(i, f"d{i % 2}") for i in range(8)], "k INT, day STRING"
    ).write.partitionBy("day").parquet(src)
    out = _run(capsys, "convert", "--src", src,
               "--table", str(tmp_path / "t"),
               "--partition-cols", "day", "--stats-cols", "k")
    assert out["table_version"] == 0 and out["entries"] == 2
    assert out["files"] >= 2


def test_table_admin_cli(spark, tmp_path, capsys):
    """table admin loop: convert -> history -> mistake -> restore ->
    partition-scoped compact -> vacuum, all through the CLI."""
    src = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(i, f"d{i % 2}") for i in range(8)], "k INT, day STRING"
    ).write.partitionBy("day").parquet(src)
    root = str(tmp_path / "t")
    _run(capsys, "convert", "--src", src, "--table", root,
         "--partition-cols", "day")
    from scalable_etl_spark.acid import SnapshotTable

    from pyspark.sql import functions as F

    t = SnapshotTable(spark, root)
    t.delete(F.col("day") == "d1")
    out = _run(capsys, "table", "history", "--root", root)
    assert [h["op"] for h in out["history"]] == ["delete", "convert"]
    out = _run(capsys, "table", "restore", "--root", root,
               "--version", "0")
    assert out == {"restored_to": 0, "committed_version": 2}
    assert t.read().count() == 8
    out = _run(capsys, "table", "compact", "--root", root,
               "--partition", "day=d1")
    assert out["compacted"] is True
    out = _run(capsys, "table", "vacuum", "--root", root,
               "--retain", "1", "--min-age", "0")
    assert out["removed_dirs"] >= 1
    assert t.read().count() == 8


def test_table_alter_cli(spark, tmp_path, capsys):
    """table add-column / rename-column: write-side ALTER through the
    CLI (metadata-only; default is cast to the declared type)."""
    from pyspark.sql import functions as F  # noqa: F401

    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(1, "a")], "id INT, v STRING"))
    out = _run(capsys, "table", "add-column", "--root", root,
               "--column", "score", "--type", "bigint",
               "--default", "9")
    assert out == {"added": "score", "committed_version": 1}
    out = _run(capsys, "table", "rename-column", "--root", root,
               "--column", "v", "--to", "label")
    assert out == {"renamed": "v", "to": "label",
                   "committed_version": 2}
    row = t.read().collect()[0]
    assert (row.id, row.label, row.score) == (1, "a", 9)
    out = _run(capsys, "table", "drop-column", "--root", root,
               "--column", "label")
    assert out == {"dropped": "label", "committed_version": 3}
    assert set(t.read().columns) == {"id", "score"}
    out = _run(capsys, "table", "widen-column", "--root", root,
               "--column", "id", "--type", "bigint")
    assert out == {"widened": "id", "to_type": "bigint",
                   "committed_version": 4}
    sch = {f.name: f.dataType.simpleString()
           for f in t.read().schema.fields}
    assert sch["id"] == "bigint"
    assert {r.id for r in t.read().collect()} == {1}


def test_table_constraint_cli(spark, tmp_path, capsys):
    """table add-constraint / drop-constraint through the CLI."""
    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(1, 5)], "id INT, v INT"))
    out = _run(capsys, "table", "add-constraint", "--root", root,
               "--name", "v_pos", "--expr", "v > 0")
    assert out == {"constraint": "v_pos", "committed_version": 1}
    assert t.constraints() == {"v_pos": "v > 0"}
    out = _run(capsys, "table", "drop-constraint", "--root", root,
               "--name", "v_pos")
    assert out == {"dropped_constraint": "v_pos",
                   "committed_version": 2}
    assert t.constraints() == {}


def test_table_property_cli(spark, tmp_path, capsys):
    """table set-property / unset-property through the CLI: the
    enableChangeDataFeed knob turns on CDC row-image recording for
    the next rewrite commit."""
    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    out = _run(capsys, "table", "set-property", "--root", root,
               "--name", "enableChangeDataFeed", "--value", "true")
    assert out == {"property": "enableChangeDataFeed",
                   "committed_version": 1}
    t.delete("k = 1")  # records images now
    assert {
        (r.k, r._change_type)
        for r in t.table_changes(1, change_feed=True).collect()
    } == {(1, "delete")}
    out = _run(capsys, "table", "unset-property", "--root", root,
               "--name", "enableChangeDataFeed")
    assert out["unset_property"] == "enableChangeDataFeed"
    assert t.properties() == {}


def test_table_delete_cli(spark, tmp_path, capsys):
    """`table delete` drives both DML modes: merge-on-read records a
    deletion vector (dirs untouched), copy-on-write rewrites; a
    no-match delete reports deleted=False without committing."""
    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(i,) for i in range(10)], "k INT"))
    out = _run(capsys, "table", "delete", "--root", root,
               "--predicate", "k % 3 = 0", "--mode", "merge-on-read")
    assert out["deleted"] is True and out["mode"] == "merge-on-read"
    assert t._manifest(out["committed_version"]).get("dv")
    assert t.read().count() == 6
    out = _run(capsys, "table", "delete", "--root", root,
               "--predicate", "k = 999")
    assert out["deleted"] is False
    out = _run(capsys, "table", "delete", "--root", root,
               "--predicate", "k = 1")
    assert out["deleted"] is True and t.read().count() == 5


def test_table_reorg_cli(spark, tmp_path, capsys):
    """`table reorg` purges deletion vectors / stale column bytes
    (REORG APPLY PURGE); a clean table reports reorged=False."""
    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(i,) for i in range(6)], "k INT"))
    t.delete("k = 2", mode="merge-on-read")
    out = _run(capsys, "table", "reorg", "--root", root)
    assert out["reorged"] is True
    assert not t._manifest(out["version"]).get("dv")
    assert t.read().count() == 5
    out = _run(capsys, "table", "reorg", "--root", root)
    assert out["reorged"] is False


def test_table_clone_cli(spark, tmp_path, capsys):
    """`table clone` branches a snapshot zero-copy to --target."""
    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(i,) for i in range(6)], "k INT"))
    target = str(tmp_path / "branch")
    out = _run(capsys, "table", "clone", "--root", root,
               "--target", target)
    assert out["rows"] == 6 and out["from_version"] == 0
    c = SnapshotTable(spark, target)
    c.delete("k < 3")
    assert c.read().count() == 3 and t.read().count() == 6


def test_table_sync_cli_by_row_id(spark, tmp_path, capsys):
    """`table sync --by-row-id` replicates a tracked source into an
    untracked replica keyed on stable row ids; a re-run no-ops
    (exactly-once ledger); `delete-rows --ids-from` applies a parquet
    drop list as a DataFrame."""
    from scalable_etl_spark.acid import SnapshotTable

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    src = SnapshotTable(spark, src_root)
    src.overwrite(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "k INT, v STRING"
        )
    )
    src.enable_row_tracking()
    src.enable_change_data_feed()
    out = _run(capsys, "table", "--root", src_root, "sync",
               "--target", dst_root, "--by-row-id")
    assert out["by_row_id"] is True and out["synced_src_version"] >= 0
    dst = SnapshotTable(spark, dst_root)
    assert "_row_id" in dst.read().columns
    assert dst.read().count() == 8
    # a parquet drop list applies without collecting
    drop_path = str(tmp_path / "drop.parquet")
    src.read(with_row_ids=True).filter("k >= 6").select(
        "_row_id"
    ).write.parquet(drop_path)
    out2 = _run(capsys, "table", "--root", src_root, "delete-rows",
                "--ids-from", drop_path)
    assert out2["requested"] == 2 and out2["deleted"] is True
    assert src.read().count() == 6
    # the replica follows through the recorded delete images
    out3 = _run(capsys, "table", "--root", src_root, "sync",
                "--target", dst_root, "--by-row-id")
    assert out3["synced_src_version"] > out["synced_src_version"]
    assert dst.read().count() == 6


def test_table_delete_in_cli(spark, tmp_path, capsys):
    """`table delete-in --column --values-from` retracts derived rows
    by foreign key from a parquet values list."""
    from scalable_etl_spark.acid import SnapshotTable

    root = str(tmp_path / "fk")
    t = SnapshotTable(spark, root)
    t.overwrite(
        spark.createDataFrame(
            [(k, b) for k in range(6) for b in range(2)],
            "rid INT, band INT",
        )
    )
    vals = str(tmp_path / "vals.parquet")
    spark.createDataFrame([(1,), (4,)], "rid INT").write.parquet(vals)
    out = _run(capsys, "table", "--root", root, "delete-in",
               "--column", "rid", "--values-from", vals)
    assert out["deleted"] is True
    assert sorted({r.rid for r in t.read().collect()}) == [0, 2, 3, 5]

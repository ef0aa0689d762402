"""Streaming CHANGE DATA FEED source over snapshot tables.

``sink_tx_changes`` exposes the batch CDF (``table_changes``); a
training-data pipeline wants to CONSUME changes incrementally — the
table-level dual of the reference's ledger-driven incremental ingest
(reference src/jobs/ingest_job.py:59-88, "process only what changed").
This module makes a :class:`~scalable_etl_spark.acid.SnapshotTable`'s
commit log a FIRST-CLASS Structured Streaming source via PySpark's
Python Data Source API:

    spark.dataSource.register(SnapshotChangesSource)
    df = (spark.readStream.format("snapshot_changes")
          .option("path", table.root)
          .option("maxVersionsPerBatch", 1)
          .load())

Semantics (Delta CDF's append path / Iceberg incremental read):

- **Offsets are commit versions.** ``{"version": N}`` means every
  commit <= N has been delivered; Spark's checkpoint persists them, so
  a restarted stream resumes exactly after the last committed batch —
  replay-safe by construction (the commit log is immutable). Log
  retention applies like Delta's: a stream resuming from an offset
  whose MANIFEST ``vacuum`` deleted fails loudly on the missing file;
  data dirs vacuum reclaimed belong to rewrite-superseded versions,
  which are only reachable under ``ignoreChanges=true`` (that mode's
  documented re-delivery caveats apply).
- **Versions as micro-batches.** ``maxVersionsPerBatch`` (default 0 =
  unthrottled) rate-limits offset advancement on CONTINUOUS triggers
  (processingTime), where Spark polls ``latestOffset`` every trigger —
  each micro-batch then carries the rows of a bounded number of
  commits, in commit order. Leave it unset for ``availableNow``
  drains: the Python data-source wrapper pins the available end at the
  run's single ``latestOffset`` call, so a throttle there would strand
  pending versions until the next run. Either way every delivered row
  carries ``_commit_version``, so a consumer applies changes in exact
  commit order by grouping on it inside ``foreachBatch`` — the
  deterministic CDC-apply pattern independent of batch packing.
- **Rewrite commits** (same contract as
  ``SnapshotTable.table_changes``): with ``readChangeFeed=true``, a
  MERGE / DELETE / UPDATE committed while the table's
  ``enableChangeDataFeed`` property was on delivers its RECORDED row
  images (``_change_type`` in update_preimage / update_postimage /
  insert / delete) from the commit's ``_change_data`` files — exact
  history, Delta-CDF parity; compaction (``dataChange=false``) is
  invisible. Without recorded images a rewrite in range still
  raises; ``ignoreChanges=true`` opts into re-delivery (Delta's
  documented contract — consumers dedup downstream). Re-delivered
  superseded entries canonicalize under whatever evolution records
  the LATEST manifest still carries for them, so re-delivery is
  best-effort — consumers needing exact images enable the property.
  A consumer applying versions in commit order (last-wins per key)
  converges to the current snapshot either way.
- **Schema is pinned at stream start** (+ ``_commit_version long``),
  and every delivered row is CANONICALIZED to it exactly the way a
  batch ``read()`` canonicalizes old entries — renames mapped forward,
  widened types cast, ALTER defaults filled, absent columns NULL — so
  a consumer mirroring the feed reconstructs precisely the current
  snapshot. Historical versions therefore stream fine across past
  ALTERs; an ALTER committed AFTER stream start changes the live
  schema away from the pinned one and delivery stops at it with a loud
  error telling the operator to restart the stream — Delta streaming's
  exact behavior on schema change.

Scale shape: offset resolution and per-version planning happen
driver-side over O(dirs-per-commit) manifest metadata (never row
data); each data FILE becomes one input partition, read executor-side
straight into Arrow RecordBatches (pyarrow, no Python row loop).
Partition-path values and ALTER default fills are reconstructed from
the manifest recipe per entry, so delivered rows are identical to
``table_changes``'s canonicalized frames.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# ops whose new dirs hold exactly the added rows (mirrors
# table_changes' append_ops). The ALTER verbs qualify too: they add
# zero dirs, and the live-schema pin check (above the op gate in
# partitions()) is what stops a stream at a post-start ALTER — past
# ALTERs simply canonicalize into the pinned schema.
_APPEND_OPS = frozenset(
    {"append", "insert_ignore", "stream_append", "sync",
     "add_bloom_filters", "alter_add_column", "alter_rename_column",
     "alter_drop_column", "alter_widen_column", "add_constraint",
     "drop_constraint", "set_property", "unset_property",
     "advance_txn"}
)
_METADATA_ONLY_OPS = frozenset(
    {"add_bloom_filters", "set_property", "unset_property",
     "advance_txn"}
)

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# ALTER records carry Spark simpleString type names ("int", "bigint");
# schema JSON carries the long names ("integer", "long") — one
# vocabulary for the recipe builder.
_SIMPLE_TO_JSON = {
    "int": "integer",
    "bigint": "long",
    "smallint": "short",
    "tinyint": "byte",
}


def _trace(*parts):
    """Protocol trace for debugging the offset dance (the reader runs
    in Spark's python_streaming_source_runner subprocess, invisible to
    the driver): set SNAPSHOT_CDF_TRACE=/path to enable."""
    dst = os.environ.get("SNAPSHOT_CDF_TRACE")
    if dst:
        with open(dst, "a") as fh:
            print(*parts, file=fh, flush=True)


def _arrow_type(spark_type: str):
    """pyarrow type for a Spark JSON-schema primitive type name —
    needed only for columns the FILE doesn't carry (partition values,
    default fills, null fills, _commit_version); physical columns come
    out of the parquet file with the right Arrow type already."""
    import pyarrow as pa

    m = {
        "byte": pa.int8(),
        "short": pa.int16(),
        "integer": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    got = m.get(spark_type)
    if got is None:
        from ..acid import _decimal_params

        dec = _decimal_params(spark_type)
        if dec:
            return pa.decimal128(*dec)
        raise ValueError(
            f"snapshot_changes cannot synthesize column type "
            f"{spark_type!r} outside parquet files (partition / "
            "default-fill / absent columns must be primitive)"
        )
    return got


def _const(pa, val, spark_type: str, n: int):
    """Length-``n`` constant column without an O(rows) Python list:
    pa.repeat materializes the run C++-side (NULL constants come from
    pa.nulls)."""
    tp = _arrow_type(spark_type)
    if val is None:
        return pa.nulls(n, type=tp)
    return pa.repeat(pa.scalar(val, type=tp), n)


def _py_value(raw: str, spark_type: str):
    """Partition-path string -> Python value of the declared type."""
    if raw == _HIVE_NULL:
        return None
    if spark_type in ("byte", "short", "integer", "long"):
        return int(raw)
    if spark_type in ("float", "double"):
        return float(raw)
    if spark_type == "boolean":
        return raw.lower() == "true"
    if spark_type == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if spark_type.startswith("decimal("):
        import decimal

        return decimal.Decimal(raw)
    if spark_type in ("timestamp", "timestamp_ntz"):
        # Timestamp partition values reach here as strings (the batch
        # write path renders them via Java/session-tz formatting —
        # 'yyyy-MM-dd HH:mm:ss[.f]', ISO-parseable), and ALTER default
        # fills as their manifest-JSON string form. A raw string would
        # hit pa.scalar(str, pa.timestamp(...)) -> ArrowTypeError
        # executor-side; parse here instead, raising the module's
        # explicit error on unparseable input.
        import datetime

        try:
            dt = datetime.datetime.fromisoformat(raw)
        except ValueError:
            raise ValueError(
                f"snapshot_changes cannot parse {raw!r} as "
                f"{spark_type} (partition / default-fill values must "
                "be ISO-8601)"
            ) from None
        if spark_type == "timestamp" and dt.tzinfo is None:
            # Session tz is pinned to UTC (session.py); tz-aware
            # arrow storage needs an aware datetime.
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        elif spark_type == "timestamp_ntz" and dt.tzinfo is not None:
            dt = dt.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        return dt
    return raw  # string et al.


class _FilePartition(InputPartition):
    """One data file + the recipe reconstructing its logical columns.

    ``fields``: one tuple per pinned logical column, in declared
    order (without _commit_version):
    ``(logical_name, logical_type, physical_name, physical_type,
    fill_value)`` — the same per-entry canonicalization the batch
    ``read()`` derives via ``_physical_schema`` / ``_apply_evolution``
    / ``_default_fill``, precomputed driver-side so the executor needs
    only pyarrow. ``part_values``: {col: raw_path_string} parsed from
    the entry's hive components.

    ``change_type``: None when the stream doesn't read the change
    feed; ``"__file__"`` when the file physically carries
    ``_change_type`` (a commit's _change_data file); otherwise the
    constant to tag every row with (``"insert"`` for append commits
    under readChangeFeed).

    ``ts``: the commit's manifest timestamp (epoch seconds), emitted
    as ``_commit_timestamp`` under readChangeFeed; None otherwise.

    ``dv_paths`` / ``rel``: deletion-vector sidecar dirs covering this
    file's entry plus the file's data_dir-relative path — rows whose
    position appears in a sidecar under ``rel`` are suppressed at
    read (the batch read()'s anti-join, done here as a pyarrow mask).
    """

    def __init__(self, path, version, fields, part_values,
                 change_type=None, ts=None, dv_paths=None, rel=None,
                 rid_base=None, rid_phys=False, rid_file=False):
        self.path = path
        self.version = version
        self.fields = fields
        self.part_values = part_values
        self.change_type = change_type
        self.ts = ts
        self.dv_paths = dv_paths
        self.rel = rel
        # row-id delivery (withRowIds=true): ``rid_base`` = this
        # file's base_row_id from ITS version's manifest (derived id
        # = base + original file position, computed BEFORE deletion-
        # vector suppression); ``rid_phys`` = the file belongs to a
        # row_mat entry and physically carries a _row_id column that
        # wins over the derived spelling; ``rid_file`` = a recorded
        # change-image file whose captured _row_id column delivers
        # as-is.
        self.rid_base = rid_base
        self.rid_phys = rid_phys
        self.rid_file = rid_file


class SnapshotChangesReader(DataSourceStreamReader):
    def __init__(self, options, schema_fields):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("snapshot_changes requires option 'path'")
        self.since = int(options.get("sinceversion", -1))
        since_ts = options.get("sincetimestamp")
        if since_ts is not None:
            if "sinceversion" in options:
                raise ValueError(
                    "snapshot_changes: pass sinceVersion OR "
                    "sinceTimestamp, not both"
                )
            # Delta startingTimestamp semantics: the first delivered
            # commit is the EARLIEST one at-or-after the timestamp.
            # version_as_of gives the LATEST at-or-before — under tied
            # or interleaved wall clocks several commits can share ts,
            # so walk DOWN across every commit still >= ts instead of
            # probing just one.
            from ..acid import _ts_to_epoch

            t = self._table()
            ts_norm = _ts_to_epoch(since_ts)
            try:
                start = t.version_as_of(ts_norm)
            except FileNotFoundError:
                # empty/not-yet-created table: wait for genesis, same
                # as the sinceVersion path's latestOffset handling
                self.since = -1
            except ValueError as exc:
                if "predates the table's first commit" not in str(exc):
                    raise  # below vacuum retention: keep the clear error
                self.since = -1  # predates genesis: deliver everything
            else:
                while start >= 0:
                    try:
                        t_v = float(
                            t._manifest_raw(start)["timestamp"]
                        )
                    except FileNotFoundError:
                        break  # vacuumed below: earliest resolvable
                    if t_v < ts_norm:
                        break
                    start -= 1
                self.since = start
        self.max_versions = int(options.get("maxversionsperbatch", 0))
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.change_feed = (
            str(options.get("readchangefeed", "false")).lower() == "true"
        )
        # withRowIds=true: every delivered row carries the source
        # table's stable _row_id (requires row tracking over the
        # whole streamed range — mirrors table_changes'
        # with_row_ids contract, including the raise on versions
        # whose manifests carry no base map)
        self.with_row_ids = (
            str(options.get("withrowids", "false")).lower() == "true"
        )
        # Delta's failOnDataLoss contract: default loud — a stream
        # resuming from an offset whose manifest vacuum deleted fails;
        # =false skips forward to the oldest resolvable version and
        # re-delivers its FULL snapshot (tagged insert) with a logged
        # gap marker, then continues incrementally.
        self.fail_on_data_loss = (
            str(options.get("failondataloss", "true")).lower() != "false"
        )
        # [(name, type_name)] minus the appended _commit_version
        self._fields = schema_fields
        # rate-limit cursor: the highest end offset this reader has
        # handed out or seen planned. None right after (re)start — the
        # first latestOffset() then delivers everything pending in one
        # catch-up batch (correct, just unthrottled; availableNow
        # drains always take this path because Spark snapshots the end
        # offset up front), and throttling resumes from there.
        # partitions() re-syncs it to the authoritative batch range so
        # the cursor can never regress below an offset Spark already
        # committed (initialOffset may be called AFTER latestOffset on
        # a fresh stream; a WAL-replayed batch calls partitions()
        # without any latestOffset at all).
        self._cursor: int | None = None
        # {version: dead-name | None} memo for _dead_names_after —
        # per-version alter probes survive the _mcache eviction below
        self._alter_dead: dict[int, str | None] = {}

    def _dead_names_after(self, t, v: int) -> set:
        """Names a DROP or RENAME commit in ``(v, latest]`` kills for
        row images recorded at ``v``: the name-only drift guards pass
        when the name was later RE-ADDED (drop + compact + add, or
        rename + add under the old spelling), which would silently
        serve the OLD column's bytes as the new column. Each alter
        commit's own manifest is immutable and carries its evolution
        record last, so this survives compaction pruning the records
        from later manifests."""
        latest = t.latest_version()
        out: set = set()
        for u in range(v + 1, (latest or -1) + 1):
            if u not in self._alter_dead:
                try:
                    mu = t._manifest(u)
                except FileNotFoundError:
                    self._alter_dead[u] = None
                    continue
                if mu["op"] == "alter_drop_column":
                    self._alter_dead[u] = mu["evolution"][-1]["col"]
                elif mu["op"] == "alter_rename_column":
                    self._alter_dead[u] = mu["evolution"][-1]["from"]
                else:
                    self._alter_dead[u] = None
            if self._alter_dead[u]:
                out.add(self._alter_dead[u])
        return out

    # -- driver-side manifest access (no SparkSession needed: the
    # commit log resolves through SnapshotTable's pyarrow/JSON path).
    # ONE instance per reader: its per-version manifest memo (_mcache)
    # is safe — committed versions are immutable — and without it every
    # trigger would re-resolve the full chain (for checkpoint versions,
    # an O(files) sidecar parse per poll on a million-file table).
    def _table(self):
        if getattr(self, "_t", None) is None:
            from ..acid import SnapshotTable

            self._t = SnapshotTable(None, self.root)
        return self._t

    def initialOffset(self) -> dict:
        if self._cursor is None:
            self._cursor = self.since
        _trace("initialOffset ->", self.since)
        return {"version": self.since}

    def latestOffset(self) -> dict:
        latest = self._table().latest_version()
        latest = -1 if latest is None else latest
        if self._cursor is None or self.max_versions <= 0:
            self._cursor = max(latest, self._cursor or latest)
        else:
            self._cursor = max(
                self._cursor,
                min(latest, self._cursor + self.max_versions),
            )
        _trace("latestOffset ->", self._cursor)
        return {"version": self._cursor}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        known = self._cursor if self._cursor is not None else lo
        self._cursor = max(known, lo, hi)
        _trace("partitions", lo, hi, "cursor", self._cursor)
        if hi <= lo:
            return []
        t = self._table()
        latest = t.latest_version()
        m_latest = t._manifest(latest)
        live_fields = [
            (f["name"], _type_name(f["type"]))
            for f in json.loads(m_latest["schema"])["fields"]
        ]
        if live_fields != self._fields:
            raise RuntimeError(
                "snapshot_changes: the table schema changed after "
                "stream start (an ALTER commit); a streaming read "
                "pins its schema at start — restart the stream to "
                "pick up the new one (Delta streaming's schema-change "
                "contract)"
            )
        from ..acid import _hive_unescape_path

        evo_ctx = t._evolution_ctx(m_latest)
        parts: list[_FilePartition] = []
        append_tag = "insert" if self.change_feed else None
        prev: set | None
        prev_dv: dict = {}
        try:
            prev = set(
                t._manifest(lo)["dirs"] if lo >= 0 else ()
            )
            if lo >= 0:
                prev_dv = t._manifest(lo).get("dv", {})
        except FileNotFoundError:
            if self.fail_on_data_loss:
                raise RuntimeError(
                    f"snapshot_changes: offset version {lo} was "
                    "vacuumed below log retention; restart from a "
                    "fresh checkpoint, or pass failOnDataLoss=false "
                    "to skip to the oldest resolvable version "
                    "(re-delivers its full snapshot)"
                ) from None
            prev = None  # gap: next resolvable version delivers full
        for v in range(lo + 1, hi + 1):
            try:
                m = t._manifest(v)
                cur_dv = m.get("dv", {})
            except FileNotFoundError:
                if self.fail_on_data_loss:
                    raise RuntimeError(
                        f"snapshot_changes: version {v} was vacuumed "
                        "below log retention; restart from a fresh "
                        "checkpoint, or pass failOnDataLoss=false to "
                        "skip to the oldest resolvable version"
                    ) from None
                prev = None
                continue
            if prev is None:
                # DATA-LOSS GAP RECOVERY (failOnDataLoss=false): the
                # versions before v are unresolvable, so incremental
                # "new dirs" cannot be derived — deliver v's FULL
                # snapshot (every live dir, tagged insert) and resume
                # incrementally after it. Logged, never silent.
                _trace("DATA LOSS GAP: full snapshot at", v)
                import sys

                print(
                    f"snapshot_changes: data loss gap before v{v} "
                    f"(vacuumed log); re-delivering v{v}'s full "
                    "snapshot (failOnDataLoss=false)",
                    file=sys.stderr,
                )
                new_dirs = list(m["dirs"])
                prev = set(m["dirs"])
                prev_dv = cur_dv
                if not new_dirs:
                    continue
                pcols = {c for c in m.get("partition_cols", [])}
                self._plan_dirs(
                    t, m, v, new_dirs, pcols, evo_ctx, parts,
                    _hive_unescape_path, append_tag,
                    ts=(
                        float(m["timestamp"])
                        if self.change_feed
                        else None
                    ),
                )
                continue
            # v0 is table genesis: whatever op created it (overwrite /
            # convert), its dirs are exactly the initial rows — there
            # is no prior snapshot a "rewrite" could have mixed in
            if (
                m.get("data_change", True) is False
                and not self.ignore_changes
            ):
                # layout-only rewrite (compact, dataChange=false): no
                # logical change — invisible to the feed, so an
                # append-only or change-feed stream survives
                # compaction (Delta's skip-compaction contract).
                # Under ignoreChanges it still RE-DELIVERS like any
                # rewrite: compaction prunes superseded entries'
                # evolution records, so re-delivering the rewritten
                # copies is what keeps that mode's last-wins replay
                # converging to the live snapshot.
                prev = set(m["dirs"])
                prev_dv = cur_dv
                continue
            cdc = m.get("change_data")
            if v > 0 and m["op"] not in _APPEND_OPS:
                if self.change_feed and cdc is not None:
                    # recorded CDC row images: exact pre/post images,
                    # no re-delivery caveats — plan the commit's
                    # _change_data files instead of its dirs
                    prev = set(m["dirs"])
                    prev_dv = cur_dv
                    self._plan_change_files(t, m, v, cdc, parts)
                    continue
                if (
                    self.change_feed
                    and (
                        m["op"] == "overwrite"
                        or m["op"].startswith("restore_v")
                    )
                    and t._cdf_enabled(v)
                ):
                    # DERIVED images (Delta's add/remove-file CDF path
                    # — mirrors batch table_changes): removed-dir rows
                    # deliver as delete, added-dir rows as insert;
                    # shared dirs deliver nothing. Each leg plans with
                    # ITS manifest's evolution records (later rewrites
                    # prune dead entries from newer manifests).
                    m_prev = t._manifest(v - 1)
                    pinned_pairs = set(self._fields)
                    dead = self._dead_names_after(t, v - 1)
                    for leg_m in (m_prev, m):
                        leg_fields = {
                            (f["name"], _type_name(f["type"]))
                            for f in json.loads(leg_m["schema"])[
                                "fields"
                            ]
                        }
                        bad = sorted(
                            n
                            for (n, ty) in leg_fields
                            if (n, ty) not in pinned_pairs or n in dead
                        )
                        if bad:
                            raise RuntimeError(
                                f"snapshot_changes: version {v}'s "
                                f"derived change rows carry column(s) "
                                f"{bad!r} that a rename/drop/widen "
                                "postdates; start the stream after "
                                "the ALTER (sinceVersion)"
                            )
                    new_set = set(m["dirs"])
                    # a shared dir whose DELETION-VECTOR list changed
                    # (restore undoing/reinstating merge-on-read
                    # suppressions) joins BOTH legs — each leg plans
                    # with ITS manifest's dv sidecars, so the delete
                    # leg delivers the previously visible rows and
                    # the insert leg the now-visible ones
                    dv_prev = m_prev.get("dv", {})
                    dv_new = m.get("dv", {})
                    removed = [
                        d
                        for d in m_prev["dirs"]
                        if d not in new_set
                        or dv_prev.get(d) != dv_new.get(d)
                    ]
                    added = [
                        d
                        for d in m["dirs"]
                        if d not in prev
                        or dv_prev.get(d) != dv_new.get(d)
                    ]
                    self._plan_dirs(
                        t, m_prev, v, removed,
                        {c for c in m_prev.get("partition_cols", [])},
                        t._evolution_ctx(m_prev), parts,
                        _hive_unescape_path, "delete",
                        ts=float(m["timestamp"]),
                    )
                    self._plan_dirs(
                        t, m, v, added,
                        {c for c in m.get("partition_cols", [])},
                        t._evolution_ctx(m), parts,
                        _hive_unescape_path, "insert",
                        ts=float(m["timestamp"]),
                    )
                    prev = new_set
                    prev_dv = cur_dv
                    continue
                if not self.ignore_changes:
                    hint = (
                        "pass option readChangeFeed=true to read its "
                        "recorded row images, "
                        if cdc is not None
                        else "enable_change_data_feed() records row "
                        "images for future rewrites; for this one "
                    )
                    raise RuntimeError(
                        f"snapshot_changes: version {v} is "
                        f"op={m['op']!r} (a rewrite, not an append); "
                        f"{hint}pass option ignoreChanges=true to "
                        "re-deliver its rows, or diff the snapshots"
                    )
            # dv-only changes count as new under ignoreChanges (a
            # merge-on-read delete / restore re-delivers the dir's
            # now-visible rows — Delta re-adds the DV'd file); inert
            # for appends, which never change carried dirs' dv
            new_dirs = [
                d
                for d in m["dirs"]
                if d not in prev or prev_dv.get(d) != cur_dv.get(d)
            ]
            prev = set(m["dirs"])
            prev_dv = cur_dv
            if not new_dirs or m["op"] in _METADATA_ONLY_OPS:
                continue
            pcols = {c for c in m.get("partition_cols", [])}
            self._plan_dirs(
                t, m, v, new_dirs, pcols, evo_ctx, parts,
                _hive_unescape_path, append_tag,
                ts=(
                    float(m["timestamp"]) if self.change_feed else None
                ),
            )
        # Evict resolved manifests the stream has moved past: the
        # cached SnapshotTable's per-version memo would otherwise
        # accumulate one FULL O(files) state per delivered version for
        # the life of a continuous stream. Future resolutions anchor
        # at the most recent checkpoint, so keeping a two-checkpoint
        # trailing window preserves every resolution this reader can
        # still need.
        from ..acid import _CHECKPOINT_EVERY

        floor = hi - 2 * _CHECKPOINT_EVERY
        for vv in [v for v in t._mcache if v < floor]:
            del t._mcache[vv]
        return parts

    def _plan_dirs(
        self, t, m, v, new_dirs, pcols, evo_ctx, parts,
        hive_unescape, change_tag, ts=None,
    ):
        """Plan one commit's data dirs into _FilePartitions: per-entry
        canonicalization recipe from the LATEST manifest's evolution
        chain — the same physical-name / narrow-type / default-fill
        resolution the batch read() performs via _physical_schema /
        _apply_evolution / _default_fill, replicated WITHOUT pyspark
        type parsing (this runs in Spark's
        python_streaming_source_runner subprocess, which has no
        SparkContext for StructType.fromDDL)."""
        for d in new_dirs:
            # hive components of the entry path -> constant cols
            # (STRICT byte-wise %XX decode shared with the batch read
            # path — see the _hive_unescape_path rationale there)
            part_values = {}
            for comp in d.split("/")[1:]:
                k, _, raw = comp.partition("=")
                if k in pcols:
                    part_values[k] = hive_unescape(raw)
            pnames = [n for n, _ in self._fields]
            ptypes = [ty for _, ty in self._fields]
            evo = [rec for rec, ents in evo_ctx if d in ents]
            for rec in reversed(evo):
                if rec["op"] == "rename_column":
                    pnames = [
                        rec["from"] if n == rec["to"] else n
                        for n in pnames
                    ]
                elif rec["op"] == "widen_column":
                    narrow = _SIMPLE_TO_JSON.get(
                        rec["from_type"], rec["from_type"]
                    )
                    ptypes = [
                        narrow if n == rec["col"] else ty
                        for n, ty in zip(pnames, ptypes)
                    ]
            # physical names whose bytes a drop record covering
            # this entry invalidated: the file still carries them
            # (drop is metadata-only), but they must never serve a
            # same-named re-added column — the batch read drops
            # them via _apply_evolution; mirror that here (both
            # the drop-time logical spelling and its pre-rename
            # physical spelling are dead)
            dead: set = set()
            for i, rec in enumerate(evo):
                if rec["op"] != "drop_column":
                    continue
                dead.add(rec["col"])
                name = rec["col"]
                for earlier in reversed(evo[:i]):
                    if (
                        earlier["op"] == "rename_column"
                        and earlier["to"] == name
                    ):
                        name = earlier["from"]
                dead.add(name)
            fields = [
                (
                    lname,
                    ltype,
                    pname,
                    ptype,
                    t._default_fill(evo_ctx, d, lname),
                )
                for (lname, ltype), pname, ptype in zip(
                    self._fields, pnames, ptypes
                )
            ]
            if dead:
                fields = [
                    (ln, lt, None if pn in dead else pn, pt, fl)
                    for ln, lt, pn, pt, fl in fields
                ]
            dv_paths = [
                os.path.join(t.dv_dir, u)
                for u in m.get("dv", {}).get(d, [])
            ] or None
            rid_bases = None
            rid_phys = False
            if self.with_row_ids:
                if "row_bases" not in m:
                    raise RuntimeError(
                        f"snapshot_changes: version {v} carries no "
                        "row-id base map (tracking was not enabled — "
                        "or was disabled — at that version): its "
                        "rows have no ids; start the stream after "
                        "it (sinceVersion) or drop withRowIds"
                    )
                rid_bases = m["row_bases"].get(d, {})
                rid_phys = d in set(m.get("row_mat", []))
            base = os.path.join(t.data_dir, d)
            for walk_root, _sub, files in os.walk(base):
                for fn in sorted(files):
                    if fn.endswith(".parquet"):
                        path = os.path.join(walk_root, fn)
                        parts.append(
                            _FilePartition(
                                path,
                                v,
                                fields,
                                part_values,
                                change_tag,
                                ts=ts,
                                dv_paths=dv_paths,
                                rel=os.path.relpath(path, t.data_dir),
                                rid_base=(
                                    rid_bases.get(
                                        os.path.relpath(path, base)
                                    )
                                    if rid_bases is not None
                                    else None
                                ),
                                rid_phys=rid_phys,
                            )
                        )

    def _plan_change_files(self, t, m, v, cdc, parts):
        """Plan a rewrite commit's recorded _change_data files. The
        files carry the TABLE columns as of the commit plus
        ``_change_type``; the recipe maps pinned logical columns by
        NAME onto the stored commit-time schema — a column ADDED after
        the commit reads NULL (additive drift is fine), but a stored
        column the pinned schema no longer names means a RENAME or
        DROP postdates the images, and reconstructing them would need
        column-id mapping this format doesn't have: raise the
        non-additive-schema-change error exactly like Delta CDF."""
        stored = {
            f["name"]: _type_name(f["type"])
            for f in json.loads(cdc["schema"])["fields"]
        }
        pinned = {n for n, _ in self._fields}
        alien = sorted(set(stored) - pinned)
        # also dead: a stored name a LATER drop/rename invalidated,
        # even when the live schema names it again (re-added column —
        # its image bytes here are the OLD column's); mirrors the
        # data-dir path's dead-name handling in _plan_dirs
        stale = sorted(set(stored) & self._dead_names_after(t, v))
        if alien or stale:
            raise RuntimeError(
                f"snapshot_changes: version {v}'s change data "
                f"records column(s) {alien or stale!r} that a "
                "rename/drop postdates; "
                "change-feed reads across non-additive schema "
                "changes are unsupported — start the stream after "
                "the ALTER (sinceVersion)"
            )
        if self.with_row_ids and not cdc.get("row_ids"):
            raise RuntimeError(
                f"snapshot_changes: version {v} delivers RECORDED "
                "row images whose write predates row-id capture — "
                "start the stream after it (sinceVersion) or drop "
                "withRowIds"
            )
        fields = [
            (lname, ltype, lname if lname in stored else None,
             stored.get(lname, ltype), None)
            for lname, ltype in self._fields
        ]
        base = os.path.join(t.change_dir, cdc["entry"])
        for walk_root, _sub, files in os.walk(base):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    parts.append(
                        _FilePartition(
                            os.path.join(walk_root, fn),
                            v,
                            fields,
                            {},
                            "__file__",
                            ts=float(m["timestamp"]),
                            rid_file=self.with_row_ids,
                        )
                    )

    def read(self, part: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(part.path)
        rid_pos = None
        if self.with_row_ids and not part.rid_file:
            import numpy as np

            # derived id = base + ORIGINAL file position — captured
            # BEFORE deletion-vector suppression (the batch read tags
            # _metadata.row_index the same way), so surviving rows
            # keep the ids the suppressed rows' absence would shift
            rid_pos = np.arange(tbl.num_rows, dtype=np.int64)
        if part.dv_paths:
            # deletion vectors: suppress positions recorded for this
            # file (mirrors the batch read()'s anti-join; positions
            # index the WHOLE file, which this path reads whole).
            # Sidecars store rendering-space paths (URL-encoded for
            # hive-escaped components); part.rel is the ON-DISK
            # relative path. Vectorized equality covers the common
            # un-encoded case; only rows containing '%' (necessarily
            # encoded — a literal '%' on disk renders '%25') fall to
            # the python unquote compare.
            from urllib.parse import unquote

            import numpy as np
            import pyarrow.compute as pc

            pos: set = set()
            for dv_path in part.dv_paths:
                dv = pq.read_table(dv_path, columns=["file", "pos"])
                pos.update(
                    dv.filter(pc.equal(dv.column("file"), part.rel))
                    .column("pos")
                    .to_pylist()
                )
                enc = dv.filter(
                    pc.match_substring(dv.column("file"), "%")
                )
                if enc.num_rows:
                    pos.update(
                        p
                        for f, p in zip(
                            enc.column("file").to_pylist(),
                            enc.column("pos").to_pylist(),
                        )
                        if unquote(f) == part.rel
                    )
            if pos:
                keep = ~np.isin(
                    np.arange(tbl.num_rows),
                    np.fromiter(pos, dtype=np.int64),
                )
                tbl = tbl.filter(pa.array(keep))
                if rid_pos is not None:
                    rid_pos = rid_pos[keep]
        n = tbl.num_rows
        cols = []
        names = []
        have = set(tbl.schema.names)
        for lname, ltype, pname, ptype, fill in part.fields:
            if pname in have:
                col = tbl.column(pname)
                if ptype != ltype:
                    # entry predates a widen: lossless cast forward,
                    # same as _apply_evolution on the batch read path
                    col = col.cast(_arrow_type(ltype))
                cols.append(col)
            elif lname in part.part_values:
                val = _py_value(part.part_values[lname], ltype)
                cols.append(_const(pa, val, ltype, n))
            elif fill is not None:
                # CLI-sourced defaults arrive as strings; reuse the
                # partition-value parser (Spark casts lit(default)
                # the same way on the batch read path)
                val = _py_value(fill, ltype) if isinstance(fill, str) else fill
                cols.append(_const(pa, val, ltype, n))
            else:
                # declared-but-absent (add_column without a default
                # covering this entry, or a trailing-omitted nullable
                # column): all-NULL, same as the Spark scan
                cols.append(pa.nulls(n, type=_arrow_type(ltype)))
            names.append(lname)
        if self.with_row_ids:
            if part.rid_file:
                # recorded image: the captured id column delivers
                # as-is (the file physically carries it even though
                # the stored logical schema never declares it)
                cols.append(tbl.column("_row_id"))
            else:
                derived = (
                    pa.array(part.rid_base + rid_pos, type=pa.int64())
                    if part.rid_base is not None
                    else pa.nulls(n, type=pa.int64())
                )  # base can only be absent for a zero-row file,
                # whose read yields nothing anyway
                if part.rid_phys and "_row_id" in have:
                    import pyarrow.compute as pc2

                    # materialized entry: physical id wins, derived
                    # covers NULL slots (fresh inserts written into
                    # an otherwise-materialized entry)
                    cols.append(
                        pc2.coalesce(tbl.column("_row_id"), derived)
                    )
                else:
                    cols.append(derived)
            names.append("_row_id")
        if part.change_type == "__file__":
            cols.append(tbl.column("_change_type"))
            names.append("_change_type")
        elif part.change_type is not None:
            cols.append(_const(pa, part.change_type, "string", n))
            names.append("_change_type")
        cols.append(_const(pa, part.version, "long", n))
        names.append("_commit_version")
        if part.ts is not None:
            import datetime

            cols.append(
                _const(
                    pa,
                    datetime.datetime.fromtimestamp(
                        part.ts, tz=datetime.timezone.utc
                    ),
                    "timestamp",
                    n,
                )
            )
            names.append("_commit_timestamp")
        if n:
            # pa.table accepts ChunkedArrays (file columns arrive
            # chunked); yield its batches instead of one giant array
            out = pa.table(dict(zip(names, cols)))
            yield from out.to_batches()

    def commit(self, end: dict):
        _trace("commit", end)
        # the commit log is immutable; nothing to acknowledge


def _type_name(t) -> str:
    """Spark JSON-schema 'type' -> stable primitive name (nested types
    come through as their JSON object; stringify them so schema
    comparison still works even though _arrow_type would refuse)."""
    return t if isinstance(t, str) else json.dumps(t, sort_keys=True)


_DDL_TYPES = {
    "integer": "int",
    "long": "bigint",
    "short": "smallint",
    "byte": "tinyint",
}


def _json_type_to_ddl(t) -> str:
    """Spark JSON-schema type (primitive name or nested object) ->
    Spark DDL type string. Nested columns stream fine — a physically
    present column whose type matches the pinned schema passes out of
    the parquet file with its Arrow type untouched (round 17: lifted
    the primitive-only schema() restriction so array/struct/map
    payload columns, e.g. embeddings, can drive derived-index
    maintenance). Only the FILL paths (partition values, defaults,
    declared-but-absent nulls, widen casts) stay primitive-only —
    ``_arrow_type`` raises loudly if a nested column ever needs one.
    DDL spells arrays/maps nullable-element (Spark's default), a
    superset of any stored containsNull=false — safe for a scan
    schema."""
    if isinstance(t, str):
        return _DDL_TYPES.get(t, t)
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "array":
            return f"array<{_json_type_to_ddl(t['elementType'])}>"
        if kind == "map":
            return (
                f"map<{_json_type_to_ddl(t['keyType'])},"
                f"{_json_type_to_ddl(t['valueType'])}>"
            )
        if kind == "struct":
            inner = ",".join(
                f"`{f['name']}`:{_json_type_to_ddl(f['type'])}"
                for f in t["fields"]
            )
            return f"struct<{inner}>"
    raise ValueError(
        f"snapshot_changes: unsupported column type {t!r}"
    )


class SnapshotChangesSource(DataSource):
    """``format("snapshot_changes")`` — streaming CDF over a snapshot
    table's commit log. Options: ``path`` (table root, required),
    ``sinceVersion`` (exclusive start, default -1 = from genesis),
    ``sinceTimestamp`` (first delivered commit = earliest at-or-after
    the float-epoch or ISO timestamp — Delta startingTimestamp parity;
    mutually exclusive with sinceVersion), ``maxVersionsPerBatch``
    (continuous-trigger rate limit, default 0 = unthrottled — see the
    module docstring for the availableNow caveat), ``ignoreChanges``
    (re-deliver rewrite commits' rows), ``readChangeFeed`` (Delta CDF
    parity: adds ``_change_type`` and ``_commit_timestamp``;
    MERGE/DELETE/UPDATE commits made
    under ``enableChangeDataFeed`` deliver their recorded
    pre/post-images, OVERWRITE/RESTORE commits made under it deliver
    DERIVED images — removed-dir rows as ``delete``, added-dir rows
    as ``insert`` — appends deliver as ``insert``, compaction is
    invisible), ``withRowIds`` (every delivered row carries the
    source's stable ``_row_id`` — dir-derived rows compute
    ``base + original file position`` from each version's own base
    map, recorded images deliver their write-time-captured ids,
    materialized entries' physical ids win; requires row tracking
    over the streamed range, raising on pre-tracking versions like
    the batch ``table_changes(with_row_ids=True)`` — the streaming
    spelling of the id-keyed incremental consumer),
    ``failOnDataLoss`` (default true: a vacuumed offset
    fails loudly; false skips to the oldest resolvable version,
    re-delivering its full snapshot with a logged gap marker)."""

    @classmethod
    def name(cls):
        return "snapshot_changes"

    def _fields(self):
        # memoized: schema() and streamReader() must pin the SAME field
        # list — re-resolving would double the manifest IO and open a
        # race where a commit between the two calls hands the reader
        # fields that disagree with the scan schema Spark planned with
        cached = getattr(self, "_fields_cache", None)
        if cached is not None:
            return cached
        from ..acid import SnapshotTable

        root = self.options.get("path")
        if not root:
            raise ValueError("snapshot_changes requires option 'path'")
        t = SnapshotTable(None, root)
        v = t.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {root}")
        self._fields_cache = [
            (f["name"], _type_name(f["type"]))
            for f in json.loads(t._manifest(v)["schema"])["fields"]
        ]
        return self._fields_cache

    def schema(self):
        parts = []
        for name, tname in self._fields():
            ddl = (
                _json_type_to_ddl(json.loads(tname))
                if tname.startswith("{")
                else _DDL_TYPES.get(tname, tname)
            )
            parts.append(f"`{name}` {ddl}")
        opts = {k.lower(): v for k, v in self.options.items()}
        feed = str(opts.get("readchangefeed", "false")).lower() == "true"
        if str(opts.get("withrowids", "false")).lower() == "true":
            parts.append("`_row_id` bigint")
        if feed:
            parts.append("`_change_type` string")
        parts.append("`_commit_version` bigint")
        if feed:
            # Delta CDF's third metadata column (wall-clock commit
            # time from the manifest; nondeterministic — exclude it
            # from value-compared results)
            parts.append("`_commit_timestamp` timestamp")
        return ", ".join(parts)

    def streamReader(self, schema):
        return SnapshotChangesReader(
            {k.lower(): v for k, v in self.options.items()},
            self._fields(),
        )

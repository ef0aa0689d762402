"""Evolution-verb composition fuzz (round-12 verdict #5).

The four ALTER verbs (add / rename / drop / widen) compose with
appends (full and column-omitting), defaults, and RESTORE in
chronological chains; the matrix tests in test_acid.py cover pairs,
and the round-11 review passes kept finding pairwise edge cases — this
fuzzer generates random ~10-step sequences and asserts ``read()``
equals an eagerly-materialized Python oracle after EVERY step, so any
triple (e.g. add-default -> rename -> omitting append, or
widen -> restore -> append) that mis-canonicalizes shows up as a row
diff with the shrunken sequence printed by hypothesis.

Oracle semantics modeled (the documented contracts in acid.py):
- add_column(default): existing entries read the default (NULL when
  omitted); later appends may OMIT the column and read the default
  too (``_defaults_for_missing``); other omitted nullable columns
  read NULL.
- rename: in-place name change, fills/defaults carried to the new
  name; drop removes the column; widen (int->bigint) keeps values.
- restore(v): the table state becomes exactly snapshot v, committed
  forward as a new version (history monotonically grows).
"""

from __future__ import annotations

import tempfile
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from scalable_etl_spark.acid import SnapshotTable

DTYPES = ("int", "bigint", "double", "string")

# (op_kind, a, b): interpreted against the current model state, so
# every generated sequence is valid by construction (guards below).
OP = st.tuples(
    st.integers(0, 6), st.integers(0, 7), st.integers(0, 7)
)
SEQ = st.lists(OP, min_size=4, max_size=10)


def _value(dtype: str, seed: int, salt: int):
    if dtype == "int":
        return (seed * 7 + salt) % 50
    if dtype == "bigint":
        return 2**33 + seed + salt  # past int range: narrow storage shows
    if dtype == "double":
        return float(seed) + 0.5  # exactly representable
    return f"s{seed}_{salt}"


def _default(dtype: str, seed: int):
    if dtype == "int":
        return seed % 9
    if dtype == "bigint":
        return 2**34 + seed
    if dtype == "double":
        return float(seed) + 0.25
    return f"d{seed}"


class _Model:
    """Eagerly-materialized oracle: schema + rows + per-version
    snapshots, mutated in lockstep with the real table."""

    def __init__(self):
        self.cols: list[list] = []  # [name, dtype, default-or-None]
        self.rows: list[dict] = []
        self.snapshots: list[tuple] = []
        self.fresh = 0

    def snap(self):
        self.snapshots.append(
            ([list(c) for c in self.cols], [dict(r) for r in self.rows])
        )

    def names(self):
        return [c[0] for c in self.cols]


def _check(t: SnapshotTable, m: _Model):
    df = t.read()
    names = m.names()
    assert df.columns == names, (df.columns, names)
    got = Counter(
        tuple(r[n] for n in names) for r in df.collect()
    )
    want = Counter(
        tuple(r.get(n) for n in names) for r in m.rows
    )
    assert got == want, (got - want, want - got)


def _append(spark, t, m, seed, omit_idx=None):
    cols = [c for i, c in enumerate(m.cols) if i != omit_idx]
    ddl = ", ".join(f"`{n}` {d}" for n, d, _df_ in cols)
    vals = [
        tuple(
            _value(d, seed + k, i) for i, (n, d, _df_) in enumerate(cols)
        )
        for k in range(1 + seed % 2)
    ]
    t.append(spark.createDataFrame(vals, ddl))
    for k, tup in enumerate(vals):
        row = {n: v for (n, _d, _f), v in zip(cols, tup)}
        if omit_idx is not None:
            name, _dtype, dflt = m.cols[omit_idx]
            row[name] = dflt  # default fill, NULL when none recorded
        m.rows.append(row)
    m.snap()


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(seq=SEQ)
def test_evolution_sequences_match_eager_oracle(spark, seq):
    root = tempfile.mkdtemp(prefix="evofuzz_") + "/t"
    t = SnapshotTable(spark, root)
    m = _Model()
    # genesis: two columns, one row
    m.cols = [["k", "int", None], ["s", "string", None]]
    _append(spark, t, m, 3)
    _check(t, m)

    for op, a, b in seq:
        n = len(m.cols)
        if op == 0:  # full append
            _append(spark, t, m, a + b)
        elif op == 1 and n >= 2:  # append omitting one column
            _append(spark, t, m, a, omit_idx=b % n)
        elif op == 2:  # add column (defaulted when b is odd)
            dtype = DTYPES[a % len(DTYPES)]
            dflt = _default(dtype, b) if b % 2 else None
            name = f"c{m.fresh}"
            m.fresh += 1
            t.alter_add_column(name, dtype, default=dflt)
            m.cols.append([name, dtype, dflt])
            for r in m.rows:
                r[name] = dflt
            m.snap()
        elif op == 3:  # rename to a fresh name
            i = a % n
            old = m.cols[i][0]
            new = f"r{m.fresh}"
            m.fresh += 1
            t.alter_rename_column(old, new)
            m.cols[i][0] = new
            for r in m.rows:
                r[new] = r.pop(old, None)
            m.snap()
        elif op == 4 and n >= 2:  # drop
            i = a % n
            name = m.cols[i][0]
            t.alter_drop_column(name)
            del m.cols[i]
            for r in m.rows:
                r.pop(name, None)
            m.snap()
        elif op == 5:  # widen int -> bigint where applicable
            i = a % n
            name, dtype, _dflt = m.cols[i]
            if dtype != "int":
                continue
            t.alter_widen_column(name, "bigint")
            m.cols[i][1] = "bigint"
            m.snap()
        elif op == 6:  # restore to a prior version
            v = a % len(m.snapshots)
            t.restore(v)
            cols, rows = m.snapshots[v]
            m.cols = [list(c) for c in cols]
            m.rows = [dict(r) for r in rows]
            m.snap()
        else:
            continue
        _check(t, m)


# ---------------------------------------------------------------------
# Round-13 (verdict #4): the DML × evolution × governance composition
# fuzz. The alphabet grows from the four ALTER verbs to the whole
# subsystem surface — copy-on-write AND merge-on-read DELETE/UPDATE
# (deletion vectors), partition-scoped DML (partition-granular
# entries), CHECK constraints (satisfied, violating-append abort,
# drop), the change-data-feed property toggle (image recording rides
# every DML while on), compaction (materializes DVs, prunes evolution
# records), and RESTORE across all of it. The Python oracle stays an
# eagerly-materialized rows+schema model; read() must equal it after
# EVERY op, so any cross-subsystem interaction that corrupts the
# snapshot (a DV applied to the wrong file, a constraint abort leaking
# a half-commit, a compact resurrecting suppressed rows) shows up as a
# row diff with the shrunken sequence printed by hypothesis.
#
# Round-14 additions: op 12 = alter_partitioning (partition evolution:
# the spec toggles between ["p"] and [] mid-sequence, so every later
# DML / compact / restore runs against MIXED layouts), op 13 = a raced
# merge-on-read DML pair (a rival MOR DELETE commits between our
# matched-position computation and our commit — the rebase loop must
# recompute on the winner's snapshot, so stacked deletion vectors
# stay serializable: no double-suppression, and an update racing a
# delete must not resurrect the deleted rows via stale post-images),
# op 14 = reorg (REORG APPLY PURGE: rows must be invariant whether or
# not anything was dirty enough to rewrite), op 15 = clone (the
# zero-copy branch must equal the model AT the clone point, commit
# NOTHING to the source, and stay frozen while the source keeps
# mutating — checked again when the sequence ends).
#
# Round-15 addition: op 16 = enable_row_tracking (once per sequence).
# From that point every op composes with the ROW-ID invariants,
# checked after each step: ids are non-null and pairwise distinct;
# any id never seen before is >= the pre-op high-water mark (fresh
# draws never reuse a retired id — updates/merges keep old ids, which
# remain in the seen set); and the layout-only ops (compact, reorg)
# must preserve the EXACT (row content, id) pair multiset — OPTIMIZE
# moving a row must not change its identity. Op 17 = delete_rows (a
# drop list of every-3rd current id, applied via the id-indexed DV
# path): the model drops exactly the chosen rows by content, so a
# mis-bound id — deleting the WRONG row — diffs immediately.
#
# Round-16 addition (verdict r15 #7): op 18 = vacuum(min_age_seconds=
# 0) interleaved into the whole alphabet — every storage verb's
# artifacts (data dirs, DV sidecars, _change_data, row-bases
# checkpoints, clone-shared inodes, op-13 raced-commit loser orphans)
# must survive an aggressive sweep that retains every version; odd b
# also drops HISTORY (retain the newest 1 + a%4 manifests — the
# documented Delta contract that pinned readers break), with the
# model tracking the vacuum floor so op 11 asserts that restores
# BELOW it raise instead of resurrecting reclaimed state.
#
# Op 19 = delete_in (the foreign-key retraction verb): a values
# DataFrame listing a %-class of an int column's current values —
# multi-row matches, NULLs in the column never match, replays after
# the rows left are no-ops; the model drops exactly the rows whose
# value is in the list.

DML_OP = st.tuples(
    st.integers(0, 19), st.integers(0, 7), st.integers(0, 7)
)
DML_SEQ = st.lists(DML_OP, min_size=4, max_size=8)


def _rt_pairs(t, m, rt):
    """(row content, _row_id) pair multiset, or None when tracking is
    off — the layout-only-op stability oracle."""
    if not rt["on"]:
        return None
    names = m.names()
    return Counter(
        (tuple(r[n] for n in names), r["_row_id"])
        for r in t.read(with_row_ids=True).collect()
    )


def _check_row_ids(t, rt):
    """Per-step row-id invariants once tracking is on: unique,
    non-null, and fresh ids only ever drawn at/above the pre-op
    high-water mark."""
    if not rt["on"]:
        return
    ids = [
        r["_row_id"]
        for r in t.read(with_row_ids=True).select("_row_id").collect()
    ]
    assert all(i is not None for i in ids), "NULL row id"
    assert len(set(ids)) == len(ids), "duplicate row ids"
    fresh = set(ids) - rt["ids"]
    low = [i for i in fresh if i < rt["hwm"]]
    assert not low, (sorted(low)[:5], rt["hwm"])
    rt["ids"] |= set(ids)
    rt["hwm"] = t._row_meta_of(t.latest_version())[2]


def _append_p(spark, t, m, seed, omit_idx=None):
    """Append with the partition column always present (the model's
    column order is the logical schema order — read() canonicalizes
    to it regardless of which entries path-derive the column)."""
    cols = [c for i, c in enumerate(m.cols) if i != omit_idx]
    ddl = ", ".join(f"`{n}` {d}" for n, d, _df_ in cols)
    vals = []
    for k in range(1 + seed % 2):
        row = []
        for i, (nm, d, _f) in enumerate(cols):
            if nm == "p":
                row.append("x" if (seed + k) % 2 else "y")
            else:
                row.append(_value(d, seed + k, i))
        vals.append(tuple(row))
    t.append(spark.createDataFrame(vals, ddl))
    for tup in vals:
        row = {n: v for (n, _d, _f), v in zip(cols, tup)}
        if omit_idx is not None:
            name, _dtype, dflt = m.cols[omit_idx]
            row[name] = dflt
        m.rows.append(row)
    m.snap()


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(seq=DML_SEQ)
def test_dml_evolution_sequences_match_eager_oracle(spark, seq):
    import pytest

    from scalable_etl_spark.acid import ConstraintViolation

    root = tempfile.mkdtemp(prefix="dmlfuzz_") + "/t"
    t = SnapshotTable(spark, root)
    m = _Model()
    m.cons: dict = {}  # col name -> constraint name
    m.cdf = False
    m.pcols = ["p"]  # live partition spec (evolves via op 12)
    # genesis: PARTITIONED by p (last in the genesis DDL; read()
    # returns canonical logical-schema order, so added columns land
    # AFTER it), plus an int and a string column
    m.cols = [["k", "int", None], ["s", "string", None],
              ["p", "string", None]]
    ddl = "`k` int, `s` string, `p` string"
    t.overwrite(
        spark.createDataFrame(
            [(3, "s3", "x"), (4, "s4", "y"), (9, "s9", "x")], ddl
        ),
        partition_cols=["p"],
    )
    m.rows = [
        {"p": "x", "k": 3, "s": "s3"},
        {"p": "y", "k": 4, "s": "s4"},
        {"p": "x", "k": 9, "s": "s9"},
    ]
    m.snap()
    _check(t, m)

    def int_cols():
        return [
            i for i, (n, d, _f) in enumerate(m.cols)
            if d in ("int", "bigint") and n != "p"
        ]

    def alterable():  # non-partition column indexes
        return [i for i, (n, _d, _f) in enumerate(m.cols) if n != "p"]

    clones: list[tuple] = []  # (table, cols-at-clone, rows-at-clone)
    rt = {"on": False, "ids": set(), "hwm": 0}  # row-tracking oracle
    m.vfloor = 0  # versions below this were vacuumed away (op 18)

    def _check_clone(ct, cols, rows):
        mm = _Model()
        mm.cols = [list(c) for c in cols]
        mm.rows = [dict(r) for r in rows]
        _check(ct, mm)

    for op, a, b in seq:
        n = len(m.cols)
        if op == 0:  # full append
            _append_p(spark, t, m, a + b)
        elif op == 1 and n >= 3:  # append omitting a non-partition col
            # (>= 2 data cols: a frame of ONLY the partition column
            # is unwritable — ALL_PARTITION_COLUMNS_NOT_ALLOWED)
            alt = alterable()
            _append_p(spark, t, m, a, omit_idx=alt[b % len(alt)])
        elif op == 2:  # add column (defaulted when b is odd)
            dtype = DTYPES[a % len(DTYPES)]
            dflt = _default(dtype, b) if b % 2 else None
            name = f"c{m.fresh}"
            m.fresh += 1
            t.alter_add_column(name, dtype, default=dflt)
            # read() returns canonical logical-schema order (added
            # columns at the end, partition column at its schema
            # position — Delta parity, stable across evolution)
            m.cols.append([name, dtype, dflt])
            for r in m.rows:
                r[name] = dflt
            m.snap()
        elif op == 3 and n >= 2:  # rename a non-partition, unconstrained col
            i = alterable()[a % (n - 1)]
            old = m.cols[i][0]
            if old in m.cons:
                continue
            new = f"r{m.fresh}"
            m.fresh += 1
            t.alter_rename_column(old, new)
            m.cols[i][0] = new
            for r in m.rows:
                r[new] = r.pop(old, None)
            m.snap()
        elif op == 4 and n >= 3:  # drop a non-partition, unconstrained col
            i = alterable()[a % (n - 1)]
            name = m.cols[i][0]
            if name in m.cons:
                continue
            t.alter_drop_column(name)
            del m.cols[i]
            for r in m.rows:
                r.pop(name, None)
            m.snap()
        elif op == 5:  # DELETE, both modes; sometimes partition-scoped
            mode = "merge-on-read" if b % 2 else "copy-on-write"
            v0 = t.latest_version()
            if a % 3 == 0:
                # partition-scoped: prune on the partition column
                val = "x" if b % 4 < 2 else "y"
                t.delete(f"`p` = '{val}'", prune=("p", val, val),
                         mode=mode)
                m.rows = [r for r in m.rows if r["p"] != val]
            else:
                ics = int_cols()
                if not ics:
                    continue
                name = m.cols[ics[0]][0]
                rem = a % 5
                t.delete(f"`{name}` % 5 = {rem}", mode=mode)
                m.rows = [
                    r for r in m.rows
                    if r[name] is None or r[name] % 5 != rem
                ]
            if t.latest_version() > v0:  # no-match commits nothing
                m.snap()
        elif op == 6:  # UPDATE an int col (+1 where matched), both modes
            ics = int_cols()
            if not ics:
                continue
            name = m.cols[ics[-1]][0]
            rem = a % 5
            mode = "merge-on-read" if b % 2 else "copy-on-write"
            v0 = t.latest_version()
            t.update(
                f"`{name}` % 5 = {rem}",
                {name: f"`{name}` + 1"},
                mode=mode,
            )
            for r in m.rows:
                if r[name] is not None and r[name] % 5 == rem:
                    r[name] = r[name] + 1
            if t.latest_version() > v0:  # no-match commits nothing
                m.snap()
        elif op == 7:  # toggle the change-data feed (governance prop)
            if m.cdf:
                t.unset_property("enableChangeDataFeed")
            else:
                t.enable_change_data_feed()
            m.cdf = not m.cdf
            m.snap()
        elif op == 8:  # add a CHECK constraint on an int col
            ics = [
                i for i in int_cols()
                if m.cols[i][1] == "int"
                and m.cols[i][0] not in m.cons
            ]
            if not ics:
                continue
            name = m.cols[ics[a % len(ics)]][0]
            cname = f"chk{m.fresh}"
            m.fresh += 1
            # int values stay < 100 by construction (gen < 50, +1 per
            # update, <= 8 ops)
            t.add_constraint(cname, f"`{name}` < 100")
            m.cons[name] = cname
            m.snap()
        elif op == 9 and m.cons:  # violating append ABORTS cleanly
            name = sorted(m.cons)[a % len(m.cons)]
            ddl = ", ".join(
                f"`{nm}` {d}" for nm, d, _f in m.cols
            )
            bad = tuple(
                ("x" if nm == "p" else
                 200 if nm == name else _value(d, a, i))
                for i, (nm, d, _f) in enumerate(m.cols)
            )
            with pytest.raises(ConstraintViolation):
                t.append(spark.createDataFrame([bad], ddl))
            # aborted commit: no version, no snapshot
        elif op == 10:  # compact (materializes DVs, prunes evolution)
            pairs0 = _rt_pairs(t, m, rt)
            t.compact()
            m.snap()
            if pairs0 is not None:  # OPTIMIZE preserves row identity
                assert _rt_pairs(t, m, rt) == pairs0
        elif op == 11:  # restore (constraints dropped first: a
            # restore refuses when active constraints predate the
            # target snapshot's schema)
            for name, cname in sorted(m.cons.items()):
                t.drop_constraint(cname)
                m.snap()
            m.cons = {}
            v = a % len(m.snapshots)
            if v < m.vfloor:
                # a history-dropping vacuum (op 18) reclaimed this
                # manifest: the documented contract is a loud break,
                # never a silent partial resurrection
                with pytest.raises(FileNotFoundError):
                    t.restore(v)
                continue
            t.restore(v)
            cols, rows = m.snapshots[v]
            m.cols = [list(c) for c in cols]
            m.rows = [dict(r) for r in rows]
            # restore brings the target snapshot's partition spec
            # back; the spec never affects _check (read() output is
            # layout-invariant) so the model just mirrors the table
            m.pcols = t._manifest(t.latest_version())["partition_cols"]
            m.snap()
        elif op == 12:  # partition evolution: toggle the live spec
            m.pcols = [] if m.pcols else ["p"]
            t.alter_partitioning(m.pcols)
            m.snap()
        elif op == 13:  # raced merge-on-read DML pair
            ics = int_cols()
            if not ics:
                continue
            name = m.cols[ics[0]][0]
            rem_ours = a % 5
            rem_rival = (a + 1 + b % 4) % 5  # may overlap rows, not
            # the predicate itself — overlapping FILES is the point
            rival_pred = f"`{name}` % 5 = {rem_rival}"
            our_pred = f"`{name}` % 5 = {rem_ours}"

            real_commit = t._commit
            fired = {"done": False}

            def racing_commit(version, manifest,
                              _rc=real_commit, _rp=rival_pred):
                if not fired["done"]:
                    fired["done"] = True
                    SnapshotTable(spark, root).delete(
                        _rp, mode="merge-on-read"
                    )
                return _rc(version, manifest)

            t._commit = racing_commit  # type: ignore[method-assign]
            try:
                if b % 2:
                    t.delete(our_pred, mode="merge-on-read")
                else:
                    t.update(
                        our_pred, {name: f"`{name}` + 1"},
                        mode="merge-on-read",
                    )
            finally:
                t._commit = real_commit  # type: ignore[method-assign]
            # serial order is rival-then-ours by construction: the
            # rival commits inside our first commit attempt. The
            # model is the oracle for WHICH of the two matched. A
            # no-match on OUR side short-circuits before _commit, so
            # the rival only ever fires when we matched something on
            # the pre-race snapshot.
            def _m(r, rem):
                return r[name] is not None and r[name] % 5 == rem
            if not any(_m(r, rem_ours) for r in m.rows):
                continue  # ours no-matched: no commit, rival unfired
            if any(_m(r, rem_rival) for r in m.rows):
                # rival's delete committed a version first
                m.rows = [r for r in m.rows if not _m(r, rem_rival)]
                m.snap()
            if any(_m(r, rem_ours) for r in m.rows):
                # our rebase recomputed on the winner's snapshot and
                # still matched: second version lands
                if b % 2:
                    m.rows = [r for r in m.rows if not _m(r, rem_ours)]
                else:
                    for r in m.rows:
                        if _m(r, rem_ours):
                            r[name] = r[name] + 1
                m.snap()
        elif op == 14:  # reorg: rows invariant, commit only if dirty
            pairs0 = _rt_pairs(t, m, rt)
            v0 = t.latest_version()
            t.reorg()
            if t.latest_version() > v0:
                m.snap()
            if pairs0 is not None:  # purge preserves row identity
                assert _rt_pairs(t, m, rt) == pairs0
        elif op == 15:  # clone: zero-copy branch == model, source
            # version untouched, and the branch stays FROZEN (checked
            # again after the sequence ends)
            v0 = t.latest_version()
            ct = t.clone(f"{root}_clone{len(clones)}")
            assert t.latest_version() == v0
            _check_clone(ct, m.cols, m.rows)
            clones.append(
                (ct, [list(c) for c in m.cols], [dict(r) for r in m.rows])
            )
        elif op == 16:  # enable row tracking (once; later draws no-op)
            if rt["on"]:
                continue
            t.enable_row_tracking()
            rt["on"] = True
            m.snap()  # the property commit is a version
        elif op == 19:  # delete_in: foreign-key retraction by list
            ics = int_cols()
            if not ics:
                continue
            name = m.cols[ics[-1]][0]
            rem = a % 4
            vals = sorted(
                {
                    r[name]
                    for r in m.rows
                    if r[name] is not None and r[name] % 4 == rem
                }
            )
            if not vals:
                continue
            vals_df = spark.createDataFrame(
                [(int(x),) for x in vals], f"`{name}` BIGINT"
            )
            v0 = t.latest_version()
            t.delete_in(name, vals_df)
            hit = set(vals)
            m.rows = [
                r
                for r in m.rows
                if r[name] is None or r[name] not in hit
            ]
            if t.latest_version() > v0:
                m.snap()
        elif op == 18:  # vacuum interleaved into the alphabet
            if b % 2:
                # drop history too: keep only the newest manifests;
                # later restores below the floor must raise (op 11)
                keep = 1 + a % 4
                t.vacuum(retain_versions=keep, min_age_seconds=0)
                m.vfloor = max(
                    m.vfloor, len(m.snapshots) - keep
                )
            else:
                # retain every version: NOTHING any manifest
                # references may be reclaimed (loser orphans from
                # op 13's raced commits are the real garbage here);
                # min_age 0 is safe — intent markers (round 15)
                t.vacuum(
                    retain_versions=len(m.snapshots),
                    min_age_seconds=0,
                )
            _check(t, m)
            _check_row_ids(t, rt)
            continue  # no commit: the version/snapshot assert below
            # would re-run vacuously but _check already ran
        elif op == 17:  # drop list by stable row id
            if not rt["on"]:
                continue
            names = m.names()
            pairs = sorted(
                (
                    (tuple(r[n] for n in names), r["_row_id"])
                    for r in t.read(with_row_ids=True).collect()
                ),
                key=lambda kv: kv[1],
            )
            chosen = pairs[(a % 3)::3]
            if not chosen:
                continue
            t.delete_rows([i for _, i in chosen])
            for content, _i in chosen:
                row = next(
                    r
                    for r in m.rows
                    if tuple(r.get(n) for n in names) == content
                )
                m.rows.remove(row)
            m.snap()
        else:
            continue
        assert t.latest_version() == len(m.snapshots) - 1
        _check(t, m)
        _check_row_ids(t, rt)
    # clones are branches: the source kept mutating after each clone
    # point, none of it may leak into the frozen branches
    for ct, cols, rows in clones:
        _check_clone(ct, cols, rows)


# ---------------------------------------------------------------------
# Round-13: CDC-replication fuzz. A keyed replica maintained by
# sync_incremental(keys=...) AFTER EVERY op must equal the source
# table at every step — this drives the ENTIRE change-feed stack
# (recorded images for DML in both modes, DERIVED images for restore
# incl. dv-only diffs, alter replay, compaction invisibility,
# watermark exactly-once) against the same eager oracle. Restores are
# restricted to schema-identical snapshots: the keyed feed refuses
# non-additive schema changes mid-range by contract (split at the
# ALTER), so the fuzzer must not generate sequences the API defines
# as errors.

REPL_OP = st.tuples(
    st.integers(0, 10), st.integers(0, 7), st.integers(0, 7)
)
REPL_SEQ = st.lists(REPL_OP, min_size=3, max_size=7)


def _append_keyed(spark, t, m, seed):
    cols = m.cols
    ddl = ", ".join(f"`{n}` {d}" for n, d, _f in cols)
    vals = []
    for k in range(1 + seed % 2):
        row = []
        for i, (nm, d, _f) in enumerate(cols):
            if nm == "id":
                row.append(m.fresh * 1000 + k)
            else:
                row.append(_value(d, seed + k, i))
        vals.append(tuple(row))
    m.fresh += 1
    t.append(spark.createDataFrame(vals, ddl))
    for tup in vals:
        m.rows.append({n: v for (n, _d, _f), v in zip(cols, tup)})
    m.snap()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(seq=REPL_SEQ)
def test_cdc_replica_follows_every_op(spark, seq):
    from collections import Counter

    from scalable_etl_spark.acid import sync_incremental

    root = tempfile.mkdtemp(prefix="replfuzz_")
    src = SnapshotTable(spark, root + "/s")
    dst = SnapshotTable(spark, root + "/d")
    m = _Model()
    m.cols = [["id", "bigint", None], ["k", "int", None],
              ["s", "string", None]]
    src.overwrite(
        spark.createDataFrame(
            [(1, 3, "a"), (2, 4, "b"), (3, 9, "c")],
            "`id` bigint, `k` int, `s` string",
        )
    )
    src.enable_change_data_feed()
    m.rows = [
        {"id": 1, "k": 3, "s": "a"},
        {"id": 2, "k": 4, "s": "b"},
        {"id": 3, "k": 9, "s": "c"},
    ]
    m.fresh = 1
    m.snap(); m.snap()  # v0 + the property commit

    def int_cols():
        return [
            i for i, (n, d, _f) in enumerate(m.cols)
            if d in ("int", "bigint") and n != "id"
        ]

    def alterable():
        return [i for i, (n, _d, _f) in enumerate(m.cols) if n != "id"]

    state = {"dst2": None}  # the by_row_id replica (round 16): born
    # the first time tracking is on, then maintained after EVERY op

    def check():
        sync_incremental(src, dst, sync_id="fuzz", keys=["id"])
        names = m.names()
        want = Counter(
            tuple(r.get(n) for n in names) for r in m.rows
        )
        for t_, label in ((src, "src"), (dst, "dst")):
            df = t_.read()
            got = Counter(
                tuple(r[n] for n in names) for r in df.collect()
            )
            assert got == want, (label, got - want, want - got)
        if src.row_tracking_enabled():
            # zero-config id-keyed replication: content AND id
            # fidelity — the replica's (row, _row_id) pair multiset
            # must equal the source's id-bearing snapshot through
            # every DML / alter / restore / compaction that follows
            if state["dst2"] is None:
                state["dst2"] = SnapshotTable(spark, root + "/d2")
            sync_incremental(
                src, state["dst2"], sync_id="fuzz2", by_row_id=True
            )
            want_pairs = Counter(
                (tuple(r[n] for n in names), r["_row_id"])
                for r in src.read(with_row_ids=True).collect()
            )
            got_pairs = Counter(
                (tuple(r[n] for n in names), r["_row_id"])
                for r in state["dst2"].read().collect()
            )
            assert got_pairs == want_pairs, (
                got_pairs - want_pairs, want_pairs - got_pairs
            )

    check()
    for op, a, b in seq:
        n = len(m.cols)
        if op == 0:  # append
            _append_keyed(spark, src, m, a + b)
        elif op == 1:  # add column
            dtype = DTYPES[a % len(DTYPES)]
            dflt = _default(dtype, b) if b % 2 else None
            name = f"c{m.fresh}"
            m.fresh += 1
            src.alter_add_column(name, dtype, default=dflt)
            m.cols.append([name, dtype, dflt])
            for r in m.rows:
                r[name] = dflt
            m.snap()
        elif op == 2:  # rename a non-key column
            i = alterable()[a % (n - 1)]
            old = m.cols[i][0]
            new = f"r{m.fresh}"
            m.fresh += 1
            src.alter_rename_column(old, new)
            m.cols[i][0] = new
            for r in m.rows:
                r[new] = r.pop(old, None)
            m.snap()
        elif op == 3 and n >= 3:  # drop a non-key column
            i = alterable()[a % (n - 1)]
            name = m.cols[i][0]
            src.alter_drop_column(name)
            del m.cols[i]
            for r in m.rows:
                r.pop(name, None)
            m.snap()
        elif op == 4:  # DELETE, both modes
            ics = int_cols()
            if not ics:
                continue
            name = m.cols[ics[0]][0]
            rem = a % 5
            mode = "merge-on-read" if b % 2 else "copy-on-write"
            v0 = src.latest_version()
            src.delete(f"`{name}` % 5 = {rem}", mode=mode)
            m.rows = [
                r for r in m.rows
                if r[name] is None or r[name] % 5 != rem
            ]
            if src.latest_version() > v0:
                m.snap()
        elif op == 5:  # UPDATE, both modes
            ics = int_cols()
            if not ics:
                continue
            name = m.cols[ics[-1]][0]
            rem = a % 5
            mode = "merge-on-read" if b % 2 else "copy-on-write"
            v0 = src.latest_version()
            src.update(
                f"`{name}` % 5 = {rem}", {name: f"`{name}` + 1"},
                mode=mode,
            )
            for r in m.rows:
                if r[name] is not None and r[name] % 5 == rem:
                    r[name] = r[name] + 1
            if src.latest_version() > v0:
                m.snap()
        elif op == 6:  # keyed MERGE (upsert + delete_where), CoW/MOR
            ids = sorted({r["id"] for r in m.rows})
            # one row per key (the merge contract): upsert ids never
            # overlap the deleted last id
            up_ids = ids[:-1][: 1 + a % 3]
            batch = [(i, 77, "up") for i in up_ids]
            batch.append((888000 + m.fresh, 77, "up"))
            if ids:
                batch.append((ids[-1], 0, "del"))
            m.fresh += 1
            ddl = "`id` bigint, `k2` int, `op` string"
            bdf = spark.createDataFrame(batch, ddl)
            sel = [F.col("id")]
            for nm, d, _f in m.cols:
                if nm == "id":
                    continue
                if d == "int":
                    sel.append(F.col("k2").cast("int").alias(nm))
                elif d == "bigint":
                    sel.append(F.col("k2").cast("bigint").alias(nm))
                elif d == "double":
                    sel.append(F.col("k2").cast("double").alias(nm))
                else:
                    sel.append(F.lit("mrg").alias(nm))
            bdf = bdf.select(*sel, "op")
            src.merge(
                bdf, ["id"],
                delete_where="op = 'del'",
                mode="merge-on-read" if b % 2 else "copy-on-write",
            )
            dels = {r[0] for r in batch if r[2] == "del"}
            ups = {r[0] for r in batch if r[2] == "up"}
            m.rows = [r for r in m.rows if r["id"] not in dels | ups]
            for i in ups:
                row = {"id": i}
                for nm, d, _f in m.cols:
                    if nm == "id":
                        continue
                    row[nm] = 77 if d in ("int", "bigint") else (
                        77.0 if d == "double" else "mrg"
                    )
                m.rows.append(row)
            m.snap()
        elif op == 7:  # compact: invisible to the feed
            src.compact()
            m.snap()
        elif op == 8:  # restore to a SCHEMA-IDENTICAL snapshot
            cur = [tuple(c) for c in m.cols]
            cands = [
                i for i, (cols, _rows) in enumerate(m.snapshots)
                if [tuple(c) for c in cols] == cur
            ]
            if not cands:
                continue
            v = cands[a % len(cands)]
            src.restore(v)
            cols, rows = m.snapshots[v]
            m.cols = [list(c) for c in cols]
            m.rows = [dict(r) for r in rows]
            m.snap()
        elif op == 9 and n >= 3:  # drop -> compact -> RE-ADD same name
            # (round-13 ADVICE cdf.py guard + the reorg replay path:
            # the source's reuse is legal after its rewrite; the
            # REPLICA's alter replay must self-heal via reorg because
            # its own entries still carry the old bytes, and the
            # stale-image range guard must not serve the dropped
            # column's old bytes under the re-added name)
            i = alterable()[a % (n - 1)]
            name = m.cols[i][0]
            src.alter_drop_column(name)
            del m.cols[i]
            for r in m.rows:
                r.pop(name, None)
            m.snap()
            src.compact()
            m.snap()
            dtype = DTYPES[b % len(DTYPES)]
            dflt = _default(dtype, a + b)  # always defaulted: the
            # re-added column must read the NEW value, never old bytes
            src.alter_add_column(name, dtype, default=dflt)
            m.cols.append([name, dtype, dflt])
            for r in m.rows:
                r[name] = dflt
            m.snap()
        elif op == 10:  # enable row tracking on the SOURCE (once):
            # id machinery must be INVISIBLE to the change feed — the
            # replica keeps matching the eager oracle through every
            # later op, and the feed's schema never grows an id column
            if src.row_tracking_enabled():
                continue
            src.enable_row_tracking()
            m.snap()
        else:
            continue
        assert src.latest_version() == len(m.snapshots) - 1
        check()

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

"""Hypothesis equivalence tests: each custom join operator (as-of,
trailing-band distinct count, interval containment) must agree with an
obviously-correct brute-force Python reference on randomized inputs.
The deterministic unit tests pin named edge cases; these search the
input space for the ones nobody thought to name (equal timestamps,
empty sides, bin-boundary points, single-key bursts).

Spark jobs are slow per example, so examples are few and inputs small;
hypothesis still shrinks failures to minimal cases.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalable_etl_spark.operators.asof_join import asof_join
from scalable_etl_spark.operators.band_join import rolling_distinct_count
from scalable_etl_spark.operators.range_join import interval_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # stable CI: same examples every run
)

KEYS = st.sampled_from(["a", "b", "c"])
TS = st.integers(min_value=0, max_value=30)


@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12),
    right=st.lists(
        st.tuples(KEYS, TS, st.integers(0, 99)), min_size=0, max_size=12
    ),
    strict=st.booleans(),
)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right, strict):
    # Dedupe right on (key, ts): with several right rows at the same
    # instant the operator's winner among them is unspecified (matches
    # DuckDB ASOF, which also picks one arbitrarily).
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(0, "z", 0)],
        "lid INT, k STRING, t INT",
    )
    if not left:
        ldf = ldf.filter("lid < 0")
    rdf = spark.createDataFrame(
        right or [("z", 0, 0)], "k STRING, t INT, v INT"
    )
    if not right:
        rdf = rdf.filter("v < 0")

    got = {
        r.lid: r.v
        for r in asof_join(ldf, rdf, "k", "t", ["v"], strict=strict).collect()
    }

    expect = {}
    for i, (k, t) in enumerate(left):
        matches = [
            (rt, v)
            for rk, rt, v in right
            if rk == k and (rt < t if strict else rt <= t)
        ]
        expect[i] = max(matches)[1] if matches else None
    assert got == expect


@given(
    rows=st.lists(st.tuples(KEYS, st.integers(0, 20)), min_size=1, max_size=25),
    window_days=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_rolling_distinct_count_matches_bruteforce(spark, rows, window_days):
    base = dt.date(2024, 1, 1)
    data = [(base + dt.timedelta(days=d), k) for k, d in rows]
    df = spark.createDataFrame(data, "d DATE, k STRING")
    got = {
        r.d: r.active_keys
        for r in rolling_distinct_count(
            df, "d", "k", window_days=window_days
        ).collect()
    }
    dates = {d for d, _ in data}
    expect = {
        d: len(
            {
                k
                for dd, k in data
                if 0 <= (d - dd).days <= window_days - 1
            }
        )
        for d in dates
    }
    assert got == expect


@given(
    intervals=st.lists(
        st.tuples(KEYS, TS, st.integers(0, 15)), min_size=0, max_size=8
    ),
    points=st.lists(st.tuples(KEYS, TS), min_size=0, max_size=15),
    bin_width=st.sampled_from([1, 7, 3600]),
)
@settings(**SETTINGS)
def test_interval_join_matches_bruteforce(spark, intervals, points, bin_width):
    # interval = (key, start_offset, duration) in seconds from epoch.
    base = 1_700_000_000
    idata = [
        (i, k, _ts(base + s), _ts(base + s + dur))
        for i, (k, s, dur) in enumerate(intervals)
    ]
    pdata = [(j, k, _ts(base + t)) for j, (k, t) in enumerate(points)]
    idf = spark.createDataFrame(
        idata or [(0, "z", _ts(base), _ts(base))],
        "iid INT, k STRING, s TIMESTAMP, e TIMESTAMP",
    )
    if not idata:
        idf = idf.filter("iid < 0")
    pdf = spark.createDataFrame(
        pdata or [(0, "z", _ts(base))], "pid INT, k STRING, ts TIMESTAMP"
    )
    if not pdata:
        pdf = pdf.filter("pid < 0")

    got = {
        (r.iid, r.pid)
        for r in interval_join(
            idf, pdf, "k", "s", "e", "ts", bin_width_sec=bin_width
        ).collect()
    }
    expect = {
        (i, j)
        for i, (ik, s, dur) in enumerate(intervals)
        for j, (pk, t) in enumerate(points)
        if ik == pk and s <= t <= s + dur
    }
    assert got == expect


def _ts(epoch_sec: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(epoch_sec, dt.timezone.utc).replace(
        tzinfo=None
    )

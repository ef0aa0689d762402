"""rolling_distinct_count (J1 rewrite) vs a hand-computed window and vs
the naive non-equi self-join it replaces."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scalable_etl_spark.operators.band_join import rolling_distinct_count


def _df(spark, rows):
    return spark.createDataFrame(rows, ["d", "u"]).select(
        F.col("d").cast("date").alias("d"), "u"
    )


def test_rolling_3day_hand_computed(spark):
    rows = [
        ("2024-01-01", "a"),
        ("2024-01-01", "b"),
        ("2024-01-02", "a"),
        ("2024-01-04", "c"),
        ("2024-01-08", "a"),
    ]
    out = rolling_distinct_count(_df(spark, rows), "d", "u", window_days=3)
    got = {str(r.d): r.active_keys for r in out.collect()}
    # Only dates present in the input appear; window = trailing 3 days.
    assert got == {
        "2024-01-01": 2,  # {a,b}
        "2024-01-02": 2,  # {a,b} from 12-31..01-02
        "2024-01-04": 2,  # {a(01-02), c}
        "2024-01-08": 1,  # {a}
    }


def test_rolling_matches_naive_self_join(spark):
    import random

    rng = random.Random(7)
    base = dt.date(2024, 3, 1)
    rows = [
        (str(base + dt.timedelta(days=rng.randrange(20))), f"u{rng.randrange(8)}")
        for _ in range(300)
    ]
    df = _df(spark, rows)
    out = rolling_distinct_count(df, "d", "u", window_days=7)
    got = {str(r.d): r.active_keys for r in out.collect()}

    daily = df.distinct()
    curr = daily.select(F.col("d").alias("cd")).distinct()
    naive = (
        curr.join(
            daily,
            (F.col("d") >= F.date_sub(F.col("cd"), 6)) & (F.col("d") <= F.col("cd")),
            "left",
        )
        .groupBy("cd")
        .agg(F.countDistinct("u").alias("n"))
    )
    want = {str(r.cd): r.n for r in naive.collect()}
    assert got == want


def test_rolling_duplicate_events_count_once(spark):
    rows = [("2024-01-01", "a")] * 5 + [("2024-01-02", "a")] * 3
    out = rolling_distinct_count(_df(spark, rows), "d", "u", window_days=7)
    got = {str(r.d): r.active_keys for r in out.collect()}
    assert got == {"2024-01-01": 1, "2024-01-02": 1}

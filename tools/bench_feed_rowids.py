"""Cost model for id-carrying change feeds: what does
``table_changes(change_feed=True, with_row_ids=True)`` pay over the
same feed without ids, and what does merge-time id capture cost the
WRITER? (Round 16 — every DML writer now captures image row ids, so
the feed serves any range; this prices that capability.)

Measured points on an events-sized table (sf0.1, ~600k rows):
  1. feed over an append + MOR delete + merge range, NO ids
  2. the same range WITH ids (broadcast base-map join on the
     dir-derived legs; recorded images read their captured column)
  3. writer-side: the mixed DML sequence under three configs —
     tracking only, feed only, and both. NOTE the both/feed-only
     ratio prices EVERYTHING row tracking adds to a CDF writer
     (id-bearing target scans, physical id writes, base
     pre-assignment AND image capture), not image capture alone —
     the honest marginal-cost question for an operator choosing to
     enable tracking on a CDF table.

Protocol: warm once per shape, 3 timed runs, medians. Run SOLO
(BASELINE.md pin rules). Usage: python tools/bench_feed_rowids.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scalable_etl_spark.acid import SnapshotTable  # noqa: E402
from scalable_etl_spark.session import get_spark  # noqa: E402
from scalable_etl_spark.tables import load_table  # noqa: E402


def timed(fn, n=3):
    fn()  # warm
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return round(statistics.median(out), 3)


def _mixed_dml(t: SnapshotTable, e) -> tuple[int, int]:
    """The writer sequence: append half, MOR-delete a slice, merge a
    batch (updates + inserts). Returns (v_start, v_end)."""
    v0 = t.latest_version()
    t.append(e.filter(F.col("event_id") % 2 == 1))
    t.delete(F.col("value") < 5.0, mode="merge-on-read")
    batch = (
        e.filter(F.col("event_id") % 97 == 0)
        .withColumn("event_type", F.lit("merged"))
    )
    t.merge(batch, ["event_id"])
    return v0, t.latest_version()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench-feed-rowids")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    ).dropDuplicates(["event_id"])

    # -- writer-side cost: identical DML under three configs —
    # tracking only (no images), tracking + feed (images WITH id
    # capture), feed only (images WITHOUT capture: isolates what id
    # capture itself adds to a CDF writer)
    def build(cdf: bool, rt: bool) -> float:
        def run():
            root = os.path.join(
                tempfile.mkdtemp(prefix="feedw_"), "t"
            )
            t = SnapshotTable(spark, root)
            t.overwrite(e.filter(F.col("event_id") % 2 == 0))
            if rt:
                t.enable_row_tracking()
            if cdf:
                t.enable_change_data_feed()
            _mixed_dml(t, e)

        return timed(run)

    writer_off = build(False, True)
    writer_on = build(True, True)
    writer_nocapture = build(True, False)

    # -- reader-side: one table, one range, feed with vs without ids
    root = os.path.join(tempfile.mkdtemp(prefix="feedr_"), "t")
    t = SnapshotTable(spark, root)
    t.overwrite(e.filter(F.col("event_id") % 2 == 0))
    t.enable_row_tracking()
    t.enable_change_data_feed()
    v0, v1 = _mixed_dml(t, e)

    def feed_plain():
        t.table_changes(v0, v1, change_feed=True).agg(
            F.count("*"), F.sum("value")
        ).collect()

    def feed_ids():
        t.table_changes(v0, v1, change_feed=True, with_row_ids=True).agg(
            F.count("*"), F.sum("value"), F.max("_row_id")
        ).collect()

    plain = timed(feed_plain)
    ids = timed(feed_ids)
    print(
        {
            "sf_dir": sf_dir,
            "feed_no_ids_sec": plain,
            "feed_with_ids_sec": ids,
            "ids_over_plain": round(ids / plain, 2),
            "writer_rt_only_sec": writer_off,
            "writer_rt_plus_feed_sec": writer_on,
            "writer_feed_no_capture_sec": writer_nocapture,
            "feed_recording_over_rt_only": round(
                writer_on / writer_off, 2
            ),
            "tracking_plus_capture_over_untracked_feed": round(
                writer_on / writer_nocapture, 2
            ),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()

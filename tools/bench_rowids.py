"""Cost model for row-id reads: what does `read(with_row_ids=True)`
pay over a plain `read()` on the same snapshot, and what does the
physical-materialization path cost on top of the derived path?

Three measured points on an events-sized table (sf0.1, ~600k rows):
  1. plain read + aggregate            (baseline)
  2. with_row_ids, DERIVED entries     (base + _metadata.row_index,
                                        one broadcast join)
  3. with_row_ids, MATERIALIZED files  (post-compact: physical column
                                        read + coalesce with derived)

Protocol: warm once per shape, 3 timed runs, medians. Run SOLO
(BASELINE.md pin rules). Usage: python tools/bench_rowids.py [sf_dir]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench-rowids")
    root = os.path.join(tempfile.mkdtemp(prefix="rowids_"), "t")
    t = SnapshotTable(spark, root)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t.overwrite(e)
    t.enable_row_tracking()

    def agg_plain():
        t.read().agg(F.count("*"), F.sum("value")).collect()

    def agg_ids():
        t.read(with_row_ids=True).agg(
            F.count("*"), F.sum("value"), F.max("_row_id")
        ).collect()

    plain = timed(agg_plain)
    derived = timed(agg_ids)
    t.compact()  # materializes the physical _row_id column
    materialized = timed(agg_ids)
    plain_post = timed(agg_plain)
    print(
        {
            "sf_dir": sf_dir,
            "plain_read_sec": plain,
            "derived_ids_sec": derived,
            "derived_over_plain": round(derived / plain, 2),
            "materialized_ids_sec": materialized,
            "materialized_over_plain_post_compact": round(
                materialized / plain_post, 2
            ),
            "plain_post_compact_sec": plain_post,
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()

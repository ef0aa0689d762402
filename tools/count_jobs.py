"""Count Spark jobs (and stages) a registered query submits.

Usage: python tools/count_jobs.py QUERY [QUERY ...] [--sf DIR]

Wall time on this box swings with outside load; job/stage counts do
not. Use this to prove a change actually removed driver-synchronized
jobs (guide §1: measure the thing you are changing — here, the number
of jobs the commit loop pays, not a noisy wall clock).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    args = p.parse_args()

    import __spark_entry__ as e
    from scalable_etl_spark.session import get_spark

    spark = get_spark(app_name="count-jobs")
    qs = e.queries()
    qs["pricing_summary"](spark, args.sf).collect()  # warm
    st = spark.sparkContext.statusTracker()
    for name in args.names:
        before = set(st.getJobIdsForGroup(None) or [])
        n_rows = qs[name](spark, args.sf).count()
        after = set(st.getJobIdsForGroup(None) or [])
        new = sorted(after - before)
        n_stages = 0
        for j in new:
            ji = st.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        print(
            f"{name:32s} jobs={len(new):4d} stages={n_stages:4d} "
            f"rows={n_rows}"
        )


if __name__ == "__main__":
    main()

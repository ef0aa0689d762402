"""Time individual registered queries at a given SF dir.

Usage: python tools/time_query.py QUERY [QUERY ...] [--sf DIR] [--n N]

Prints per-query wall seconds (median of N runs after one warm run of
pricing_summary to amortize session/JIT startup). Use this while
iterating on one operator; bench.py is the full-suite recorder.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--n", type=int, default=3)
    args = p.parse_args()

    import __spark_entry__ as e
    from scalable_etl_spark.session import get_spark

    spark = get_spark()
    qs = e.queries()
    qs["pricing_summary"](spark, args.sf).collect()  # warm
    for name in args.names:
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            n_rows = qs[name](spark, args.sf).count()
            times.append(time.perf_counter() - t0)
        print(
            f"{name:32s} median={statistics.median(times):6.3f}s "
            f"min={min(times):6.3f}s rows={n_rows}"
        )


if __name__ == "__main__":
    main()

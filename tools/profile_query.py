"""Profile one registered query: driver-side cProfile + Spark job log.

Usage: python tools/profile_query.py QUERY [--sf DIR] [--top N]

Two views of the same run (guide §1: measure first, and decide whether
time is driver work or executor work before optimizing either):
  1. cProfile of the driver process — py4j socket waits show up under
     the DataFrame action that blocked, so `tottime` on socket recv
     inside e.g. ``append`` vs ``table_changes`` attributes wall time
     to the query phase that spent it.
  2. A SparkListener-ish job log via the status tracker poll is too
     coarse; instead we wrap the run with per-phase job descriptions
     where the query code sets them (optional).

The warm run (pricing_summary + the query itself at sf0.001) amortizes
JVM/codegen startup so the profiled run measures steady state.
"""

from __future__ import annotations

import argparse
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("name")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    args = p.parse_args()

    import __spark_entry__ as e
    from scalable_etl_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{args.name}")
    qs = e.queries()
    qs["pricing_summary"](spark, args.sf).collect()  # warm session
    try:
        qs[args.name](spark, args.warm_sf).count()  # warm codegen
    except Exception as exc:
        print(f"# warm run failed (continuing): {exc}", file=sys.stderr)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    n = qs[args.name](spark, args.sf).count()
    prof.disable()
    wall = time.perf_counter() - t0
    print(f"# {args.name}: {wall:.3f}s wall, {n} rows (sf={args.sf})")

    out = io.StringIO()
    st = pstats.Stats(prof, stream=out)
    st.sort_stats("cumulative").print_stats(args.top)
    # keep only our code + py4j boundaries: drop pure-noise lines
    for line in out.getvalue().splitlines():
        print(line)
    spark.stop()


if __name__ == "__main__":
    main()

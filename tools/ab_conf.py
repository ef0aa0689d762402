"""A/B one runtime conf against a list of queries.

Usage: python tools/ab_conf.py KEY VALUE_A VALUE_B QUERY [QUERY ...]
       [--sf DIR] [--n N]

Times each query N times under A then under B in the SAME session
(conf must be runtime-settable), reporting medians. Order A,B per query
with a warm run first so codegen warmup lands on neither arm.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("key")
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--n", type=int, default=3)
    args = p.parse_args()

    import __spark_entry__ as e
    from scalable_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-conf")
    qs = e.queries()
    qs["pricing_summary"](spark, args.sf).collect()  # warm

    for name in args.names:
        qs[name](spark, "/root/testdata/sf0.001").count()  # warm codegen
        res = {}
        for label, val in (("A", args.a), ("B", args.b)):
            spark.conf.set(args.key, val)
            ts = []
            for _ in range(args.n):
                t0 = time.perf_counter()
                qs[name](spark, args.sf).count()
                ts.append(time.perf_counter() - t0)
            res[label] = statistics.median(ts)
        print(
            f"{name:34s} A({args.a})={res['A']:6.3f}s "
            f"B({args.b})={res['B']:6.3f}s  B/A={res['B']/res['A']:.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

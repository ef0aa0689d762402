"""Write .explain(\"formatted\") for registered queries to files.

Usage: python tools/explain_query.py OUTDIR SUFFIX QUERY [QUERY ...]
       [--sf DIR]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query. Queries that execute
side effects while BUILDING their frame (sink_/streaming_ lifecycles)
still run those effects; the file records the plan of the RETURNED
frame, which is what the bench times with .count().
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("suffix")
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    args = p.parse_args()

    import __spark_entry__ as e
    from scalable_etl_spark.session import get_spark

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark(app_name="explain")
    qs = e.queries()
    for name in args.names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # record the failure, keep going
            plan = f"EXPLAIN FAILED: {exc}"
        out = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()

"""Local replica of the driver's correctness gate: run every registered
Spark query and its DuckDB oracle at sf0.01, compare row count, column
set, and an order-insensitive value multiset.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# Import the driver contract module itself so the query set checked
# here is exactly the set the driver sees (new query modules only need
# wiring in __spark_entry__).
import __spark_entry__  # noqa: F401
from scalable_etl_spark.registry import ORACLE_SQL, QUERIES
from scalable_etl_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def row_key(row, cols_order) -> tuple:
    return tuple(canon(row[i]) for i in cols_order)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        if name not in ORACLE_SQL:
            print(f"SKIP (no oracle)  {name}")
            continue
        try:
            sdf = QUERIES[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        try:
            otbl = con.execute(ORACLE_SQL[name]).fetch_arrow_table()
            ocols = otbl.column_names
            orows = list(zip(*(c.to_pylist() for c in otbl.columns)))
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            n_fail += 1
            continue

        # Driver-parity guard: the driver fetches oracle results through
        # pandas, where DuckDB HUGEINT (SUM over int) and DECIMAL128
        # (int*decimal-literal arithmetic) render as floats/objects and
        # hash-mismatch Spark's BIGINT/DOUBLE even when values are equal.
        # Any such output type is a fail here even if values compare OK.
        # The schema comes from the SAME arrow fetch as the rows — no
        # second oracle execution, no silently-skipped guard.
        bad_types = [
            (f.name, str(f.type))
            for f in otbl.schema
            if str(f.type).startswith("decimal")
        ]
        if bad_types:
            print(f"FAIL {name}: oracle emits decimal/hugeint {bad_types}")
            n_fail += 1
            continue

        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        s_order = [scols.index(c) for c in sorted(scols)]
        o_order = [ocols.index(c) for c in sorted(ocols)]
        s_set = sorted(row_key(tuple(r), s_order) for r in srows)
        o_set = sorted(row_key(r, o_order) for r in orows)
        if s_set != o_set:
            diffs = [
                (a, b) for a, b in zip(s_set, o_set) if a != b
            ][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Deletion-vector read-overhead measurement (round-13 verdict #6).

Quantifies what merge-on-read costs READERS vs copy-on-write, at the
bench scale factor: build a lineitem-backed snapshot table, delete the
same 1%-ish slice both ways, and time the identical aggregate read
over each variant (plus the undeleted base). The DV'd read pays one
broadcast anti-join against the suppressed-position sidecar; the
copy-on-write read pays nothing at read time (the delete already paid
a full candidate-dir rewrite). Also times the two DELETE operations
themselves — the write-side asymmetry is the whole point of DVs.

Usage: python tools/bench_dv.py [sf_dir] [runs]
Prints one JSON line; medians over ``runs`` (default 5).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalable_etl_spark.acid import SnapshotTable  # noqa: E402
from scalable_etl_spark.session import tune_session  # noqa: E402
from scalable_etl_spark.tables import load_table  # noqa: E402


def _agg_time(t: SnapshotTable, runs: int) -> float:
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        t.read().agg(
            F.count("*"),
            F.sum("l_extendedprice"),
            F.countDistinct("l_returnflag"),
        ).collect()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag",
    )
    base = tempfile.mkdtemp(prefix="dvbench_")
    shutil.rmtree(base)
    pred = "l_quantity < 2"  # ~2% of rows (quantity uniform 1..50)

    tables = {}
    for name in ("base", "mor", "cow"):
        t = SnapshotTable(spark, os.path.join(base, name))
        half = F.col("l_orderkey") % 2
        t.append(li.filter(half == 0))
        t.append(li.filter(half == 1))
        tables[name] = t

    t0 = time.perf_counter()
    tables["mor"].delete(pred, mode="merge-on-read")
    mor_delete_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    tables["cow"].delete(pred)
    cow_delete_sec = time.perf_counter() - t0

    # warm each variant once, then timed runs
    for t in tables.values():
        t.read().count()
    read_base = _agg_time(tables["base"], runs)
    read_mor = _agg_time(tables["mor"], runs)
    read_cow = _agg_time(tables["cow"], runs)

    n = tables["base"].read().count()
    suppressed = n - tables["mor"].read().count()
    print(
        json.dumps(
            {
                "metric": "dv_read_overhead",
                "sf_dir": sf_dir,
                "rows": n,
                "suppressed": suppressed,
                "runs": runs,
                "delete_sec": {
                    "merge_on_read": round(mor_delete_sec, 3),
                    "copy_on_write": round(cow_delete_sec, 3),
                },
                "read_sec": {
                    "base_no_dv": round(read_base, 3),
                    "dv_applied": round(read_mor, 3),
                    "copy_on_write": round(read_cow, 3),
                },
                "dv_read_ratio_vs_cow": round(read_mor / read_cow, 3),
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-sweep evidence for the dedup/ANN family AND the streaming
family: time each query at sf0.01 and sf0.1 (10x the rows) and report
the scaling ratio.

A scale-correct bucketed/banded plan should grow ~linearly in the input
(ratio ~= 10 for compute-bound ops, below 10 while fixed per-query
overhead — session, planning, Python worker pools — still dominates).
A quadratic corpus-wide self-join would show ratios far above 10.

STREAMING queries (round-9 verdict #7) spool 10x the rows through the
same availableNow drain, so the ratio measures STATE-STORE scaling vs
spool size: watermark-bounded operators (dropDuplicatesWithinWatermark,
session windows, interval joins) hold state proportional to the in-
horizon keys, so their wall time must also stay ~linear — an operator
whose state failed to evict would blow past 10x as every micro-batch
rescans the accumulated store. Micro-batch protocol overhead (trigger
setup, checkpoint commits) is per-BATCH fixed cost, which is why
observed streaming ratios sit well under 10 at these sizes.

Protocol (BASELINE.md re-pin rules apply): run SOLO — concurrent Spark
work poisons the medians; check /proc/loadavg first. Each query is
warmed once at each scale (AQE picks different physical plans per
scale, so a small-scale warmup does not compile the large-scale code),
then timed 3x; medians are reported.

Usage: python tools/bench_scale.py [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401  (registers the query registry)
from scalable_etl_spark.registry import QUERIES
from scalable_etl_spark.session import get_spark

DEFAULT = (
    "minhash_lsh", "ngram_jaccard_gated", "ann_ivf", "dedup_components",
    # streaming family: one query per state-store shape (dedup state,
    # running per-key totals, dynamic session merge, interval join
    # with watermark-finalized null emission)
    "streaming_dedup_counts", "streaming_stateful_totals",
    "streaming_session_windows", "streaming_outer_join",
    # round-10: the distributed scan planner — the ratio measures the
    # whole commit+plan+read cycle (sidecar write, Spark plan job over
    # it, pruned scan, aggregate) against 10x the rows
    "sink_tx_distributed_scan",
    # round-11: the streaming CDF source — the ratio measures the full
    # corpus-commit + commit-log-stream + per-version-MERGE cycle;
    # offset planning is O(dirs-per-commit) metadata, so growth must
    # track the row volume, not the version count
    "streaming_cdf_dedup",
    # round-15: row tracking — the ratio measures the full
    # enable/append/MOR-delete/compact/MERGE/reorg gauntlet with the
    # per-commit footer walk, the broadcast base-map join on every
    # id read, and the id-preserving merge key join; commit-protocol
    # fixed costs dominate at these sizes, data-bound legs scale with
    # rows. Plus the In-list disjunction read (sink_tx_bloom): the
    # per-value probe set is fixed, so growth tracks the probed files
    "sink_tx_row_ids", "sink_tx_bloom",
)
SCALES = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    spark = get_spark(app_name="bench-scale")
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        per_scale: dict[str, float] = {}
        for sf_dir in SCALES:
            fn(spark, sf_dir).count()  # warm THIS scale's plan/codegen
            times = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                times.append(time.time() - t0)
            per_scale[sf_dir.rsplit("/", 1)[-1]] = round(
                statistics.median(times), 3
            )
        ratio = round(per_scale["sf0.1"] / max(per_scale["sf0.01"], 1e-9), 2)
        out[name] = {**per_scale, "ratio": ratio}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"loadavg_at_start": load1, "queries": out}))


if __name__ == "__main__":
    main()

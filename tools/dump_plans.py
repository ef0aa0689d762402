"""Regenerate PLANS.md: formatted physical plans for headline queries,
annotated with the plan features that matter at 100 TB (pushdown,
broadcast choices, absence of nested-loop joins, codegen stages).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Import the driver contract so every registered query (all modules)
# is available to headline.
import __spark_entry__  # noqa: F401
from scalable_etl_spark.registry import QUERIES
from scalable_etl_spark.session import get_spark

# query -> the property the plan must show, stated for the reader
HEADLINERS = {
    "pricing_summary": (
        "Flagship scan-agg (TPC-H Q1 shape). Expect: PushedFilters + "
        "pruned ReadSchema at the parquet scan, partial_ aggregation "
        "before the exchange (map-side combine), whole-stage codegen "
        "(*(n) stages), zero Python."
    ),
    "top_customers": (
        "Fact-dim join. Expect: BroadcastHashJoin (customer broadcast), "
        "TakeOrderedAndProject instead of global sort+limit."
    ),
    "rolling_active_users": (
        "Trailing-7-day band join, rewritten as explode + hash "
        "aggregation. Expect: NO BroadcastNestedLoopJoin anywhere — "
        "the non-equi join shape is gone from the physical plan."
    ),
    "purchase_asof_view": (
        "As-of join as union + window carry-forward. Expect: one "
        "Exchange on user_id + one Sort feeding a Window; no join "
        "operator at all."
    ),
    "session_event_join": (
        "Interval join via binned equi-join. Expect: SortMergeJoin/"
        "ShuffledHashJoin on (user_id, __bin) + post-filter; no "
        "nested loop."
    ),
    "ngram_jaccard": (
        "PPJoin+ exact similarity join. Expect: window-ranked prefix "
        "table, equi-join on shingle hash, groupBy pair (group-level "
        "positional filter), ArrowEvalPython ONLY on the tiny "
        "candidate-pair stage (suffix probe), array_intersect "
        "verification in codegen, no cartesian/BNLJ anywhere."
    ),
    "minhash_lsh": (
        "MinHash+LSH dedup. Expect: one wide partial aggregation for "
        "signatures, equi-join on (band, bucket), broadcast semi-join "
        "pruning before verification."
    ),
    "ngram_jaccard_gated": (
        "LSH-gated exact Jaccard (the corpus-scale spelling). Expect: "
        "the same signature/band/verify shape as minhash_lsh with the "
        "24-perm/8-band gate — no shingle-bucket self-join anywhere, "
        "so no hot-shingle quadratic term exists in the plan."
    ),
    "semantic_dedup": (
        "SemDeDup cluster-then-prune. Expect: ArrowEvalPython for the "
        "broadcast-centroid assignment (pure map, no shuffle), ONE "
        "exchange on cluster id into FlatMapGroupsInPandas (the "
        "within-cluster scorer), then a small left join + aggregate; "
        "no cross-cluster product."
    ),
    "pii_redaction": (
        "PII scrub. Expect: pure map stage (regexp_replace/regexp_count "
        "inside whole-stage codegen), single small hash aggregate on "
        "source, zero Python, no extra exchange."
    ),
    "passage_dedup": (
        "Passage-level dedup. Expect: chunking via higher-order "
        "expressions in the scan projection (no explode-regroup "
        "round-trip), then one partial_count/distinct aggregate pair "
        "on (source, md5) — shuffle carries fixed-width hashes only."
    ),
    "sink_tx_skipping": (
        "Data-skipping read on a clustered snapshot table. Expect: the "
        "parquet scan's file listing covers ONLY the files whose "
        "footer [min, max] intersects user_id in [3, 7] (fewer "
        "files than the 8 the clustered write produced — the manifest "
        "pruned the rest before Spark listed anything), plus the "
        "residual Filter and a partial/final hash aggregate."
    ),
    "sink_tx_partition_ops": (
        "Partition-scoped DML read-back (round 8). Expect: the two "
        "pruned reads each scan ONLY their partition's manifest "
        "entries (the union lists two narrow InMemoryFileIndex path "
        "sets, not the whole table), partition values parsed from the "
        "hive components via basePath, then one partial/final hash "
        "aggregate; zero Python."
    ),
    "sink_tx_deletion_vectors": (
        "Merge-on-read DML read-back (round 13). Expect: each DV'd "
        "entry's scan carries the _metadata file_path/row_index "
        "projection and a BroadcastHashJoin LeftAnti against the "
        "deletion-vector sidecar (BuildRight on the tiny position "
        "list — NO shuffle anywhere in the suppression), then the "
        "usual partial/final hash aggregate. The 'compacted' stage's "
        "read shows a plain scan: compaction materialized the "
        "suppressions away. Zero Python, no CartesianProduct."
    ),
    "sink_tx_reorg": (
        "REORG APPLY PURGE read-back (round 14). Expect: a PLAIN "
        "parquet union scan — no _metadata projection, no "
        "BroadcastHashJoin LeftAnti — because reorg materialized the "
        "deletion vectors and the stale dropped-column bytes away; "
        "the epoch-2 entry's path in the scan is the SAME dir the "
        "pre-reorg manifest held (clean entries survive verbatim — "
        "O(dirty) maintenance). The re-added 'flag' column reads as "
        "a literal default fill folded into the projection, not a "
        "file column. Zero Python, no CartesianProduct."
    ),
    "sink_tx_row_ids": (
        "Row-tracking read-back (round 15). Expect: post-gauntlet "
        "scans project _metadata file_path/row_index, one "
        "BroadcastHashJoin (LeftOuter, BuildRight) against the tiny "
        "LocalTableScan of per-file base_row_ids — the id derivation "
        "is the DV-suppression join pattern, so the corpus scan "
        "NEVER shuffles for ids — and materialized entries "
        "coalesce(physical _row_id, base + row_index) in the "
        "projection. Then the usual partial/final aggregate. Zero "
        "Python, no CartesianProduct."
    ),
    "rollup_revenue": (
        "ROLLUP aggregate (round-8 promoted analytics family). "
        "Expect: a single Expand feeding partial_ then final "
        "HashAggregate — grouping sets share one scan and one "
        "exchange; no per-level re-scan."
    ),
    "media_pixel_stats": (
        "Four-codec media decode (round 8). Expect: one narrow "
        "round-robin exchange spreading the id frame across cores, "
        "four parallel ArrowEvalPython/MapInPandas legs (the "
        "pure-Python codecs are the deliberate exception to the "
        "no-Python rule — plumbing is Arrow-batched, partition-"
        "preserving), a union, broadcast join back to sources, and "
        "one tiny aggregate."
    ),
    "streaming_ingest_exactly_once": None,  # streaming: skip explain
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dump-plans")
    out = [
        "# PLANS — physical plans of headline queries",
        "",
        f"Generated by `python tools/dump_plans.py` at `{sf_dir}` "
        "(plans are scale-independent: the same shapes run on a "
        "1000-executor cluster; only partition counts change).",
        "",
    ]
    for name, note in HEADLINERS.items():
        if note is None:
            continue
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", note, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()

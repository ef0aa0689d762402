"""Physical-plan shape assertions for the headline queries: every
non-equi join shape must compile to hash joins (never a nested loop or
cartesian product), and small dimensions must broadcast. These are the
properties that decide whether a plan survives a 100x scale-up — pinned
here so a regression in an operator rewrite fails CI, not production.
"""

from __future__ import annotations

import pytest

import scalable_etl_spark.queries  # noqa: F401
import scalable_etl_spark.queries_analytics  # noqa: F401
import scalable_etl_spark.queries_llm  # noqa: F401
from scalable_etl_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


NESTED = ("BroadcastNestedLoopJoin", "CartesianProduct")

# Queries whose logical shape is a non-equi join (band, as-of,
# interval, LSH candidate generation) — each MUST have been rewritten
# to equi-joins, windows, or explodes; a nested-loop operator in any
# of these plans means the rewrite silently regressed.
NO_NESTED_LOOP = [
    "rolling_active_users",
    "purchase_asof_view",
    "session_event_join",
    "minhash_lsh",
    "embedding_near_dup",
    "simhash_near_dup",
    "ngram_jaccard",
    "salted_segment_revenue",
]

# ann_brute_force intentionally crossJoins a broadcast 10-row query set
# against the corpus — the one place a nested-loop product is the
# RIGHT plan (documented in operators/similarity.py) — so it is absent
# from the list above.


@pytest.mark.parametrize("name", NO_NESTED_LOOP)
def test_no_nested_loop_join(spark, name):
    plan = _plan(QUERIES[name](spark, SF_DIR))
    for op in NESTED:
        assert op not in plan, f"{name}: {op} in physical plan"


@pytest.mark.parametrize(
    "name", ["top_customers", "revenue_by_region", "rollup_revenue"]
)
def test_small_dims_broadcast(spark, name):
    plan = _plan(QUERIES[name](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, f"{name}: dimension not broadcast"


def test_pricing_summary_stays_in_codegen(spark):
    # The flagship scan-agg query must be whole-stage codegen end to
    # end: no Python workers (BatchEvalPython/ArrowEvalPython) anywhere.
    # AQE only materializes codegen stage wrappers in the FINAL plan,
    # so execute before inspecting.
    df = QUERIES["pricing_summary"](spark, SF_DIR)
    df.collect()
    plan = _plan(df)
    # "*(n)" prefixes mark whole-stage-codegen stages in the final plan.
    assert "*(" in plan
    assert "EvalPython" not in plan


# New curation/analytics queries: pin the scale-critical properties.


def test_benchmark_contamination_broadcasts_bench_side(spark):
    import scalable_etl_spark.queries_pipeline  # noqa: F401

    plan = _plan(QUERIES["benchmark_contamination"](spark, SF_DIR))
    # The benchmark shingle set must broadcast; the training corpus
    # must never be the build side of anything.
    assert "BroadcastHashJoin" in plan
    for op in NESTED:
        assert op not in plan


def test_vocab_coverage_broadcasts_vocab(spark):
    import scalable_etl_spark.queries_pipeline  # noqa: F401

    plan = _plan(QUERIES["vocab_coverage"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # Top-k vocab must be TakeOrderedAndProject, not a global sort.
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan  # pure JVM path


def test_stratified_and_packing_stay_in_codegen(spark):
    import scalable_etl_spark.queries_pipeline  # noqa: F401

    for name in ("stratified_sample", "token_len_histogram",
                 "deterministic_split"):
        df = QUERIES[name](spark, SF_DIR)
        df.collect()
        plan = _plan(df)
        assert "*(" in plan, f"{name}: no whole-stage codegen"
        assert "EvalPython" not in plan, f"{name}: Python in hot path"


def test_funnel_no_nested_loop(spark):
    import scalable_etl_spark.queries_analytics  # noqa: F401

    for name in ("funnel_view_click_purchase", "cohort_retention",
                 "fk_integrity_audit", "event_state_intervals"):
        plan = _plan(QUERIES[name](spark, SF_DIR))
        for op in NESTED:
            assert op not in plan, f"{name}: {op} in physical plan"


# ---------------------------------------------------------------------
# Sweeping audit: EVERY registered batch query. The curated tests above
# pin named rewrites; this sweep catches a forbidden operator sneaking
# into any future query. Sink/streaming/source queries are excluded —
# building their DataFrame executes real writes/drains (they're plan-
# audited via their own tests and the oracle gate).

# BroadcastNestedLoopJoin is allowed ONLY where the build side is a
# bounded broadcast by construction:
#   active_user_pct / sql_rolling_band_cte / mixture_weights: 1-row
#     scalar-subquery cross joins;
#   ann_brute_force / ann_ivf: the <=10-row query-vector set crossed
#     against the corpus / centroid probes (operators/similarity.py
#     documents why that product is the right plan).
BNLJ_ALLOWED = {
    "active_user_pct",
    "sql_rolling_band_cte",
    "ann_brute_force",
    "ann_ivf",
    "mixture_weights",
}


def test_all_batch_plans_free_of_scale_hazards(spark):
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        if name.startswith(("sink_", "streaming_", "source_")):
            continue
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct (unbounded product)")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: BatchEvalPython (row-at-a-time UDF)")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            failures.append(f"{name}: BroadcastNestedLoopJoin not allow-listed")
    assert not failures, "\n".join(failures)


def test_side_effect_query_plans_free_of_scale_hazards(spark):
    """The sweep above skips sink_/streaming_/source_ queries because
    building their DataFrame executes real writes / stream drains.
    Run them anyway (sf0.001 side effects land in throwaway tempdirs)
    and audit the RETURNED frame's physical plan — the read-back /
    verification side the driver actually grades. Closes the r16
    blind spot where these families were only plan-audited ad hoc."""
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        if not name.startswith(("sink_", "streaming_", "source_")):
            continue
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct (unbounded product)")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: BatchEvalPython (row-at-a-time UDF)")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            failures.append(f"{name}: BroadcastNestedLoopJoin not allow-listed")
    assert not failures, "\n".join(failures)

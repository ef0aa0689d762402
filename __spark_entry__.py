"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``scalable_etl_spark`` package; this module
only adapts the registry to the driver's shape. Importing
``scalable_etl_spark.queries`` (and the other query modules) populates
``registry.QUERIES`` / ``registry.ORACLE_SQL`` via the @query decorator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing these modules registers every query + oracle pair.
#
# ORDER MATTERS: the driver grades the first 50 registry entries. The
# window = the five §2 core modules (minus _DEMOTED extras) followed by
# the _PROMOTED LLM-pipeline headliners; everything else remains
# oracle-checked locally via tools/check_correctness.py.
import scalable_etl_spark.queries  # noqa: F401  (33)
import scalable_etl_spark.queries_sql  # noqa: F401  (5)
import scalable_etl_spark.queries_sources  # noqa: F401  (4)
import scalable_etl_spark.queries_sinks  # noqa: F401  (4)
import scalable_etl_spark.queries_streaming  # noqa: F401  (4)
import scalable_etl_spark.queries_analytics  # noqa: F401
import scalable_etl_spark.queries_llm  # noqa: F401
import scalable_etl_spark.queries_pipeline  # noqa: F401
from scalable_etl_spark.registry import ORACLE_SQL, QUERIES
from scalable_etl_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    tune_session(spark)
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# Canonical module ordering for the graded window. Re-sorting here (a
# stable sort — within-module registration order is preserved) makes the
# first-50 window independent of process import history: under pytest a
# test module can import queries_llm before this module runs, which
# would otherwise reshuffle dict insertion order.
_MODULE_ORDER = (
    "queries",
    "queries_sql",
    "queries_sources",
    "queries_sinks",
    "queries_streaming",
    "queries_analytics",
    "queries_llm",
    "queries_pipeline",
)

# The driver-graded window = the EXPLICIT first-50 list below, chosen
# each round OLDEST-LAST-GRADE-FIRST from tools/grading_rounds.py
# (which derives per-query last-green rounds mechanically from the
# CORRECTNESS_r*.json files -- verdict r14 #4: rotation banking cites
# derived provenance, never hand-tracked claims). ROUND-15 ROTATION:
# the 4 never-graded entries (sink_tx_row_ids is NEW this round --
# row tracking; clone/zorder_2d/video registered late r14), the
# entire r7 cohort (5), the entire r8 cohort (24), everything last
# graded r9-r12 (10), topped up with 7 of the oldest r13/r14 rows so
# every SURVEY family keeps a representative (the sql_/source_
# members are all r13+ -- their stalest rows fill those slots).
# Everything r13/r14-green rotates out, banked, and stays value-hash
# checked locally via tools/check_correctness.py.
_WINDOW = (
    # never driver-graded (r0)
    "sink_tx_row_ids",
    "sink_tx_clone",
    "sink_tx_zorder_2d",
    "media_video_frame_stats",
    # last green r7
    "benchmark_contamination",
    "incremental_corpus_dedup",
    "media_pixel_stats",
    "passage_dedup",
    "pii_redaction",
    # last green r8
    "cohort_retention",
    "cube_type_daily",
    "dedup_components_star",
    "embedding_clusters",
    "event_state_intervals",
    "fk_integrity_audit",
    "funnel_view_click_purchase",
    "gapfill_user_daily",
    "hash_rank_sample",
    "incremental_agg_merge",
    "pivot_event_values",
    "rolling_active_users",
    "rolling_weekly_value",
    "rollup_revenue",
    "salted_segment_revenue",
    "semantic_dedup",
    "session_event_join",
    "sink_tx_delete",
    "sink_tx_merge_upsert",
    "streaming_join_windowed",
    "streaming_stream_join",
    "top_users",
    "unpivot_daily_values",
    "user_value_deciles",
    # last green r9
    "embedding_norms",
    "media_features",
    # last green r10
    "sink_tx_convert",
    "sink_tx_restore",
    # last green r11
    "bigram_pmi",
    "sink_tx_bloom",
    "streaming_session_windows",
    "tfidf_top_terms",
    # last green r12
    "doc_fingerprints",
    "top_tokens",
    # r13/r14 family top-up (stalest available per family) + the
    # round's second NEW registration (row-id drop-list curation loop)
    "sql_catalog_scan",
    "sql_rolling_band_cte",
    "source_glob_recursive",
    "pricing_summary",
    "events_silver",
    "sink_tx_deletion_vectors",
    "row_id_drop_list",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering contract (the driver grades the first 50 entries):
    the explicit ``_WINDOW`` list (oldest-last-grade-first, derived
    from tools/grading_rounds.py) -> everything else in module order
    (stable within each module, so tier-2 ordering is independent of
    process import history).
    """
    prio = {
        f"scalable_etl_spark.{m}": i for i, m in enumerate(_MODULE_ORDER)
    }
    wrank = {n: i for i, n in enumerate(_WINDOW)}

    def key(n: str) -> tuple[int, int]:
        if n in wrank:
            return (0, wrank[n])
        return (
            1, prio.get(QUERIES[n].__module__, len(_MODULE_ORDER))
        )

    names = sorted(QUERIES, key=key)
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query name (same aliases as the Spark side)."""
    return dict(ORACLE_SQL)

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

# Queries promoted into the driver-graded first-50 window (round-9
# rotation, per the round-8 verdict's "Next round" #1): ALL 20
# never-driver-graded tier-2 queries — the text/doc/media analysis
# family (tfidf/pmi/winnowing/bpe/gopher/repetition/fingerprints/
# zscore), curation (mixture_weights/vocab_coverage/deterministic_split/
# token_len_histogram/top_tokens), media (features/frame_sample/
# audio_energy), near_dedup_corpus, user_sessions, embedding_norms and
# grouping_sets_activity. Together with the four un-demoted late-r8
# core queries (sink_tx_convert/restore/bloom, streaming_outer_join),
# every query that had never been driver-graded is in the r9 window.
# The round-8 headliners (the analytics family + semantic_dedup/
# embedding_clusters/dedup_components_star/hash_rank_sample) went
# driver-green in CORRECTNESS_r08.json and rotate back to local-oracle
# checking. Order within the tuple is the order they appear after the
# §2 core.
_PROMOTED = (
    "grouping_sets_activity",
    "doc_gopher_rules",
    # (round-12 rotation: tfidf_top_terms and bigram_pmi went
    # driver-green in CORRECTNESS_r11.json and rotate back to
    # local-oracle checking — the text-analysis family stays repped
    # by gopher/winnowing/bpe/repetition/fingerprints/zscore. Their
    # slots fund the two never-driver-graded r11 registrations,
    # sink_tx_constraints + sink_tx_time_travel, per verdict #1.)
    "winnowing_fingerprints",
    "bpe_token_stats",
    "doc_repetition",
    # (round-13 rotation: doc_fingerprints and top_tokens went
    # driver-green in CORRECTNESS_r12.json and rotate back to
    # local-oracle checking — fingerprinting stays repped by
    # winnowing_fingerprints, token analysis by bpe_token_stats +
    # token_len_histogram. Their slots fund incremental_minhash_index
    # — the only never-driver-graded registry entry after r12, per
    # verdict #2 — and the NEW sink_tx_deletion_vectors tier-0
    # registration.)
    "incremental_minhash_index",
    "doc_len_zscore_by_lang",
    "token_len_histogram",
    "mixture_weights",
    "vocab_coverage",
    "deterministic_split",
    "user_sessions",
    "near_dedup_corpus",
    "audio_energy_stats",
    "media_frame_sample",
    # --- round-10 rotation: embedding_norms and media_features went
    # driver-green in CORRECTNESS_r09.json and rotate back to
    # local-oracle checking (embeddings stay repped in the window by
    # near_dedup_corpus; media by media_frame_sample +
    # audio_energy_stats + the new lossy leg). Their slots go to the
    # round's new registration and the un-demoted sink_tx_evolve
    # (see _DEMOTED).
    "media_pixel_stats_lossy",
)

# Beyond-reference §2 extras rotated out of the graded window to make room
# (every §2 operator family stays represented — see tests/test_cli.py
# test_registry_contract).  These remain fully value-hash oracle-checked
# locally via tools/check_correctness.py; only the driver-window slot
# moves. recent_events / monthly_trends joined in round 7: their O1-O4
# sort/limit shapes stayed driver-green for two straight rounds and are
# also covered by top_users / shipping_priority.
_DEMOTED = (
    "priority_line_counts",
    "salted_value_by_type",
    "hll_distinct_users",
    "hll_union_users",
    "value_quantiles_by_type",
    "customer_order_gaps",
    "profile_events_columns",
    "brand_promo_share",
    "purchase_asof_view",
    "nation_customer_stats",
    "mktsegment_order_priority",
    "top_supplier_revenue",
    "recent_events",
    "monthly_trends",
    "value_by_type",
    # round-7 late rotation: make room for the two new graded streaming
    # queries (session windows, stream-stream join). SET ops stay
    # represented by gold_schema_merge + users_error_no_purchase;
    # grouped counts by pricing_summary/type_diversity; the Q3
    # join-agg-sort shape by revenue_by_region + top_users.
    "users_purchase_and_signup",
    "order_priority_counts",
    "sql_type_share_cte",  # S7 stays represented by 3 other sql_ queries
    "sql_correlated_subquery",  # ditto (driver-green r6; decorrelation
    # is additionally pinned by the plan-shape suite)
    "user_stats",  # A2 stays repped by gold_user_peaks; makes room for
    # the graded row-level DELETE (sink_tx_delete)
    # --- round-8 rotation: bank the r7-graded tx family (all five went
    # driver-green in CORRECTNESS_r07.json; the K-family stays repped in
    # the window by sink_table_roundtrip/sink_tx_merge_upsert/
    # sink_tx_delete/sink_tx_partition_ops/sink_bucketed_join) ...
    "sink_tx_skipping",
    "sink_tx_zorder",
    "sink_tx_changes",
    "sink_tx_sync",
    "sink_tx_interop",
    # ... and free seven more tier-0 slots for the analytics promotion.
    # Each demotee is driver-green (r6 and/or r7) and its §2 family
    # keeps another window representative: Q5/Q3 join-agg shapes ->
    # top_customers + promoted salted_segment_revenue/session_event_join;
    # K6 insert-ignore -> sink_tx_merge_upsert; K2 atomic ->
    # sink_table_roundtrip + sink_tx_partition_ops; tumbling/sliding
    # stream windows -> streaming_session_windows +
    # streaming_join_windowed; stream-static enrich ->
    # streaming_stream_join.
    "revenue_by_region",
    "shipping_priority",
    "sink_insert_ignore",
    "sink_tx_atomic_overwrite",
    "streaming_event_counts",
    "streaming_enriched_counts",
    "streaming_sliding_counts",
    # --- round-9 rotation: the four late-r8 registrations left this
    # list (driver-graded for the first time this round), and six
    # r8-driver-green core queries take their parked slots so the
    # 20-wide tier-1 promotion fits. Family coverage after the swap:
    # O1 sort-limit -> top_customers (+ nulls_last_ranking for O2);
    # J1 band join -> sql_rolling_band_cte; K6 upsert/DML ->
    # sink_tx_partition_ops + sink_tx_convert/restore/bloom;
    # stream-stream joins -> streaming_outer_join (the interval LEFT
    # OUTER superset of the inner/windowed shapes).
    "top_users",
    "rolling_active_users",
    "sink_tx_merge_upsert",
    "sink_tx_delete",
    "streaming_stream_join",
    "streaming_join_windowed",
    # (round-10: sink_tx_evolve — parked here through r9 — rotated INTO
    # the window as planned: it left this list, taking the tier-0 slot
    # freed by the media_features/embedding_norms promotion retirement.)
    # (round-11: sink_tx_distributed_scan — parked here late-r10 as the
    # only never-driver-graded query — rotated INTO the window as the
    # r10 verdict's #1 directed. Its tier-0 slot and the one for the
    # NEW streaming_cdf_dedup registration come from banking the
    # r10-driver-green sink_tx_convert / sink_tx_restore below.)
    # Round-11 rotation: convert/restore went driver-green in
    # CORRECTNESS_r10.json; the K6 ACID family stays represented in the
    # window by sink_tx_partition_ops / sink_tx_bloom / sink_tx_evolve
    # / sink_tx_distributed_scan (+ roundtrip/describe for K2/K3/K8),
    # and both remain fully value-hash oracle-checked locally.
    "sink_tx_convert",
    "sink_tx_restore",
    # (round-12: sink_tx_constraints / sink_tx_time_travel — parked
    # here late-r11 as the only never-driver-graded queries — rotated
    # INTO the window as verdict #1 directed. Their tier-0 slots and
    # the two for the NEW round-12 registrations
    # streaming_constraint_gate / streaming_cdf_gold_refresh come
    # from banking the r11-driver-green sink_tx_bloom /
    # streaming_session_windows below and retiring tfidf_top_terms /
    # bigram_pmi from _PROMOTED.)
    # Round-12 rotation: both driver-green in CORRECTNESS_r11.json;
    # K6 point-lookup skipping stays repped in the window by
    # sink_tx_partition_ops / sink_tx_evolve / sink_tx_distributed_scan
    # and the bloom feature stays pinned by tests/test_acid.py;
    # SESSION windows stay repped by streaming_stateful_totals /
    # streaming_outer_join (+ local oracle checks as ever).
    "sink_tx_bloom",
    "streaming_session_windows",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering contract (the driver grades the first 50 entries):
    §2 core (module order, minus the demoted extras) -> the 10 promoted
    LLM-pipeline headliners -> everything else in module order.
    """
    prio = {
        f"scalable_etl_spark.{m}": i for i, m in enumerate(_MODULE_ORDER)
    }
    promoted_rank = {n: i for i, n in enumerate(_PROMOTED)}
    n_core = 5  # queries..queries_streaming = the §2 core modules

    def key(n: str) -> tuple[int, int]:
        if n in promoted_rank:
            return (1, promoted_rank[n])
        mod_prio = prio.get(QUERIES[n].__module__, len(_MODULE_ORDER))
        tier = 0 if mod_prio < n_core and n not in _DEMOTED else 2
        return (tier, mod_prio)

    names = sorted(QUERIES, key=key)
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query name (same aliases as the Spark side)."""
    return dict(ORACLE_SQL)

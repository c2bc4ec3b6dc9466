"""bigdataprojectspring16_spark — a PySpark-native analytics engine.

A brand-new, idiomatic DataFrame/SQL/Catalyst/Structured-Streaming
engine with the query and data-processing capabilities attributed to
``anirudhbharadwaj/BigDataProjectSpring16`` (reference checkout at
/root/reference is empty — see SURVEY.md §0; the capability envelope is
fixed by SURVEY.md §2's operator inventory instead).

Public surface:
    get_session()        — tuned SparkSession factory (SURVEY §4 configs)
    load_tables()        — parquet star-schema loader
    registry.QUERIES     — name -> (spark, sf_dir) -> DataFrame
    registry.ORACLES     — name -> DuckDB oracle SQL string
"""

from .session import get_session
from .sql import PORTABLE_SQL_KEYS, register_views
from .tables import TABLE_NAMES, load_tables
from .registry import QUERIES, ORACLES, query

# Importing the operator modules populates the registry.
from .operators import setops, analytics  # noqa: F401
from .functions import scalars, udfs  # noqa: F401
from .streaming import batch_windows  # noqa: F401
from .llmops import curation, dedup, graph, similarity, text, pipeline, corpus  # noqa: F401
from .multimodal import ops as multimodal_ops  # noqa: F401
from .operators import scans, projection, joins, aggregates, windows, sorts  # noqa: F401

# Registry order == the order the driver's verify walks the keys, and
# each round's driver run is capped at 50 entries (CORRECTNESS_r01-r03
# each contain exactly 50).  Key-level prioritization for round 4
# (VERDICT.md r3 "Next round" items 1-2, 6):
#   1. The 34 keys NEVER inside a driver window after r1+r2+r3
#      (exactly: registry keys minus the union of the three
#      CORRECTNESS files' key sets) — once these run, every registry
#      key has hard driver signal at least once.
#   2. Keys whose code changed or that were added this round (per
#      ADVICE r2 discipline, changed code verifies FIRST):
#      multimodal_features (output reshaped to hash-safe scalar rows
#      + promoted from rows-only to oracle-keyed — must clear the r3
#      err), and the two new watermark batch-twin census keys.
#   3. The CC fixpoint pair (graph_cluster_keep_best touched by the
#      r4 perf item; its helper is shared with connected components).
#   4. 11 refresh slots for keys last checked in r1, spread across
#      modules, so the oldest hard signal keeps rotating forward.
_DRIVER_WINDOW_PRIORITY = [
    # -- group 1: the 34-key never-driver-checked backlog --
    "rollup_incremental_merge", "tpch_q4_late_order_priority",
    "tpch_q21_sole_late_supplier", "tpch_q22_idle_customers",
    "orders_market_basket", "events_decayed_user_value",
    "tpch_q2_min_cost_supplier", "supplier_return_rate_topk",
    "events_inter_arrival_stats", "orders_open_backlog_by_month",
    "events_time_heatmap", "udf_batch_model_score",
    "stream_join_pairs", "graph_pagerank_rounds",
    "docs_leakage_safe_split", "dedup_incremental_batch",
    "text_bigram_pmi", "embeddings_dim_stats", "text_vocab_coverage",
    "embeddings_whiten_qa", "docs_review_queue",
    "dedup_threshold_sweep", "text_perplexity_bigram",
    "kmeans_lloyd_rounds", "docs_fold_contamination",
    "multimodal_block_dedup", "multimodal_payload_near_dup",
    "sample_kfold_stratified", "subquery_scalar_agg",
    "join_range_bucketed", "agg_salted_topk", "agg_multi_distinct",
    "window_rolling_median", "sort_nulls_boundary",
    # -- group 2: changed / added this round --
    "multimodal_features", "stream_late_events_census",
    "stream_dedup_census",
    # -- group 3: CC fixpoint pair (r4 perf work touches it) --
    "graph_cluster_keep_best", "graph_connected_components",
    # -- group 4: the dedup module changed this round (barrier-knob
    #    refactor, shipped flag-off = identical plans; all four
    #    re-MATCHed locally) — changed code re-verifies first --
    "dedup_minhash_lsh", "dedup_near_jaccard", "dedup_ngram_jaccard",
    "dedup_edit_distance",
    # -- group 5: changed late in r4 (sub-second truncation fixes;
    #    window_range_frame re-verifies here, sessionize_gap_batch
    #    takes a refresh slot) + oldest-signal r1 refreshes --
    "window_range_frame", "sessionize_gap_batch",
    "join_asof", "join_skew_events_customers", "subquery_correlated",
    "agg_percentiles", "sort_multikey",
]


def _prioritize(priority: list[str]) -> None:
    missing = [k for k in priority if k not in QUERIES]
    if missing:
        raise ValueError(f"unknown priority keys: {missing}")
    order = priority + [k for k in QUERIES if k not in set(priority)]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({k: snapshot[k] for k in order if k in snapshot})


_prioritize(_DRIVER_WINDOW_PRIORITY)

__all__ = [
    "get_session",
    "load_tables",
    "TABLE_NAMES",
    "QUERIES",
    "ORACLES",
    "query",
]

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
from .operators import tpch  # noqa: F401

# Registry order == the order the driver's verify walks the keys, and
# each round's driver run is capped at 50 entries (every
# CORRECTNESS_r0N.json contains exactly 50). Standing rotation rule
# (ADVICE r2 discipline): keys whose code changed this round verify
# FIRST, then the stalest-signal cohort, oldest round first.
_DRIVER_WINDOW_PRIORITY = [
    # r10 rotation (VERDICT r9 next-round #1): drain the r5-stale
    # cohort and re-verify the one key whose code changed AFTER its
    # newest driver check. Derived by unioning CORRECTNESS_r01..r09
    # key sets and keeping each key's newest round: histogram is
    # r5:21, r6:42, r7:40, r8:50, r9:50. Window = the 4 new keys + 3
    # changed-code keys + the remaining 20 r5 keys + the 23
    # alphabetically-first of the 39 ORACLE-KEYED r6 keys. Left for
    # r11: the 16 remaining oracle-keyed r6 keys (tpch_q3/q5..q9,
    # tpch_q15/q17/q18/q19/q20, window_* five) plus the 3 sanctioned rows-only
    # keys (agg_approx_distinct, stream_watermark_late,
    # stream_dedup_watermark — weakest-signal checks, and their
    # semantics are pinned by the census twins checked r9).
    # -- group 0: the never-driver-checked keys added this round
    # (scan_dpp_orders_month, join_bucketed_colocated,
    # text_boilerplate_ngrams, scan_schema_evolution), then
    # changed-code keys
    # (agg_conditional's exact-cents fix landed after its last check;
    # the r10 partitioned-layout cache-keying fix touches
    # scan_partitioned_pruned; clean_outlier_iqr's sum_kept moved to
    # the exact cents grid after the sf10 batch-3 audit caught a
    # cent flip), then the rest of the 21 r5-stale keys --
    "scan_dpp_orders_month", "join_bucketed_colocated",
    "text_boilerplate_ngrams", "scan_schema_evolution",
    "agg_conditional", "scan_partitioned_pruned", "clean_outlier_iqr",
    "agg_corr_covar", "agg_distinct_count", "agg_listagg",
    "dedup_embedding_cosine", "dedup_minhash_lsh",
    "dedup_near_jaccard", "filter_compound",
    "filter_null_semantics", "join_anti", "join_asof_forward",
    "join_broadcast", "join_left_outer", "join_range_interval",
    "join_right_outer", "join_semi", "project_compute",
    "scan_parquet", "scan_with_pushdown", "sim_ivf_recall_audit",
    "sim_ivf_topk",
    # -- group 1: 23 of the 39 oracle-keyed r6-stale keys --
    "agg_bool_and_or", "agg_histogram_bins", "agg_max_by",
    "agg_mode", "agg_skew_kurtosis", "clean_outlier_zscore",
    "events_anomaly_mad", "events_decayed_user_value",
    "events_funnel", "join_asof_nearest", "join_multiway_star",
    "limit_topk", "orders_abc_by_segment", "orders_rfm_segments",
    "retention_cohorts", "stream_session", "stream_sliding",
    "stream_stateful_counter", "text_bm25_topk",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_ship_delay_priority", "tpch_q14_promo_share",
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

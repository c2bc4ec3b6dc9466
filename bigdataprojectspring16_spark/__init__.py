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
    # r11 rotation (VERDICT r10 next-round #1): drain the r6-stale
    # cohort entirely, then start on r7. Derived by unioning
    # CORRECTNESS_r01..r10 key sets and keeping each key's newest
    # round: histogram is r6:19, r7:40, r8:48, r9:50, r10:50.
    # Window = 2 changed-code keys + all 19 r6 keys (16 oracle-keyed
    # TPC-H/window keys + the 3 sanctioned rows-only keys, which get
    # the weaker rows>0 check refreshed) + the 29 alphabetically-first
    # of the 40 r7 keys. Left for r12: the 11 remaining r7 keys
    # (scalar_string, set_except, set_intersect, set_union_all,
    # set_union_distinct, timeseries_gap_fill, tpch_q16_supplier_cnt,
    # udaf_geomean, udf_grouped_zscore, udf_scalar_python,
    # udtf_surface), then the 48-key r8 cohort.
    # Changed-code keys this round are promoted to the head of the
    # list per the standing rule (ADVICE r2 discipline).
    # -- group 0: keys whose code changed in r11 after their newest
    # driver check (graph_pagerank_rounds: sharded-aggregate knob for
    # the sf10 8 g envelope; text_boilerplate_ngrams: n_boiler_shingles
    # re-derived from the distinct pair set so the fact-sized
    # shingle<->df merge join runs once, ADVICE r10) --
    "graph_pagerank_rounds", "text_boilerplate_ngrams",
    # -- group 1: the 19 r6-stale keys, oracle-keyed first --
    "tpch_q15_top_supplier", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders", "tpch_q19_disjunctive_revenue",
    "tpch_q20_lead_promo_suppliers", "tpch_q3_topk",
    "tpch_q5_local_supplier_volume", "tpch_q6_revenue_delta",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "window_first_last",
    "window_lag_lead", "window_ntile_percent", "window_rank_topn",
    "window_running_total", "agg_approx_distinct",
    "stream_dedup_watermark", "stream_watermark_late",
    # -- group 2: 29 of the 40 r7-stale keys, alphabetical --
    "agg_cube", "agg_global", "agg_grouping_sets",
    "agg_pricing_summary", "agg_rollup", "array_ops",
    "clean_impute_nulls", "clean_winsorize",
    "custdist_two_level_agg", "dedup_keep_best",
    "dedup_latest_by_key", "distinct_exact",
    "docs_curation_pipeline", "embeddings_pca_power",
    "events_dau_stickiness", "events_moving_avg_7d",
    "events_transition_matrix", "explode_wordcount",
    "graph_cluster_keep_best", "graph_connected_components",
    "join_interval_self_overlap", "join_null_safe",
    "map_from_entries", "map_hof", "pivot_event_types",
    "sample_class_balanced", "sample_domain_cap",
    "scalar_conditional", "scalar_date",
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

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
    # r6 rotation (VERDICT r5 next-round #4): never-driver-checked
    # keys first (NEW r6 keys), then r6-changed code, then the oldest
    # driver signals.
    # -- group 0: NEW r6 keys (BM25 retrieval, sequence packing,
    #    class-balanced sampling) --
    "text_bm25_topk", "docs_pack_sequences", "sample_class_balanced",
    "join_asof_nearest",
    # -- group 1: r6-changed code (operators/tpch.py money-grid
    #    rework, VERDICT r5 items 1/6: exact integer-cents sums, the
    #    q10 red fix, q15 cents equality, q11 integer cutoff) --
    "tpch_q10_returned_items", "tpch_q15_top_supplier",
    "tpch_q11_important_stock", "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_delta", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q17_small_qty_revenue", "tpch_q19_disjunctive_revenue",
    # unchanged this round but same r5 batch, kept with the family
    "tpch_q12_ship_delay_priority", "tpch_q20_lead_promo_suppliers",
    # r6-changed: money-grid / quantize-then-sum migrations from the
    #   SCALING.md float-sum-boundary audit (comparison sites and the
    #   round-below-summand-grid display sums)
    "clean_outlier_zscore", "agg_pricing_summary", "join_multiway_star",
    "clean_winsorize", "scalar_math", "events_decayed_user_value",
    # -- group 2: the 13 keys whose newest driver signal is r1
    #    (VERDICT r5 missing #3) --
    "agg_approx_distinct", "agg_bool_and_or", "agg_histogram_bins",
    "agg_max_by", "agg_mode", "agg_skew_kurtosis", "limit_topk",
    "window_first_last", "window_lag_lead", "window_ntile_percent",
    "window_rank_topn", "window_running_total", "window_share_of_total",
    # -- group 3: 25 of the 45 r2-signal keys — streaming first
    #    (stream_watermark_late / stream_dedup_watermark last showed
    #    as r2 rows-only FAILs before they were sanctioned), then the
    #    analytics composites and the UDF surface. The 20 remaining
    #    r2 keys (scalar/setop family, every one sf0.1-receipt-green
    #    each round) rotate in next round. --
    "stream_watermark_late", "stream_dedup_watermark", "stream_session",
    "stream_sliding", "stream_tumbling", "stream_stateful_counter",
    "events_anomaly_mad",
    "events_funnel", "orders_abc_by_segment",
    "orders_rfm_segments", "orders_yoy_growth", "retention_cohorts",
    "tpch_q14_promo_share", "tpch_q18_large_orders", "tpch_q3_topk",
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

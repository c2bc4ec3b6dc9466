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
    # r7 rotation (VERDICT r6 next-round #1): r7-changed code first
    # (changed code verifies FIRST, ADVICE r2 discipline), then ALL
    # 29 keys whose newest driver signal is r2, then 9 r3-stale
    # refresh slots. After this window lands, no key's newest real
    # driver signal is older than r3.
    # -- group 0a: NEW r7 keys (never driver-checked) --
    "agg_weighted_percentile", "join_interval_self_overlap",
    "sample_importance_reweight", "embeddings_pca_power",
    # -- group 0b: r7-changed code --
    #    ADVICE r6: overflow-safe pre-reduced Knuth hash, both sides
    #    (functions/hashing.py — 7 keys):
    "sample_class_balanced", "sample_hash_mod", "sample_stratified",
    "sample_domain_cap", "sample_kfold_stratified",
    "dedup_incremental_batch", "docs_fold_contamination",
    #    VERDICT r6 item 4: exact-integer-identity imputed sum:
    "clean_impute_nulls",
    #    ADVICE r6: charge partial re-gridded e6 -> e4 at level 1:
    "agg_pricing_summary",
    #    VERDICT r6 item 3: window-form star rounds (CC fixpoint):
    "graph_connected_components", "graph_cluster_keep_best",
    #    §SF1 grid-rule boundary fixes (the sf1 audit caught float
    #    money-sums flipping cents at table-scale groups; all six
    #    now sum exact integer cents, and clean_winsorize selects
    #    integer nearest-rank fences instead of interpolating):
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_global",
    "join_null_safe", "clean_winsorize",
    # -- group 1: the 29 r2-stale keys (VERDICT r6 item 1's list) --
    "array_ops", "custdist_two_level_agg", "dedup_keep_best",
    "dedup_latest_by_key", "distinct_exact", "docs_curation_pipeline",
    "events_dau_stickiness", "events_moving_avg_7d",
    "events_transition_matrix", "explode_wordcount", "json_extract",
    "map_from_entries", "map_hof", "merge_upsert_batch",
    "pivot_event_types", "scalar_conditional", "scalar_date",
    "scalar_string", "set_except", "set_intersect", "set_union_all",
    "set_union_distinct", "timeseries_gap_fill",
    "tpch_q16_supplier_cnt", "udaf_geomean", "udf_grouped_zscore",
    "udf_scalar_python", "udtf_surface", "unpivot_metrics",
    # (the r3-stale refresh slots and the comment-only
    # events_decayed_user_value were displaced by the six §SF1
    # grid-rule fixes above — proven-changed code outranks staleness
    # refresh; every displaced key is green in this round's full
    # sf0.01/sf0.1/sf1 receipt sweeps and rotates in r8)
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

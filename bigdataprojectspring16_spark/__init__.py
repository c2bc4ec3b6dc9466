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
    # r12 rotation (VERDICT r11 next-round #1): drain the r7-stale
    # cohort entirely, then start on r8. Derived by unioning
    # CORRECTNESS_r01..r11 key sets and keeping each key's newest
    # round: histogram is r7:11, r8:47, r9:50, r10:49, r11:50.
    # Window = 5 changed-code keys + all 11 r7 keys + the 34
    # alphabetically-first of the 47 r8 keys. Left for r13: the 13
    # remaining r8 keys (sim_pairs_threshold, stream_static_enrich,
    # stream_tumbling, text_char_entropy, text_clean_stopwords,
    # text_decontaminate, text_fingerprint, text_lang_stats,
    # text_langid, text_ngram_novelty, tpch_q22_idle_customers,
    # unpivot_metrics, window_share_of_total), then the 50-key r9
    # cohort. (VERDICT r11 #5's text_boilerplate_ngrams barrier was
    # measured and REJECTED — comment-only diff, plan unchanged, so
    # it is NOT re-promoted; receipt
    # tools/receipts/boilerplate_barrier_ab_r12.txt.)
    # -- group 0: keys whose verify stage changed in r12 after their
    # newest driver check (xxhash64 verify-token coding, default ON —
    # VERDICT r11 #3; hash-equal A/B receipt
    # tools/receipts/verify_codes_ab_r12.txt) --
    "dedup_minhash_lsh", "dedup_near_jaccard", "dedup_ngram_jaccard",
    "dedup_edit_distance", "dedup_threshold_sweep",
    # -- group 1: the 11 r7-stale keys, alphabetical --
    "scalar_string", "set_except", "set_intersect",
    "set_union_all", "set_union_distinct", "timeseries_gap_fill",
    "tpch_q16_supplier_cnt", "udaf_geomean", "udf_grouped_zscore",
    "udf_scalar_python", "udtf_surface",
    # -- group 2: 38 of the 47 r8-stale keys, alphabetical --
    "agg_having", "agg_weighted_percentile", "array_hof",
    "corpus_mix_report", "dedup_dup_rate_by_source",
    "dedup_exact_docs", "dedup_incremental_batch", "dedup_simhash",
    "docs_chunk_overlap", "docs_fold_contamination",
    "docs_leakage_safe_split", "docs_pack_sequences",
    "docs_subset_containment", "embeddings_quantize_int8",
    "join_full_outer", "join_inner_equi",
    "join_skew_events_customers", "join_theta", "json_extract",
    "knn_per_label_centroid", "merge_upsert_batch",
    "orders_yoy_growth", "rollup_incremental_merge",
    "sample_hash_mod", "sample_importance_reweight",
    "sample_kfold_stratified", "sample_stratified",
    "sample_temperature", "scalar_bitwise", "scalar_math",
    "scalar_try_cast", "sim_ann_lsh", "sim_centroid_assign",
    "sim_knn_cosine",
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

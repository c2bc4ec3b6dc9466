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
# each round's driver run is capped at 50 entries (CORRECTNESS_r01/r02
# each contain exactly 50).  Key-level prioritization for round 3
# (VERDICT.md r2 "Next round" items 1-2):
#   1. The 34 keys NEVER inside a driver window (all of K except the
#      3 checked in r2, plus all of L) — the LLM-ops half of the
#      engine has zero hard correctness signal until these run.
#   2. The 5 r2-red keys whose HUGEINT oracle columns were fixed this
#      round — they must re-verify green.
#   3. 11 re-verification slots: keys whose modules/oracles changed
#      this round or that were last checked in r1 and exercise the
#      session-conf code path changed this round (ADVICE.md item 4:
#      anything modified in the current round verifies FIRST, not
#      last).  Everything else follows in module-registration order.
_DRIVER_WINDOW_PRIORITY = [
    # -- group 1: never driver-checked (30 K + 4 L) --
    "dedup_exact_docs", "dedup_near_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "dedup_edit_distance", "clean_impute_nulls", "clean_outlier_zscore",
    "profile_embeddings", "clean_outlier_iqr", "corpus_mix_report",
    "graph_connected_components", "graph_cluster_keep_best",
    "sim_knn_cosine", "sim_pairs_threshold", "knn_per_label_centroid",
    "multimodal_join", "sim_ann_lsh", "sim_centroid_assign",
    "text_lang_stats", "text_tfidf_topterms", "text_langid",
    "text_quality_score", "text_token_count", "text_fingerprint",
    "text_clean_stopwords", "text_char_entropy", "text_decontaminate",
    "text_repetition_ratio",
    "multimodal_binary_stats", "multimodal_features",
    "multimodal_frame_sample", "multimodal_bin_packing",
    # -- group 2: r2-red, oracle fixed this round --
    "profile_documents", "sessionize_gap_batch", "array_hof",
    "scalar_bitwise", "scalar_try_cast",
    # -- group 3: the first eleven operators ADDED this round (never
    #    driver-checked, and per ADVICE.md changed code verifies
    #    first).  The flagship needs no slot: the driver's entry()
    #    smoke runs it every round and it is r1 hash-green.
    #    The round's LATER additions (market-basket, time-decay,
    #    inference, block-dedup, Q4/Q21/Q22, leakage split,
    #    corpus-maintenance batch, stream_join_pairs,
    #    text_vocab_coverage) do not fit the 50-cap with groups 1-2
    #    ahead of them; they queue in registration order and lead
    #    round 4's rotation. --
    "text_perplexity_unigram", "text_ngram_novelty",
    "dedup_dup_rate_by_source", "clean_winsorize",
    "sim_topk_per_centroid", "embeddings_quantize_int8",
    "docs_subset_containment", "text_zipf_fit", "sample_temperature",
    "docs_chunk_overlap", "stream_static_enrich",
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

"""Category K — corpus curation composites.

The operators a training-data pipeline actually chains: canonical
representative selection under duplication, the full
dedup→quality→survivor flow as one declared plan, and table-level
data-quality profiling. All selection keys are made UNIQUE
arithmetically because ``max_by``/``arg_max`` tie-breaking is
nondeterministic and differs between engines (measured: Spark keeps
the last tied row, DuckDB the first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "dedup_keep_best",
    oracle="""
    SELECT
        md5(text) AS content_hash,
        count(*) AS n_copies,
        arg_max(doc_id, n_chars * 10000000 - doc_id) AS keeper_doc_id,
        max(n_chars) AS keeper_chars
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection per duplicate group.

    Policy: keep the longest document, ties to the smallest doc_id —
    encoded as the unique score ``n_chars·1e7 − doc_id`` so
    ``max_by``/``arg_max`` never see a tie (their tie order is
    engine-specific). One shuffle keyed on the content hash;
    selection state per group is O(1).
    """
    d = load_table(spark, sf_dir, "documents")
    score = F.col("n_chars") * 10_000_000 - F.col("doc_id")
    return d.groupBy(F.md5(F.col("text")).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max_by("doc_id", score).alias("keeper_doc_id"),
        F.max("n_chars").alias("keeper_chars"),
    )


@query(
    "docs_curation_pipeline",
    oracle="""
    WITH keep AS (
        SELECT arg_max(doc_id, n_chars * 10000000 - doc_id) AS doc_id
        FROM documents GROUP BY md5(text)
    ),
    surv AS (
        SELECT d.*
        FROM documents d JOIN keep USING (doc_id)
        WHERE len(string_split(text, ' ')) >= 10
          AND length(regexp_replace(text, '[^0-9]', '', 'g'))
              < 0.3 * length(text)
    )
    SELECT
        lang,
        count(*) AS n_docs,
        round(avg(n_chars), 4) AS avg_chars,
        round(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE), 6)
            AS survival_rate
    FROM surv GROUP BY lang
    """,
)
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation flow as ONE declared plan:

    exact dedup (keep-best representative) → quality gate (≥10
    tokens, digit ratio < 30%) → per-language survivor stats with a
    global survival rate. Composes three engine layers — hash
    dedup, narrow-map quality signals, keyed aggregation — in a
    single lazy plan Catalyst optimizes end to end (the dedup and
    the gate run in the same shuffle round-trip; nothing
    materializes between stages).
    """
    d = load_table(spark, sf_dir, "documents")
    score = F.col("n_chars") * 10_000_000 - F.col("doc_id")
    keep = d.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.max_by("doc_id", score).alias("doc_id")
    ).select("doc_id")
    quality = (F.size(F.split(F.col("text"), " ")) >= 10) & (
        F.length(F.regexp_replace("text", "[^0-9]", ""))
        < 0.3 * F.length("text")
    )
    surv = d.join(keep, "doc_id").where(quality)
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        surv.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "avg_chars",
            F.round(F.col("n_docs") / F.col("n_total").cast("double"), 6).alias(
                "survival_rate"
            ),
        )
    )


@query(
    "profile_documents",
    oracle="""
    SELECT
        count(*) AS n_rows,
        count(DISTINCT doc_id) AS distinct_ids,
        count(DISTINCT lang) AS distinct_langs,
        count(DISTINCT source) AS distinct_sources,
        min(n_chars) AS min_chars,
        max(n_chars) AS max_chars,
        round(avg(n_chars), 4) AS avg_chars,
        sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS empty_texts,
        sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
            AS n_chars_mismatch
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile: the one-pass health check a pipeline
    runs before training on a table — cardinalities, ranges, empty
    payloads, and an internal consistency check (n_chars must equal
    length(text); measured true on the fixtures). Single global
    aggregation, all algebraic."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("doc_id")).alias("distinct_ids"),
        F.count_distinct(F.col("lang")).alias("distinct_langs"),
        F.count_distinct(F.col("source")).alias("distinct_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
        ).alias("empty_texts"),
        F.sum(
            F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0)
        ).alias("n_chars_mismatch"),
    )

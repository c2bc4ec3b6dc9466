"""Category K — text analysis operators (SURVEY §2.K).

All token work is explode + two-phase aggregation — JVM-side, no
Python. tf-idf is two aggregations + a window rank; MLlib
HashingTF/IDF equivalence is covered in unit tests (hash-bucket
outputs aren't oracle-friendly, SURVEY §2.K).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "text_lang_stats",
    oracle="""
    WITH stats AS (
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        FROM documents
        GROUP BY lang
    ),
    tf AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    ranked AS (
        SELECT
            lang,
            term AS top_term,
            count(*) AS top_term_count,
            row_number() OVER (
                PARTITION BY lang ORDER BY count(*) DESC, term
            ) AS rn
        FROM tf
        GROUP BY lang, term
    )
    SELECT s.lang AS lang, n_docs, avg_chars, top_term, top_term_count
    FROM stats s JOIN ranked r ON s.lang = r.lang AND r.rn = 1
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc count, avg n_chars, and most frequent term."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    tf = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("top_term_count"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("top_term_count"), F.asc("term")
    )
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("lang", F.col("term").alias("top_term"), "top_term_count")
    )
    return stats.join(top, "lang")


@query(
    "text_tfidf_topterms",
    oracle="""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf_agg AS (
        SELECT lang, term, count(*) AS tf FROM tf GROUP BY lang, term
    ),
    df AS (
        SELECT term, count(*) AS df FROM (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ) GROUP BY term
    ),
    scored AS (
        SELECT
            lang,
            term,
            tf,
            df,
            tf * ln(CAST(n_docs AS DOUBLE) / df) AS score
        FROM tf_agg JOIN df USING (term) CROSS JOIN n
    )
    SELECT lang, term, tf, df, round(score, 6) AS tfidf, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY score DESC, term
        ) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf: top-3 terms per language by tf·ln(N/df).

    tf is per-language term frequency, df is global document
    frequency, N the corpus size (broadcast as a 1-row frame — no
    collect). Ranking uses the unrounded score with a term
    tie-break; the declared output rounds for hash stability.
    """
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select(
            "lang",
            "term",
            "tf",
            "df",
            F.round(F.col("score"), 6).alias("tfidf"),
            "rank",
        )
    )

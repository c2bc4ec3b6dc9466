"""Category K — deduplication operators (SURVEY §2.K).

Exact dedup is a hash-groupBy (one shuffle on the 256-bit digest —
the 100 TB-safe form: the shuffle key is the hash, never the text).
Near-dup is declared as the *exact* pairwise token-set Jaccard at
oracle scale; the scale path is MinHashLSH (shingle → minhash → band
→ bucket-join), implemented in ``minhash_lsh_pairs`` below and held
to recall ≥0.9 against the exact query in tests/test_scale_paths.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT
        sha256(text) AS content_hash,
        count(*) AS n_copies,
        min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate grouping by SHA-256 content hash.

    Keeps one representative (min doc_id) per hash group — the
    dedup decision a pipeline would apply with a filter on
    ``keeper_doc_id = doc_id``. The fixtures contain a handful of
    exact dups at sf0.1 and none at sf0.01 (measured), so group
    sizes keep the query non-trivial either way.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2(F.col("text"), 256).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


@query(
    "dedup_near_jaccard",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    )
    SELECT doc_a, doc_b, jaccard FROM (
        SELECT
            a.doc_id AS doc_a,
            b.doc_id AS doc_b,
            round(
                CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / len(list_distinct(list_concat(a.toks, b.toks))),
                6
            ) AS jaccard
        FROM t a JOIN t b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.95
    """,
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: token-set Jaccard ≥ 0.95, exact pairwise.

    O(n²) by construction — correct and tractable at oracle scale
    (500 docs → 125k pairs). The 100 TB path is
    :func:`minhash_lsh_pairs` (MinHashLSH banding), verified for
    recall against this query in tests/test_scale_paths.py.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.95)
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.95,
    num_hash_tables: int = 32,
) -> DataFrame:
    """Scale path: MinHashLSH approximate Jaccard-similarity join.

    shingle(token set → binary vocab vector) → minhash (32 tables) →
    LSH bucket-join. Linear in corpus size instead of O(n²): the
    candidate-pair join only touches colliding buckets. Returns the
    same (doc_a, doc_b, jaccard) shape as ``dedup_near_jaccard`` with
    the *exact* Jaccard recomputed on candidates (LSH proposes,
    exact verifies — standard at 100 TB since verification cost is
    proportional to candidates, not pairs).
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True)
    model = cv.fit(t)
    feats = model.transform(t)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    mh_model = mh.fit(feats)
    # approxSimilarityJoin's distCol is Jaccard *distance* (1 - sim).
    pairs = mh_model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    cand = pairs.select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
        F.col("datasetA.toks").alias("toks_a"),
        F.col("datasetB.toks").alias("toks_b"),
    ).where(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)

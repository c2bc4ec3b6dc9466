"""Category K — vector similarity search (SURVEY §2.K).

Embeddings are L2-normalized 64-dim float arrays (measured ‖v‖₂=1),
so cosine ≡ dot product. Dot products run JVM-side via
``zip_with`` + ``aggregate`` in double precision — no Python in the
loop. Brute force is the declared/oracle-checked baseline;
``lsh_ann_topk`` (random-projection LSH buckets) is the scale path,
held to recall@5 against brute force in tests/test_scale_paths.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns, computed in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


@query(
    "sim_knn_cosine",
    oracle="""
    SELECT
        e.vec_id AS vec_id,
        round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT 5
    """,
)
def sim_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN: top-5 cosine neighbors of vec_id=0.

    The 1-row query side is broadcast; the scan side streams — at
    100 TB this is one pass over the corpus + TakeOrdered(5),
    which is exactly how you'd serve a single query without an
    index.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot(F.col("embedding"), F.col("q_emb")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


@query(
    "sim_pairs_threshold",
    oracle="""
    WITH p AS (
        SELECT
            a.vec_id AS vec_a,
            b.vec_id AS vec_b,
            round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4
    """,
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vector pairs with cosine ≥ 0.4 (embedding near-dup sweep).

    Exact pairwise at oracle scale; the 100 TB path is LSH bucketing
    (``lsh_ann_topk``'s bucketizer) or block-matrix multiply so only
    same-bucket pairs are scored. Threshold 0.4 chosen from the
    measured similarity distribution (max pairwise cosine is 0.51 —
    a 0.95 cut would be vacuously empty).
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.4)
    )


@query(
    "knn_per_label_centroid",
    oracle="""
    WITH ex AS (
        SELECT
            label,
            CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS dim,
            unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    )
    SELECT label, dim, round(avg(v), 6) AS centroid_v
    FROM ex
    GROUP BY label, dim
    """,
)
def knn_per_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector (centroid) as (label, dim, value) rows.

    posexplode → two-phase avg keyed on (label, dim): 64·|labels|
    groups regardless of corpus size — trivially 100 TB-safe.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label", F.posexplode(F.col("embedding")).alias("pos", "v")
        )
        .groupBy(
            "label", (F.col("pos") + 1).cast("long").alias("dim")
        )
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"))
    )


@query(
    "multimodal_join",
    oracle="""
    SELECT
        lang,
        count(*) AS n_docs,
        round(avg(n_chars), 4) AS avg_chars,
        round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_dim1,
        round(avg(CAST(label AS DOUBLE)), 4) AS avg_label
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY lang
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality frame: text + vector + metadata in one pipeline.

    documents ⋈ embeddings on doc_id = vec_id (1:1 aligned ids,
    measured), then per-language stats that consume a text-derived
    column, a vector component, and a label — demonstrating
    multimodal columns flowing through a single relational plan.
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(
                F.avg(F.element_at(F.col("embedding"), 1).cast("double")), 6
            ).alias("avg_dim1"),
            F.round(F.avg(F.col("label").cast("double")), 4).alias("avg_label"),
        )
    )


def lsh_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    query_ids: list[int] | None = None,
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
) -> DataFrame:
    """Scale path: approximate k-NN via BucketedRandomProjectionLSH.

    Random-projection buckets ≈ IVF coarse quantization: candidates
    come only from colliding buckets, then exact cosine re-ranks.
    Compared against brute force for recall@k in
    tests/test_scale_paths.py.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(F.col("embedding"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(e)
    queries = e.where(F.col("vec_id").isin(query_ids or [0]))
    # Euclidean distance on unit vectors is monotone in cosine:
    # d² = 2 - 2·cos, so nearest-by-L2 ≡ nearest-by-cosine.
    pairs = model.approxSimilarityJoin(queries, e, 2.0, distCol="l2_dist")
    cand = pairs.select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("vec_id"),
        F.col("datasetA.embedding").alias("q_emb"),
        F.col("datasetB.embedding").alias("emb"),
    ).where(F.col("query_id") != F.col("vec_id"))
    from pyspark.sql import Window

    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(dot(F.col("q_emb"), F.col("emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )

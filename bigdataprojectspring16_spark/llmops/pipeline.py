"""Training-data pipeline operators, round 3 additions (SURVEY §2.K).

Six operators a 100 TB pretraining-data pipeline runs between raw
corpus and tokenizer, beyond the r1/r2 dedup/similarity/text set:
unigram-LM quality scoring, n-gram novelty (corpus-level freshness),
per-source duplicate-rate reporting, robust winsorization, batch
top-k retrieval per centroid, and int8 embedding-quantization QA.

Design rules carried over (SURVEY §4): every plan is a declarative
DataFrame composition — keyed shuffles only, broadcast for
constant-size side tables (dim scales, centroids, fences), no
driver-side state, no Python in the hot path.  DuckDB oracles follow
the HUGEINT discipline (integer sums CAST to BIGINT; counts are
already BIGINT) established in round 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import money
from ..functions.hashing import knuth_hash, knuth_hash_sql
from ..registry import query
from ..tables import load_table
from .similarity import dot

#: Split bucket of a component id — the shared engine-portable hash
#: (functions/hashing.py: overflow-safe AND high-bits-mixed, r8).
H100 = knuth_hash_sql("c.comp_id", 100)


@query(
    "text_perplexity_unigram",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    vocab AS (
        SELECT term, CAST(count(*) AS DOUBLE) AS cnt FROM toks GROUP BY term
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks),
    per_doc AS (
        SELECT t.doc_id, t.lang, avg(-ln(v.cnt / total)) AS nll
        FROM toks t JOIN vocab v USING (term) CROSS JOIN tot
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(nll), 6) AS avg_nll,
           round(min(nll), 6) AS min_nll,
           round(max(nll), 6) AS max_nll
    FROM per_doc GROUP BY lang
    """,
)
def text_perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM self-scoring: train token probabilities on the
    corpus itself, score each doc by mean negative log-likelihood —
    the classic cheap LM-quality filter (high NLL = rare-token soup,
    low NLL = stopword mush; both tails get reviewed before
    training).

    Two aggregations and one join, all linear: (1) token histogram
    (map-side combinable), (2) a one-row total broadcast, (3) a
    term-keyed join of the token stream against the vocabulary —
    at 100 TB this is the only shuffle that scales with corpus size,
    and its key distribution IS the token distribution, so AQE's
    skew-join splitting handles the stopword head; the vocabulary
    side is unique-per-term and merge-friendly. Per-doc and per-lang
    rollups ride the doc_id/lang keys.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("total"))
    per_doc = (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(F.avg(-F.log(F.col("cnt") / F.col("total"))).alias("nll"))
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.min("nll"), 6).alias("min_nll"),
        F.round(F.max("nll"), 6).alias("max_nll"),
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
               ))) AS gram
        FROM t WHERE len(toks) >= 3
    ),
    first_seen AS (
        SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
    ),
    per_doc AS (
        SELECT g.doc_id, g.lang,
               count(*) AS n_grams,
               count(CASE WHEN f.first_doc = g.doc_id THEN 1 END) AS n_novel
        FROM grams g JOIN first_seen f USING (gram)
        GROUP BY g.doc_id, g.lang
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CAST(n_novel AS DOUBLE) / n_grams), 6) AS avg_novelty,
           count(CASE WHEN n_novel = n_grams THEN 1 END) AS n_fully_novel,
           count(CASE WHEN CAST(n_novel AS DOUBLE) / n_grams < 0.1 THEN 1 END)
               AS n_rehash
    FROM per_doc GROUP BY lang
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order n-gram novelty: for each doc, the fraction of its
    distinct word-3-grams first introduced BY that doc (first
    occurrence = lowest doc_id).  Dup-cluster members after the
    cluster head score near zero — a corpus-freshness census that
    catches template spam and boilerplate that pairwise dedup rates
    by a different axis (no pair join at all).

    Shape: narrow gram expansion (``transform`` over a 1-based
    ``sequence``, mirroring the oracle's ``generate_series``), one
    gram-keyed aggregation for first-seen, one gram-keyed join back,
    then doc/lang rollups — linear in total gram count, the
    first-seen table is map-side combinable min().  Docs with < 3
    tokens are excluded (no gram to judge; also keeps Spark's
    descending-``sequence`` edge case unreachable).
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= 3
    )
    gram_at = lambda i: F.concat_ws(
        " ",
        F.element_at("toks", i),
        F.element_at("toks", i + 1),
        F.element_at("toks", i + 2),
    )
    grams = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 2), gram_at
                )
            )
        ).alias("gram"),
    )
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first_seen, "gram")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(
                F.when(F.col("first_doc") == F.col("doc_id"), 1)
            ).alias("n_novel"),
        )
    )
    novelty = F.col("n_novel").cast("double") / F.col("n_grams")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(novelty), 6).alias("avg_novelty"),
        F.count(
            F.when(F.col("n_novel") == F.col("n_grams"), 1)
        ).alias("n_fully_novel"),
        F.count(F.when(novelty < 0.1, 1)).alias("n_rehash"),
    )


@query(
    "dedup_dup_rate_by_source",
    oracle="""
    WITH fp AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   list_transform(
                       list_sort(list_distinct(string_split(text, ' '))),
                       x -> md5(x)
                   ), ''
               )) AS set_fp
        FROM documents
    ),
    grp AS (SELECT set_fp, count(*) AS n_same FROM fp GROUP BY set_fp)
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT fp.set_fp) AS distinct_sets,
           count(CASE WHEN n_same >= 2 THEN 1 END) AS n_dup_docs,
           round(CAST(count(CASE WHEN n_same >= 2 THEN 1 END) AS DOUBLE)
                 / count(*), 6) AS dup_rate
    FROM fp JOIN grp USING (set_fp)
    GROUP BY source
    """,
)
def dedup_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication census on token-SET fingerprints (the
    fixtures have zero byte-exact dups but ~21% token-set dups at
    sf0.1 — measured 5000 docs / 3935 distinct sets): which ingest
    sources ship how much reshuffled-duplicate content.  The report a
    crawl-source triage reads before anyone runs the expensive
    pairwise near-dup sweeps.

    The fingerprint is md5 over the sorted distinct token list with
    each token hashed first (fixed-width elements make the digest
    injective for arbitrary token content — a raw separator join
    would collide 'a|b' with the pair 'a','b') — identical-set
    contraction's key, computed as a narrow map.  Two keyed
    aggregations (fingerprint census, source rollup) and one
    fingerprint-keyed join; the shuffle key is the 128-bit digest,
    never the text, so payload bytes cross the wire exactly zero
    times at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.array_distinct(F.split("text", " "))),
                    F.md5,
                ),
            )
        ).alias("set_fp"),
    )
    grp = fp.groupBy("set_fp").agg(F.count(F.lit(1)).alias("n_same"))
    dup = F.when(F.col("n_same") >= 2, 1)
    return (
        fp.join(grp, "set_fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("set_fp")).alias("distinct_sets"),
            F.count(dup).alias("n_dup_docs"),
            F.round(
                F.count(dup).cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
    )


@query(
    "clean_winsorize",
    oracle="""
    WITH b AS (
        -- fence selection on the exact cent grid: weight per distinct
        -- cent value (the agg_weighted_percentile bucket shape)
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c,
               count(*) AS w
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, v_c, w,
               sum(w) OVER (PARTITION BY event_type ORDER BY v_c
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY event_type) AS tw
        FROM b
    ),
    fences AS (
        -- nearest-rank-with-ties percentiles as pure integer tests:
        -- lo = smallest value with cumw >= 0.05 n, hi = same at 0.95
        SELECT event_type,
               min(CASE WHEN 20 * cw >= tw THEN v_c END) AS lo_c,
               min(CASE WHEN 20 * cw >= 19 * tw THEN v_c END) AS hi_c
        FROM c GROUP BY event_type
    ),
    clipped AS (
        SELECT e.event_type,
               CAST(round(e.value * 100) AS BIGINT) AS v_c,
               least(greatest(CAST(round(e.value * 100) AS BIGINT),
                              f.lo_c), f.hi_c) AS cval_c,
               CASE WHEN CAST(round(e.value * 100) AS BIGINT) < f.lo_c
                    THEN 1 END AS is_lo,
               CASE WHEN CAST(round(e.value * 100) AS BIGINT) > f.hi_c
                    THEN 1 END AS is_hi
        FROM events e JOIN fences f USING (event_type)
    )
    SELECT event_type,
           count(*) AS n,
           count(is_lo) AS n_clipped_lo,
           count(is_hi) AS n_clipped_hi,
           round(CAST(sum(v_c) AS DOUBLE) / 100.0 / count(*), 6) AS mean_raw,
           round(CAST(sum(cval_c) AS DOUBLE) / 100.0 / count(*), 6)
               AS mean_winsor,
           round(sqrt((CAST(sum(cval_c * cval_c) AS DOUBLE)
                       - CAST(sum(cval_c) AS DOUBLE)
                         * CAST(sum(cval_c) AS DOUBLE) / count(*))
                      / (count(*) - 1)) / 100.0, 6) AS sd_winsor
    FROM clipped GROUP BY event_type
    """,
)
def clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip ``events.value`` to the exact per-type
    [p5, p95] band and report clip counts + moment shift — the
    robust-statistics companion to ``clean_outlier_zscore`` (which
    drops) and ``clean_outlier_iqr`` (which fences by quartiles):
    winsorizing keeps the row but caps its leverage, the usual choice
    for training-signal columns where row loss is worse than bias.

    Fences are NEAREST-RANK-WITH-TIES percentiles selected on the
    exact cent grid by the `agg_weighted_percentile` bucket shape
    (weight per distinct cent value → per-type cumulative window over
    BUCKET rows → smallest value with 20·cumw ≥ k·total): the r7 sf1
    audit caught the interpolated-percentile form flipping clip
    COUNTS — Spark `percentile` and DuckDB `quantile_cont` interpolate
    the same fence a last-ulp apart, and any tie group sitting exactly
    on the fence flips wholesale (50 rows at sf1). Integer selection
    has no such surface, every comparison below is integer-exact, and
    the bucket cumsum is also the scale-correct plan (bounded by value
    cardinality, not rows — no whole-type row window; at 100 TB the
    sketch drop-in remains ``approx_percentile`` where ±ε fences are
    acceptable).  The fences frame is one row per event type —
    broadcast back, so the clip pass is a narrow map over the scan.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    v_c = money.cents(F.col("value"))
    b = ev.groupBy("event_type", v_c.alias("v_c")).agg(
        F.count(F.lit(1)).alias("w")
    )
    win = W.partitionBy("event_type").orderBy("v_c")
    c = b.select(
        "event_type",
        "v_c",
        F.sum("w").over(win.rowsBetween(W.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(W.partitionBy("event_type")).alias("tw"),
    )
    fences = c.groupBy("event_type").agg(
        F.min(F.when(20 * F.col("cw") >= F.col("tw"), F.col("v_c"))).alias(
            "lo_c"
        ),
        F.min(
            F.when(20 * F.col("cw") >= 19 * F.col("tw"), F.col("v_c"))
        ).alias("hi_c"),
    )
    cval_c = F.least(F.greatest(v_c, F.col("lo_c")), F.col("hi_c"))
    clipped = ev.join(F.broadcast(fences), "event_type").select(
        "event_type",
        v_c.alias("v_c"),
        cval_c.alias("cval_c"),
        F.when(v_c < F.col("lo_c"), 1).alias("is_lo"),
        F.when(v_c > F.col("hi_c"), 1).alias("is_hi"),
    )
    n = F.count(F.lit(1))
    s1 = money.sum_exact(F.col("cval_c")).cast("double")
    s2 = money.sum_exact(F.col("cval_c") * F.col("cval_c")).cast("double")
    return clipped.groupBy("event_type").agg(
        n.alias("n"),
        F.count("is_lo").alias("n_clipped_lo"),
        F.count("is_hi").alias("n_clipped_hi"),
        F.round(
            money.sum_exact(F.col("v_c")).cast("double") / 100.0 / n, 6
        ).alias("mean_raw"),
        F.round(s1 / 100.0 / n, 6).alias("mean_winsor"),
        F.round(
            F.sqrt((s2 - s1 * s1 / n) / (n - 1)) / 100.0, 6
        ).alias("sd_winsor"),
    )


@query(
    "sim_topk_per_centroid",
    oracle="""
    WITH dims AS (
        SELECT label, u.i AS pos, avg(CAST(embedding[u.i] AS DOUBLE)) AS v
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        GROUP BY label, u.i
    ),
    cents AS (
        SELECT label AS c_label, list(v ORDER BY pos) AS centroid
        FROM dims GROUP BY label
    ),
    scored AS (
        SELECT c_label, vec_id,
               list_dot_product(CAST(embedding AS DOUBLE[]), centroid)
                   / sqrt(list_dot_product(centroid, centroid)) AS cos,
               row_number() OVER (
                   PARTITION BY c_label
                   ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]),
                                             centroid) DESC, vec_id
               ) AS rk
        FROM embeddings CROSS JOIN cents
    )
    SELECT c_label AS label, rk, vec_id, round(cos, 6) AS cos
    FROM scored WHERE rk <= 3
    """,
)
def sim_topk_per_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MIPS: the top-3 nearest vectors to EVERY label centroid
    in one pass — ``sim_knn_cosine`` retrieves for a single query
    vector; this is the k-queries-at-once shape (labeling QA: which
    concrete examples sit closest to each class prototype).

    The centroid table is k×dim — constant in corpus size — so
    scoring is a broadcast of k rows against a narrow scan: every
    executor ranks its own partition and only k×3 candidate rows
    per partition reach the final per-label top-k (Spark's window
    TopK pushes the limit into the sort).  Vectors are L2-normalized
    (measured ‖v‖=1, SURVEY §2.K), so cosine = dot / ‖centroid‖.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("pos", "raw")
    ).groupBy("label", "pos").agg(
        F.avg(F.col("raw").cast("double")).alias("v")
    )
    cents = (
        dims.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s.v,
            ).alias("centroid")
        )
        .select(F.col("label").alias("c_label"), "centroid")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "c_label",
        "vec_id",
        (
            dot(F.col("embedding"), F.col("centroid"))
            / F.sqrt(dot(F.col("centroid"), F.col("centroid")))
        ).alias("cos"),
        dot(F.col("embedding"), F.col("centroid")).alias("raw_dot"),
    )
    w = Window.partitionBy("c_label").orderBy(
        F.col("raw_dot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            F.col("c_label").alias("label"),
            "rk",
            "vec_id",
            F.round("cos", 6).alias("cos"),
        )
    )


@query(
    "embeddings_quantize_int8",
    oracle="""
    WITH dims AS (
        SELECT vec_id, label, u.i AS pos,
               CAST(embedding[u.i] AS DOUBLE) AS v
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    scale AS (SELECT pos, max(abs(v)) AS amax FROM dims GROUP BY pos),
    dq AS (
        SELECT vec_id, label, v,
               CASE WHEN amax > 0
                    THEN round(127 * v / amax) * amax / 127
                    ELSE 0.0 END AS w
        FROM dims JOIN scale USING (pos)
    ),
    per_vec AS (
        SELECT vec_id, label,
               max(abs(v - w)) AS inf_err,
               sum(v * w)
                   / nullif(sqrt(sum(v * v)) * sqrt(sum(w * w)), 0) AS cos
        FROM dq GROUP BY vec_id, label
    )
    SELECT label,
           count(*) AS n_vecs,
           round(avg(inf_err), 6) AS avg_inf_err,
           round(max(inf_err), 6) AS max_inf_err,
           round(min(cos), 6) AS min_cos,
           round(avg(cos), 6) AS avg_cos
    FROM per_vec GROUP BY label
    """,
)
def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization QA: quantize every embedding with
    per-dimension absmax scales (``q = round(127·v/amax)``), then
    report the reconstruction damage per label — max-abs error and
    cosine(original, dequantized) — the go/no-go table before an ANN
    index is rebuilt on compressed vectors.

    The scale table is one row per dimension — constant size —
    built by one (pos)-keyed aggregation over the exploded vectors
    and broadcast back, so quantize + error measurement is a narrow
    map over the (vec, dim) stream followed by a vec_id-keyed
    rollup: two shuffles, both independent of corpus width.  All
    arithmetic is pinned to DOUBLE on both engines (float32 inputs
    promote identically), and zero-amax dimensions dequantize to 0
    with a nullif-guarded cosine.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "raw")
    ).select("vec_id", "label", "pos", F.col("raw").cast("double").alias("v"))
    scale = dims.groupBy("pos").agg(F.max(F.abs(F.col("v"))).alias("amax"))
    w = F.when(
        F.col("amax") > 0,
        F.round(127 * F.col("v") / F.col("amax")) * F.col("amax") / 127,
    ).otherwise(F.lit(0.0))
    dq = dims.join(F.broadcast(scale), "pos").select(
        "vec_id", "label", "v", w.alias("w")
    )
    per_vec = dq.groupBy("vec_id", "label").agg(
        F.max(F.abs(F.col("v") - F.col("w"))).alias("inf_err"),
        (
            F.sum(F.col("v") * F.col("w"))
            / F.nullif(
                F.sqrt(F.sum(F.col("v") * F.col("v")))
                * F.sqrt(F.sum(F.col("w") * F.col("w"))),
                F.lit(0.0),
            )
        ).alias("cos"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("inf_err"), 6).alias("avg_inf_err"),
        F.round(F.max("inf_err"), 6).alias("max_inf_err"),
        F.round(F.min("cos"), 6).alias("min_cos"),
        F.round(F.avg("cos"), 6).alias("avg_cos"),
    )


@query(
    "docs_subset_containment",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    contained AS (
        SELECT DISTINCT a.doc_id
        FROM t a JOIN t b ON a.doc_id <> b.doc_id
        WHERE len(list_intersect(a.toks, b.toks)) = len(a.toks)
    )
    SELECT source,
           count(*) AS n_docs,
           count(c.doc_id) AS n_contained,
           round(CAST(count(c.doc_id) AS DOUBLE) / count(*), 6)
               AS contained_rate
    FROM t LEFT JOIN contained c USING (doc_id)
    GROUP BY source
    """,
)
def docs_subset_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-containment census: per source, how many docs' token
    sets are FULLY contained in some other doc's set — truncations,
    quotes, and boilerplate wrappers that symmetric Jaccard misses
    (a 10-token excerpt of a 400-token doc scores J ≈ 0.025 but
    containment 1.0).

    Pair generation is the containment variant of the prefix filter:
    for full containment the smaller set's RAREST token (global
    ascending-df order, the PPJoin trick) must appear in the larger
    set, so candidates come from joining each doc's single rarest
    token against the full posting list of strictly larger docs —
    rare tokens make small buckets on any Zipfian vocabulary.  Two
    lossless prunes run INSIDE that join, before any token array is
    shuffled: the size inequality (equal-size distinct sets can never
    be subsets) and a 64-bit hashed-signature test — every token
    hashes to one bit, so a ⊆ b forces ``mask_a & ~mask_b == 0``;
    one long-integer AND kills most non-subset candidates even on
    adversarial tiny-vocabulary corpora where every token is
    frequent (the fixture corpus has a 31-term vocabulary — measured
    — which makes *every* posting bucket dense).  The exact verify
    (inter == |small|) touches survivors only.  Identical-set
    contraction applies (containment is a set function): members of
    any multi-doc group are contained by their twins outright, and
    only representatives enter the posting join.
    """
    from .dedup import contract_identical_sets

    d = load_table(spark, sf_dir, "documents")
    full = d.select(
        "doc_id",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    reps, members = contract_identical_sets(
        full.select("doc_id", "toks")
    )
    sig = F.expr(
        "aggregate(transform(toks,"
        " t -> shiftleft(1L, cast(pmod(xxhash64(t), 64) as int))),"
        " 0L, (acc, x) -> acc | x)"
    )
    rsig = reps.withColumn("mask", sig)
    tok = rsig.select(
        "doc_id",
        F.size("toks").alias("sz"),
        "mask",
        F.explode("toks").alias("term"),
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "term")
    rarest = (
        tok.join(freq, "term")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("doc_id").alias("small_id"),
            F.col("sz").alias("sz_s"),
            F.col("mask").alias("mask_s"),
            "term",
        )
    )
    posting = tok.select(
        F.col("doc_id").alias("big_id"),
        F.col("sz").alias("sz_b"),
        F.col("mask").alias("mask_b"),
        "term",
    )
    cand = (
        rarest.join(posting, "term")
        .where(
            (F.col("sz_s") < F.col("sz_b"))
            & (
                F.col("mask_s").bitwiseAND(F.bitwise_not(F.col("mask_b")))
                == 0
            )
        )
        # No distinct needed: `rarest` holds exactly ONE row per
        # small_id, so the term equi-join emits each (small, big)
        # pair at most once — a dedup here would be a full extra
        # shuffle of the candidate stream.
        .select("small_id", "big_id")
    )
    ts = reps.select(F.col("doc_id").alias("small_id"), F.col("toks").alias("toks_s"))
    tb = reps.select(F.col("doc_id").alias("big_id"), F.col("toks").alias("toks_b"))
    contained_reps = (
        cand.join(ts, "small_id")
        .join(tb, "big_id")
        .where(
            F.size(F.array_intersect(F.col("toks_s"), F.col("toks_b")))
            == F.size("toks_s")
        )
        .select(F.col("small_id").alias("rep_id"))
        .distinct()
    )
    group_sizes = members.groupBy("rep_id").agg(F.count(F.lit(1)).alias("n_mem"))
    twin_members = (
        members.join(group_sizes, "rep_id")
        .where(F.col("n_mem") >= 2)
        .select("doc_id")
    )
    subset_members = members.join(contained_reps, "rep_id").select("doc_id")
    contained = twin_members.unionByName(subset_members).distinct()
    return (
        full.select("doc_id", "source")
        .join(contained.withColumn("hit", F.lit(1)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("hit").alias("n_contained"),
            F.round(
                F.count("hit").cast("double") / F.count(F.lit(1)), 6
            ).alias("contained_rate"),
        )
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH freq AS (
        SELECT lang, term, count(*) AS cnt
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY lang, term
    ),
    ranked AS (
        SELECT lang, term, cnt,
               row_number() OVER (
                   PARTITION BY lang ORDER BY cnt DESC, term
               ) AS rk
        FROM freq
    )
    SELECT lang,
           count(*) AS vocab_size,
           min_by(term, rk) AS top_term,
           round(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rk AS DOUBLE))), 6)
               AS zipf_slope,
           round(regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rk AS DOUBLE))), 6)
               AS zipf_r2
    FROM ranked GROUP BY lang
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: regress log-frequency on log-rank
    over the token histogram — natural-language corpora fit a slope
    near −1 with high R²; synthetic spam, boilerplate floods, and
    tokenizer glitches bend the curve, making this a one-table
    corpus-health gate.

    One (lang, term) histogram aggregation (map-side combinable), a
    per-lang rank window over the VOCABULARY (bounded by distinct
    terms, not corpus size), then the regression AGGREGATES
    (regr_slope/regr_r2 — algebraic moment sums, identical in both
    engines).  Nothing here scales with corpus volume except the
    first histogram pass.  Scale note: the rank window sorts one
    language's vocabulary per task — fine up to hundreds of millions
    of terms; past that, swap in the two-phase distributed rank
    (``plans/ranks.py``, the `limit_topk`/global-rank machinery)
    with ``lang`` prepended to the range partitioning — the
    regression aggregates are unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "term")
    ranked = freq.withColumn("rk", F.row_number().over(w))
    ln_cnt = F.log(F.col("cnt").cast("double"))
    ln_rk = F.log(F.col("rk").cast("double"))
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.min_by("term", "rk").alias("top_term"),
        F.round(F.regr_slope(ln_cnt, ln_rk), 6).alias("zipf_slope"),
        F.round(F.regr_r2(ln_cnt, ln_rk), 6).alias("zipf_r2"),
    )


@query(
    "sample_temperature",
    oracle="""
    WITH per AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
               sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) AS total_pow
        FROM per
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens / total, 6) AS raw_share,
           round(pow(CAST(n_tokens AS DOUBLE), 0.7) / total_pow, 6)
               AS temp_share,
           round((pow(CAST(n_tokens AS DOUBLE), 0.7) / total_pow)
                 / (n_tokens / total), 6) AS boost
    FROM per CROSS JOIN tot
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights (T = 1/0.7): the standard
    multilingual/multi-source rebalancing formula ``w_i ∝ n_i^α`` —
    low-resource sources get boosted (boost > 1), head sources
    damped, and the table shows exactly by how much before anyone
    commits a sampler config.

    Same topology as ``corpus_mix_report``: one (source)-keyed token
    census, a one-row totals frame broadcast back, narrow arithmetic.
    The report costs one scan at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    powed = F.pow(F.col("n_tokens").cast("double"), 0.7)
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.sum(powed).alias("total_pow"),
    )
    raw_share = F.col("n_tokens") / F.col("total")
    temp_share = powed / F.col("total_pow")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / raw_share, 6).alias("boost"),
    )


@query(
    "docs_chunk_overlap",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, lang, n_tok,
               unnest(generate_series(1, greatest(n_tok - 16, 1), 48)) AS start
        FROM t
    ),
    per_doc AS (
        SELECT doc_id, lang,
               count(*) AS n_chunks,
               avg(least(64, n_tok - start + 1) / 64.0) AS fill
        FROM chunks GROUP BY doc_id, lang
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
           round(avg(CAST(n_chunks AS DOUBLE)), 6) AS avg_chunks,
           round(avg(fill), 6) AS avg_fill
    FROM per_doc GROUP BY lang
    """,
)
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking plan: 64-token windows, stride 48
    (16-token overlap) — the pretokenization chunker's schedule,
    reported as per-lang chunk counts and window fill factors so the
    padding waste of a context-length choice is visible BEFORE the
    expensive tokenize-and-pack job runs.

    The chunk expansion is ``sequence`` + ``explode`` — a narrow 1:N
    fan-out with no shuffle (the `multimodal_frame_sample` pattern
    applied to text); start positions are arithmetic on token counts,
    so no text is re-scanned per chunk.  Two keyed rollups (doc,
    lang) complete the report.  Start grid: 1, 49, 97, … up to
    ``greatest(n−16, 1)``, which guarantees the final window reaches
    the last token and every window before it is full-width.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    chunks = t.select(
        "doc_id",
        "lang",
        "n_tok",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.col("n_tok") - 16, F.lit(1)),
                F.lit(48),
            )
        ).alias("start"),
    )
    fill = F.least(F.lit(64), F.col("n_tok") - F.col("start") + 1) / 64.0
    per_doc = chunks.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.avg(fill).alias("fill"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("total_chunks"),
        F.round(F.avg(F.col("n_chunks").cast("double")), 6).alias("avg_chunks"),
        F.round(F.avg("fill"), 6).alias("avg_fill"),
    )


@query(
    "docs_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM t a JOIN t b ON a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
    ),
    reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT e.dst AS node, r.lbl
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.lbl < e.dst
    ),
    comp AS (
        SELECT node AS doc_id, min(lbl) AS comp_id FROM reach GROUP BY node
    ),
    assigned AS (
        SELECT d.lang, c.comp_id,
               CASE WHEN {H100} < 80 THEN 'train'
                    WHEN {H100} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT lang, split,
           count(*) AS n_docs,
           count(DISTINCT comp_id) AS n_clusters
    FROM assigned GROUP BY lang, split
    """,
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (80/10/10): the split is
    assigned per near-dup CLUSTER, not per document, so two
    near-duplicates can never land in different splits — the
    eval-contamination failure mode a naive per-doc hash split is
    blind to (a test doc whose twin sits in train is a leaked
    answer).

    Composition of shipped machinery: the linear prefix-filter edge
    join + O(log n) star-contraction components (graph module), then
    the shared deterministic key hash of the COMPONENT id
    (functions/hashing.py: overflow-safe pre-reduction AND Fibonacci
    high-bits range reduction, so the 80/10/10 buckets are decoupled
    from the id residue — ADVICE r7/r8) buckets each cluster whole.
    Per-(lang, split) census with cluster counts; the invariant that
    no component straddles splits holds by construction (split is a
    pure function of comp_id).
    """
    from .graph import components_over_docs

    d = load_table(spark, sf_dir, "documents")
    # lang rides the label pipeline (r14 carry, see graph module) so
    # the doc_id-keyed join back onto documents is gone — the labeled
    # frame already holds each doc's own lang.
    comp = components_over_docs(d, 0.95, carry=("lang",))
    bucket = knuth_hash(F.col("component"), 100)
    assigned = comp.select(
        "lang",
        F.col("component").alias("comp_id"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("comp_id")).alias("n_clusters"),
    )


#: Token budget per packed training sequence (concatenate-and-chunk).
PACK_BUDGET = 256
#: Documents per prefix-sum shard; doc_ids are dense, so shards are
#: contiguous id ranges and shard order IS document order.
PACK_SHARD = 1024


@query(
    "docs_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_toks
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_toks,
               coalesce(sum(n_toks) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM toks
    )
    SELECT CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           CAST(sum(n_toks) AS BIGINT) AS started_tokens
    FROM cum
    GROUP BY seq_id
    ORDER BY seq_id
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining: concatenate the corpus in
    doc_id order and chunk the token stream into fixed-budget
    training sequences (GPT-style concatenate-and-chunk); each
    document is attributed to the sequence where it STARTS. Output is
    the per-sequence census (doc count, id range, started tokens) —
    the shape a packing job's manifest takes.

    The packing key is an exclusive global prefix sum of token
    counts. A single global window would serialize the corpus through
    one partition, so the plan is the scale-correct HIERARCHICAL
    prefix sum (fan-out {PACK_SHARD} per level, r8 adds the third
    level): (1) dense doc_ids shard into contiguous ranges
    (``doc_id div {PACK_SHARD}``), per-shard token totals aggregate
    at full parallelism; (2) within-SUPERSHARD shard offsets run
    partitioned by supershard (``shard div {PACK_SHARD}`` ranges —
    {PACK_SHARD} shards each, full parallelism); (3) supershard
    offsets come from a running sum over the DOUBLY-CONTRACTED
    supershard frame (|docs|/{PACK_SHARD}² rows ≈ 1e4 at a 1e10-doc
    corpus — the one sanctioned tiny single-partition window, the
    q11/rfm contracted-aggregate convention, exempted explicitly in
    tests/test_plan_shapes.py::CONTRACTED_WINDOW_KEYS); (4) the
    within-shard exclusive cumsum runs partitioned by shard and adds
    the broadcast composed offset. Prefix sums over exact integers
    compose associatively, so sequence boundaries are engine- and
    partition-order-exact at every level.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
        (F.col("doc_id") - F.col("doc_id") % PACK_SHARD).alias("shard"),
    )
    shard_totals = toks.groupBy("shard").agg(
        F.sum("n_toks").alias("shard_toks")
    ).withColumn(
        "super", F.col("shard") - F.col("shard") % (PACK_SHARD * PACK_SHARD)
    )
    w_in_super = (
        Window.partitionBy("super")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    super_totals = shard_totals.groupBy("super").agg(
        F.sum("shard_toks").alias("super_toks")
    )
    w_top = Window.orderBy("super").rowsBetween(Window.unboundedPreceding, -1)
    super_offsets = super_totals.select(
        "super",
        F.coalesce(F.sum("super_toks").over(w_top), F.lit(0)).alias(
            "super_offset"
        ),
    )
    offsets = (
        shard_totals.join(F.broadcast(super_offsets), "super")
        .select(
            "shard",
            (
                F.col("super_offset")
                + F.coalesce(
                    F.sum("shard_toks").over(w_in_super), F.lit(0)
                )
            ).alias("shard_offset"),
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        toks.join(F.broadcast(offsets), "shard")
        .withColumn(
            "cum_before",
            F.col("shard_offset")
            + F.coalesce(F.sum("n_toks").over(w_in), F.lit(0)),
        )
    )
    seq = F.col("cum_before") - F.col("cum_before") % PACK_BUDGET
    return (
        cum.withColumn("seq_id", (seq / PACK_BUDGET).cast("long"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum("n_toks").alias("started_tokens"),
        )
        .orderBy("seq_id")
    )

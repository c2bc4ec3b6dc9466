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

from ..functions import money
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
        CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
             AS BIGINT) AS empty_texts,
        CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
             AS BIGINT) AS n_chars_mismatch
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


@query(
    "clean_impute_nulls",
    oracle="""
    WITH t AS (
        SELECT l_returnflag, nullif(l_discount, 0.0) AS d FROM lineitem
    )
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(*) - count(d) AS n_imputed,
           round(CAST(sum(CAST(round(d * 100) AS BIGINT)) AS DOUBLE)
                 * count(*) / (100.0 * count(d)), 6) AS sum_filled
    FROM t GROUP BY l_returnflag
    """,
)
def clean_impute_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean null imputation: nulls (manufactured via
    ``nullif(l_discount, 0)`` — fixtures are null-free) are filled
    with their group's non-null mean, reporting how many were imputed.

    The imputed sum is computed by the EXACT integer identity
    (VERDICT r6 item 4, retiring the last documented float-sum risk):
    filling every null with the group's non-null mean scales the
    group sum by n_rows / n_nonnull, i.e. sum_filled = s * n / n_nn,
    so both engines derive it from the same three exact integers —
    the 0.01-grid discount sum in e2 units (order-independent
    integer sum), the row count, and the non-null count — through an
    identical IEEE double expression, instead of a float sum of
    irrational mean values whose low bits depended on partition
    order (~1e-7/group flip probability, SCALING.md §MONEY).

    A materializing imputation (the rows themselves) stays the
    broadcast-join + ``coalesce`` shape; for the audit summary the
    identity also DELETES that join — one aggregation pass, which at
    100 TB is strictly less work than the two-pass form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("d"),
    )
    n = F.count(F.lit(1))
    n_nn = F.count("d")
    s_e2 = money.sum_exact(money.pct(F.col("d")))
    return t.groupBy("l_returnflag").agg(
        n.alias("n_rows"),
        (n - n_nn).alias("n_imputed"),
        F.round(
            s_e2.cast("double") * n / (F.lit(100.0) * n_nn), 6
        ).alias("sum_filled"),
    )


@query(
    "clean_outlier_zscore",
    oracle="""
    WITH stats AS (
        -- exact integer moment sums (money-grid discipline): mu and
        -- sigma derive from cents / cents^2 totals that are exact in
        -- any accumulation order, so the 2.5-sigma fence is the SAME
        -- double on both engines; a float avg/stddev pair can drift
        -- with partition order and flip boundary rows
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) AS s1,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                        * CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) AS s2
        FROM orders GROUP BY o_orderpriority
    ),
    fenced AS (
        SELECT o_orderpriority, n,
               s1 / n AS mu_c,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma_c
        FROM stats
    )
    SELECT o.o_orderpriority,
           count(*) AS n_total,
           count(CASE WHEN abs((CAST(round(o_totalprice * 100) AS BIGINT)
                                - mu_c) / sigma_c) > 2.5
                      THEN 1 END) AS n_outliers,
           CAST(sum(CASE WHEN abs((CAST(round(o_totalprice * 100) AS BIGINT)
                                   - mu_c) / sigma_c) <= 2.5
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    END) AS DOUBLE) / 100.0 AS sum_kept
    FROM orders o JOIN fenced s ON o.o_orderpriority = s.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def clean_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier gating per group: rows beyond 2.5σ of their
    group mean are flagged and excluded from the kept sum — the
    numeric-column analogue of the text quality gate.

    Same two-pass topology as imputation: tiny per-group moment
    aggregate broadcast back over the fact table; the z expression is
    pure double arithmetic in whole-stage codegen. The moments are
    EXACT integer cents / cents-squared sums (money-grid discipline,
    SCALING.md float-equality audit): a float avg/stddev pair drifts
    with partition order, and a 2.5-sigma fence built from drifting
    stats can flip boundary rows between runs/engines. Quantile-based
    (IQR) gating swaps the stats aggregate for `agg_percentiles`'
    exact-percentile aggregate; the join-back stage is identical.
    """
    o = load_table(spark, sf_dir, "orders")
    c = money.cents(F.col("o_totalprice"))
    # exact integer moment sums (money-grid discipline): the fence
    # doubles (mu_c, sigma_c) derive from order-independent cents /
    # cents^2 totals, so the 2.5-sigma boundary cannot drift with
    # partition order or engine; the z ratio is scale-invariant, so
    # cents-space z equals dollar-space z exactly
    stats = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money.sum_exact(c).cast("double").alias("s1"),
        money.sum_exact(c * c).cast("double").alias("s2"),
    )
    fenced = stats.select(
        "o_orderpriority",
        (F.col("s1") / F.col("n")).alias("mu_c"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sigma_c"),
    )
    z = F.abs((c - F.col("mu_c")) / F.col("sigma_c"))
    return (
        o.join(F.broadcast(fenced), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(z > 2.5, 1)).alias("n_outliers"),
            (
                F.sum(F.when(z <= 2.5, c).cast("decimal(28,0)")).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_kept"),
        )
    )


@query(
    "profile_embeddings",
    oracle="""
    SELECT count(*) AS n_vecs,
           count(DISTINCT len(embedding)) AS n_dims_distinct,
           max(len(embedding)) AS dim,
           round(min(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6)
               AS min_norm,
           round(max(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6)
               AS max_norm,
           count(DISTINCT label) AS n_labels,
           count(CASE WHEN len(list_filter(embedding, x -> isnan(x))) > 0
                      THEN 1 END) AS n_with_nan
    FROM embeddings
    """,
)
def profile_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column data-quality profile: the pre-ANN sanity gate.

    One global algebraic aggregation (the `profile_documents` twin
    for the vector modality): ragged-dimension detection, L2-norm
    range (catches un-normalized or zero vectors before a cosine
    index is built over them), label cardinality, NaN contamination.
    Single scan, single reduce, no shuffle wider than one row —
    identical cost profile at any corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    has_nan = F.exists("embedding", lambda x: F.isnan(x))
    return e.select(
        F.sqrt(sq).alias("norm"),
        F.size("embedding").alias("sz"),
        "label",
        has_nan.alias("bad"),
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.countDistinct("sz").alias("n_dims_distinct"),
        F.max("sz").alias("dim"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
        F.countDistinct("label").alias("n_labels"),
        F.count(F.when(F.col("bad"), 1)).alias("n_with_nan"),
    )


@query(
    "clean_outlier_iqr",
    oracle="""
    WITH stats AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           count(*) AS n_total,
           count(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                        OR o_totalprice > q3 + 1.5 * (q3 - q1)
                      THEN 1 END) AS n_outliers,
           CAST(sum(CASE WHEN o_totalprice >= q1 - 1.5 * (q3 - q1)
                          AND o_totalprice <= q3 + 1.5 * (q3 - q1)
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     END) AS DOUBLE) / 100.0 AS sum_kept
    FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def clean_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (1.5 x IQR) outlier gating per group — the
    quantile-based variant `clean_outlier_zscore` documents.

    Same two-pass topology: a tiny per-group (q1, q3) aggregate
    broadcast back over the fact table, fences evaluated in
    whole-stage codegen. The declared stats pass uses the exact
    interpolated percentile (oracle-matchable); at 100 TB the
    drop-in is `approx_percentile` — a mergeable sketch with the
    same (group -> 2 doubles) output, leaving the join-back stage
    untouched.
    """
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    out = (F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi)
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(out, 1)).alias("n_outliers"),
            # Money-grid sum (functions/money.py): the float form
            # round(sum(double), 2) flipped the last cent at sf10
            # where kept totals reach ~7.5e11 (the §MONEY
            # magnitude-triggered class — caught by the r10 batch-3
            # decade audit, green at every smaller SF). Exact integer
            # cents sum in any order; /100 is exact below 2^53.
            (
                money.sum_exact(
                    F.when(~out, money.cents(F.col("o_totalprice")))
                )
                .cast("double")
                / 100.0
            ).alias("sum_kept"),
        )
    )


@query(
    "corpus_mix_report",
    oracle="""
    WITH per AS (
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT sum(n_tokens) AS total_tokens FROM per)
    SELECT source, lang, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS token_share,
           round(1000000.0 / n_tokens, 4) AS epochs_at_1m_budget
    FROM per CROSS JOIN tot
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning table: per (source, lang) token census,
    corpus share, and effective epochs under a fixed token budget.

    The table a data-mixture decision is made from (shares feed
    sampling weights; epochs-at-budget flags domains that would
    repeat). One two-phase aggregate keyed on (source, lang) — the
    domain-cardinality frame — plus a one-row total broadcast back.
    No per-doc state survives the first aggregation, so the report
    costs one scan at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("total_tokens"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("total_tokens"), 6
        ).alias("token_share"),
        F.round(F.lit(1000000.0) / F.col("n_tokens"), 4).alias(
            "epochs_at_1m_budget"
        ),
    )

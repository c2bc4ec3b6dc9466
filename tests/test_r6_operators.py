"""Behavioral invariants for the r6 operators — properties the
oracle hash can't state directly (conservation laws, argmin
optimality, exact-balance guarantees).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprojectspring16_spark import QUERIES
from bigdataprojectspring16_spark.llmops.pipeline import PACK_BUDGET
from bigdataprojectspring16_spark.tables import load_table

from .conftest import SF_SMALL as SF_DIR


def test_pack_sequences_conserves_tokens_and_is_contiguous(spark):
    out = QUERIES["docs_pack_sequences"](spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    total_tokens = d.select(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("t")
    ).collect()[0]["t"]
    n_docs = d.count()
    # every doc starts in exactly one sequence; all tokens attributed
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["started_tokens"] for r in out) == total_tokens
    # seq ids are the contiguous chunk ids of the token stream
    ids = sorted(r["seq_id"] for r in out)
    assert ids[0] == 0 and ids == list(range(len(ids)))
    # no sequence can start more tokens than budget + one straddling
    # doc's tail; the doc-id ranges of consecutive sequences abut
    by_id = sorted(out, key=lambda r: r["seq_id"])
    for a, b in zip(by_id, by_id[1:]):
        assert b["first_doc"] == a["last_doc"] + 1
    # a full budget's worth of starts can never exceed the budget
    # plus the largest single document
    max_doc = d.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).collect()[0]["m"]
    for r in by_id[:-1]:
        assert r["started_tokens"] <= PACK_BUDGET + max_doc


def test_class_balanced_keeps_exactly_the_minority_count(spark):
    out = {
        r["lang"]: r
        for r in QUERIES["sample_class_balanced"](spark, SF_DIR).collect()
    }
    d = load_table(spark, SF_DIR, "documents")
    counts = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    m = min(counts.values())
    assert set(out) == set(counts)
    for lang, row in out.items():
        assert row["n_kept"] == m, lang
        assert row["n_total"] == counts[lang]


def test_asof_nearest_is_argmin_over_all_same_user_clicks(spark):
    """Brute-force differential: for every purchase, the picked click
    minimizes |delta| over ALL same-user clicks (ties -> earlier)."""
    ev = load_table(spark, SF_DIR, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    delta = F.abs(F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts")))
    brute = (
        p.join(c, "user_id", "left")
        .groupBy("event_id")
        .agg(
            F.min_by(
                "cts",
                F.struct(
                    delta.alias("d"), F.unix_micros("cts").alias("t")
                ),
            ).alias("expect")
        )
    )
    got = QUERIES["join_asof_nearest"](spark, SF_DIR).select(
        "event_id", F.col("nearest_click_ts").alias("got")
    )
    diff = got.join(brute, "event_id").where(
        ~(
            (F.col("got") == F.col("expect"))
            | (F.col("got").isNull() & F.col("expect").isNull())
        )
    )
    assert diff.count() == 0


def test_bm25_scores_docs_with_more_query_terms_higher(spark):
    """Sanity ordering: the top hit contains at least as many query-
    term occurrences as the 10th, and all top-10 scores are positive
    and descending under the declared total order."""
    rows = QUERIES["text_bm25_topk"](spark, SF_DIR).collect()
    assert len(rows) == 10
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)

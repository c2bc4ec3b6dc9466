"""Round-10 operator tests: boilerplate n-gram census semantics on a
hand-built corpus where every expected number is derivable on paper."""

from __future__ import annotations

from bigdataprojectspring16_spark.llmops import text as text_mod


def _docs(spark):
    # A 5-token span "a b c d e" shared verbatim by three docs (df=3
    # -> boilerplate under the C4-style rule); doc 4 is unique; doc 5
    # is too short to carry any 5-gram.
    rows = [
        (1, "a b c d e", "s1"),
        (2, "a b c d e x y z w v", "s1"),
        (3, "q q a b c d e", "s2"),
        (4, "u1 u2 u3 u4 u5 u6", "s2"),
        (5, "tiny doc here", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_boilerplate_census_hand_checked(spark, monkeypatch):
    docs = _docs(spark)
    monkeypatch.setattr(
        text_mod, "load_table", lambda _s, _d, _n: docs
    )
    out = {
        r.source: r
        for r in text_mod.text_boilerplate_ngrams(spark, "ignored").collect()
    }

    # doc 1: 1 shingle, boilerplate -> share 1.0, templated.
    # doc 2: 6 shingles, only "a b c d e" is df>=3 -> share 1/6.
    # doc 3: 3 shingles ("q q a b c", "q a b c d", "a b c d e"), the
    #        first two have df=1 -> share 1/3.
    # doc 4: 2 shingles, both unique -> share 0.
    # doc 5: excluded (len < 5) everywhere.
    s1 = out["s1"]
    assert s1.n_docs == 2
    assert abs(s1.avg_boiler_share - (1.0 + 1 / 6) / 2) < 1e-6  # operator rounds to 6 dp
    assert s1.n_templated == 1  # doc 1 only (doc 2 is 1/6 < 1/2)
    assert s1.n_boiler_shingles == 1

    s2 = out["s2"]
    assert s2.n_docs == 2  # doc 5 never enters the census
    assert abs(s2.avg_boiler_share - (1 / 3 + 0.0) / 2) < 1e-6  # operator rounds to 6 dp
    assert s2.n_templated == 0
    assert s2.n_boiler_shingles == 1  # the shared span, seen from doc 3


def test_boilerplate_no_shingled_docs_is_empty(spark, monkeypatch):
    # Every doc below the shingle length: the census is empty, not an
    # error (the len >= 5 guard runs before sequence()).
    docs = spark.createDataFrame(
        [(1, "too short", "s1"), (2, "a b c d", "s1")],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(text_mod, "load_table", lambda _s, _d, _n: docs)
    assert text_mod.text_boilerplate_ngrams(spark, "ignored").count() == 0


def test_schema_evolution_mergeschema_discovers_same_result(spark):
    """The declared key reads with the explicit evolved (catalog)
    schema; mergeSchema footer-union discovery must see the same
    columns and produce the identical census."""
    from pyspark.sql import functions as F

    from bigdataprojectspring16_spark.functions import money
    from bigdataprojectspring16_spark.operators import scans
    from bigdataprojectspring16_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    path = scans.evolved_orders_path(spark, sf)
    full_cols = {f.name for f in load_table(spark, sf, "orders").schema}
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert {f.name for f in merged.schema} == full_cols

    via_merge = {
        r.priority: (r.n_orders, r.revenue)
        for r in merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("LEGACY")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                money.sum_exact(money.cents(F.col("o_totalprice")))
                .cast("double") / 100.0
            ).alias("revenue"),
        )
        .collect()
    }
    declared = {
        r.priority: (r.n_orders, r.revenue)
        for r in scans.scan_schema_evolution(spark, sf).collect()
    }
    assert via_merge == declared
    assert "LEGACY" in declared and declared["LEGACY"][0] > 0

"""Salting correctness on the fixture's natural skew (SURVEY §1.3:
events.user_id covers only the first 10% of customer keys)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdataprojectspring16_spark.plans.skew import (
    salted_aggregate,
    salted_join_counts,
)
from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        r.user_id: (r.n, r.v, r.mx)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
            F.max("ts").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.user_id: (r.n, r.v, r.mx)
        for r in salted_aggregate(
            ev,
            "user_id",
            [("count", "value", "n"), ("sum", "value", "v"), ("max", "ts", "mx")],
            n_salts=8,
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert plain[k][1] == pytest.approx(salted[k][1], rel=1e-12)
        assert plain[k][2] == salted[k][2]


def test_salted_aggregate_rejects_non_algebraic(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(ev, "user_id", [("avg", "value", "a")])


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_DIR, "events")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    plain = {
        r.c_nationkey: r.n
        for r in ev.join(c, ev.user_id == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cond, sf, sd = salted_join_counts(ev, "user_id", c, "c_custkey", n_salts=8)
    salted = {
        r.c_nationkey: r.n
        for r in sf.join(sd, cond)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert plain == salted

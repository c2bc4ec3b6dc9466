"""Round-8 operator tests: two-level weighted-percentile equivalence
and partition-invariance of the r8 money/hash migrations."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdataprojectspring16_spark.functions import money
from bigdataprojectspring16_spark.operators.aggregates import (
    agg_weighted_percentile,
)
from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_percentile_two_level_equals_single_level(spark):
    """The sharded (two-level) cumulative sum must select EXACTLY the
    values the naive single-level per-group ordered window selects —
    range shards are monotone in the sort key, so prefix sums compose
    exactly (ADVICE r7 / the sample_domain_cap two-level discipline)."""
    li = load_table(spark, SF_DIR, "lineitem")
    b = li.groupBy(
        "l_returnflag",
        money.cents(F.col("l_extendedprice")).alias("price_c"),
    ).agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("w"))
    win = Window.partitionBy("l_returnflag").orderBy("price_c")
    c = b.select(
        "l_returnflag",
        "price_c",
        F.sum("w")
        .over(win.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )

    def pick(k, m):
        return (
            F.min(
                F.when(k * F.col("cw") >= m * F.col("tw"), F.col("price_c"))
            ).cast("double")
            / 100.0
        )

    single = {
        r.l_returnflag: (r.w_p25, r.w_p50, r.w_p75, r.total_weight)
        for r in c.groupBy("l_returnflag")
        .agg(
            pick(4, 1).alias("w_p25"),
            pick(2, 1).alias("w_p50"),
            pick(4, 3).alias("w_p75"),
            F.max("tw").alias("total_weight"),
        )
        .collect()
    }
    two_level = {
        r.l_returnflag: (r.w_p25, r.w_p50, r.w_p75, r.total_weight)
        for r in agg_weighted_percentile(spark, SF_DIR).collect()
    }
    assert two_level == single


def test_weighted_percentile_partition_invariant(spark, monkeypatch):
    """Same output under a hostile repartitioning (the shard offsets
    and integer threshold picks cannot depend on task layout).

    ADVICE r8: the skewed frame must actually FEED the computation
    under test, so the operator's own ``load_table`` is patched to
    hand back a 7-partition l_suppkey-skewed lineitem."""
    from bigdataprojectspring16_spark.operators import aggregates

    base = sorted(
        tuple(r) for r in agg_weighted_percentile(spark, SF_DIR).collect()
    )

    real_load = load_table

    def skewed_load(sp, sf_dir, name):
        df = real_load(sp, sf_dir, name)
        if name == "lineitem":
            # 7 partitions keyed off a column the operator never
            # groups by: shards and value buckets straddle tasks.
            df = df.repartition(7, "l_suppkey")
        return df

    monkeypatch.setattr(aggregates, "load_table", skewed_load)
    again = sorted(
        tuple(r) for r in agg_weighted_percentile(spark, SF_DIR).collect()
    )
    assert base == again

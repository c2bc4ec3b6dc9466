"""Mergeable-sketch semantics (DataSketches HLL via pyspark 4.x).

The 100 TB story for distinct counting is not the estimate itself —
``agg_approx_distinct`` covers that — it is MERGEABILITY: per-shard
sketches unioned into a global one must equal sketching globally, so
distinct counts can be pre-aggregated per partition/day and rolled up
without re-touching raw data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_hll_union_of_group_sketches_matches_global(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select("user_id").distinct().count()
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert abs(merged - exact) / exact < 0.05


def test_hll_estimate_partition_invariant(spark):
    ev = load_table(spark, SF_DIR, "events")

    def est(df):
        return df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
        ).collect()[0]["e"]

    assert est(ev.repartition(3)) == est(ev.repartition(17))

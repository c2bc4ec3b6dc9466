"""Partition-invariance of the quantized iterative operators
(SURVEY §2.K `kmeans_lloyd_rounds` / `graph_pagerank_rounds`).

The round-boundary quantization discipline claims the distributed
rounds produce IDENTICAL results regardless of physical layout —
that is what makes them reproducible on a cluster and comparable to
a serial oracle. This test re-runs both queries under a radically
different shuffle-partition count and asserts bit-identical rows.
"""

from __future__ import annotations

import pytest

from bigdataprojectspring16_spark import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["kmeans_lloyd_rounds", "graph_pagerank_rounds"]
)
def test_quantized_rounds_are_partition_invariant(spark, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    base = sorted(tuple(r) for r in QUERIES[name](spark, SF_DIR).collect())
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = sorted(tuple(r) for r in QUERIES[name](spark, SF_DIR).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert base == alt


def test_salted_topk_is_salt_assignment_invariant(spark):
    """`agg_salted_topk`'s salts come from rand(seed), which IS
    partition-layout-dependent — the claim is that the final result
    is salt-assignment-invariant. Changing the shuffle width (which
    changes which row gets which salt) must not change the answer."""
    from bigdataprojectspring16_spark import QUERIES

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    base = sorted(
        tuple(r) for r in QUERIES["agg_salted_topk"](spark, SF_DIR).collect()
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = sorted(
            tuple(r)
            for r in QUERIES["agg_salted_topk"](spark, SF_DIR).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert base == alt

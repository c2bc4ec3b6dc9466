"""Category F — sort / limit / top-k (SURVEY §2.F).

The driver's value-hash is order-insensitive, so ordering is made
*observable* by freezing it into a rank column (SURVEY §5.3).
orderBy+limit compiles to TakeOrderedAndProject — a per-partition
top-k merged at the driver side of the exchange, never a full sort —
asserted by tests/test_plan_shapes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ranks import with_global_rank
from ..registry import query
from ..tables import load_table


@query(
    "sort_multikey",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        l_returnflag,
        l_extendedprice,
        row_number() OVER (
            ORDER BY l_returnflag ASC, l_extendedprice DESC,
                     l_orderkey, l_linenumber
        ) AS sort_pos
    FROM lineitem
    WHERE l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ASC/DESC sort frozen into data via a global rank.

    Uses the two-phase distributed rank (plans/ranks.py) instead of
    an unpartitioned window: identical output (the key list ends in
    a unique tiebreaker) without moving the table to one partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.where(
        F.col("l_shipdate") > F.lit("2001-06-01").cast("timestamp")
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    return with_global_rank(
        filtered,
        [
            F.asc("l_returnflag"),
            F.desc("l_extendedprice"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        ],
        rank_col="sort_pos",
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice", "sort_pos")


@query(
    "limit_topk",
    oracle="""
    SELECT
        c_custkey,
        c_name,
        round(sum(o_totalprice), 2) AS spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY spend DESC, c_custkey
    LIMIT 20
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 customers by total spend (TakeOrderedAndProject)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .orderBy(F.desc("spend"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "sort_nulls_boundary",
    oracle="""
    SELECT c_custkey,
           round(CASE WHEN c_custkey % 211 = 0 THEN NULL
                      ELSE c_acctbal END, 2) AS bal
    FROM customer
    ORDER BY bal ASC NULLS FIRST, c_custkey
    LIMIT 15
    """,
)
def sort_nulls_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-ordering semantics made observable: a top-15 under
    ``ASC NULLS FIRST`` over a column with a few manufactured NULL
    keys, so the selection itself proves where each engine places
    NULLs (engine DEFAULTS disagree — Spark sorts NULLs first on
    ASC, DuckDB last — so portable code must always spell the
    placement out, which is exactly what this key pins).

    The NULL stratum is smaller than the limit (1 in 211 keys), so
    the selected 15 rows witness BOTH rules: all null-bal rows lead
    (in key order), then the smallest balances fill the remainder —
    a distributed TakeOrdered either way.
    """
    c = load_table(spark, sf_dir, "customer")
    bal = F.round(
        F.when(F.col("c_custkey") % 211 == 0, F.lit(None)).otherwise(
            F.col("c_acctbal")
        ),
        2,
    )
    return (
        c.select("c_custkey", bal.alias("bal"))
        .orderBy(F.col("bal").asc_nulls_first(), "c_custkey")
        .limit(15)
    )

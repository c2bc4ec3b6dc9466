"""Category B — projection / filter / predicates (SURVEY §2.B).

All three keys are pure narrow transformations: no shuffle at any
scale; whole-stage-codegen'd expression evaluation over the columnar
scan. Rounding discipline per SURVEY §5.3: computed doubles are
rounded identically in query and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "project_compute",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
        l_extendedprice * l_discount AS discount_amount
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with arithmetic + aliasing (net price per lineitem).

    Deliberately NOT rounded: per-row IEEE-754 double products are
    bit-identical across engines (same operand order), whereas the
    engines' round() semantics diverge on .xx5 edges — rounding is
    reserved for aggregates where partition order causes real drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("net_price"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("discount_amount"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_totalprice BETWEEN 50000 AND 150000
           AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
       OR (NOT o_orderstatus = 'F' AND o_orderpriority LIKE '5%')
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN + LIKE in one predicate over orders."""
    o = load_table(spark, sf_dir, "orders")
    p1 = F.col("o_totalprice").between(50000, 150000) & F.col(
        "o_orderpriority"
    ).isin("1-URGENT", "2-HIGH")
    p2 = (~(F.col("o_orderstatus") == "F")) & F.col("o_orderpriority").like("5%")
    return o.where(p1 | p2).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@query(
    "filter_null_semantics",
    oracle="""
    SELECT
        l_returnflag,
        count(*) AS n_rows,
        count(nullif(l_discount, 0.0)) AS n_discounted,
        count(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 END)
            AS n_zero_discount,
        CAST(sum(CAST(round(coalesce(nullif(l_discount, 0.0), 0.0) * 100)
                      AS BIGINT)) AS DOUBLE) / 100.0 AS sum_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-valued logic over manufactured nulls (fixtures have none).

    ``nullif(l_discount, 0.0)`` manufactures NULLs; count() skips
    them, the CASE counts them, coalesce restores them — exercising
    IS NULL / IS NOT NULL / null-skipping aggregation semantics.

    sum_discount rides the exact integer 0.01-grid (functions/money.py
    pct): the float form round(sum(double), 6) flipped the sixth
    decimal at sf10 where ~19M grid values sum to ~1e6 (the §MONEY
    magnitude class, caught by the r10 batch-3 decade audit — third
    catch of that audit).
    """
    from ..functions import money

    li = load_table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(d).alias("n_discounted"),
        F.count(F.when(d.isNull(), 1)).alias("n_zero_discount"),
        (
            money.sum_exact(money.pct(F.coalesce(d, F.lit(0.0))))
            .cast("double") / 100.0
        ).alias("sum_discount"),
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_above_avg
    FROM orders o
    WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
      AND EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0.0)
    GROUP BY o_orderpriority
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery + correlated EXISTS, run through
    ``spark.sql`` on the registered views — the IDENTICAL string is
    the DuckDB oracle (portable ANSI), proving the dual SQL surface.

    Catalyst decorrelates both: the scalar subquery becomes an
    aggregate + equi-join on o_custkey, EXISTS becomes a left-semi
    join — all shuffle-partitioned, no per-row re-execution, so the
    shape survives 100 TB (one shuffle per subquery, AQE-sized).
    """
    from ..registry import ORACLES
    from ..sql import register_views

    register_views(spark, sf_dir)
    return spark.sql(ORACLES["subquery_correlated"])


@query(
    "subquery_scalar_agg",
    oracle="""
    WITH cutoff AS (SELECT avg(o_totalprice) AS avg_price FROM orders)
    SELECT o_orderpriority,
           count(*) AS n_above,
           round(avg(o_totalprice), 6) AS avg_above
    FROM orders CROSS JOIN cutoff
    WHERE o_totalprice > avg_price
    GROUP BY o_orderpriority
    """,
)
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar-subquery filter: orders priced above the
    GLOBAL average, rolled up per priority — the complement of
    ``subquery_correlated`` (per-group cutoff) with a single global
    cutoff instead.

    The scalar subquery is a one-row aggregate broadcast back onto
    the scan (the `tpch_q22_idle_customers` convention) — at any
    scale the cutoff costs one partial-agg pass and the filter stays
    a narrow map; no shuffle is keyed on the cutoff.  The threshold
    is a float average, so boundary membership is only at risk for a
    row within double-jitter (~1e-7) of it — prices sit on a 0.01
    grid, the same tolerance Q22's above-average cutoff already
    relies on.
    """
    o = load_table(spark, sf_dir, "orders")
    cutoff = o.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(cutoff))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_above"),
        )
    )

"""TPC-H completion set — the 12 decision-support queries the engine
did not yet cover (Q5-Q12, Q15, Q17, Q19, Q20), adapted to the
fixture star schema (SURVEY §1; spec: TPC-H v3 public specification).

Together with the ten queries already in ``analytics.py``
(Q1≈agg_pricing_summary, Q2, Q3, Q4, Q13≈custdist_two_level_agg,
Q14, Q16, Q18, Q21, Q22) this closes the full 22-query TPC-H sweep.

Fixture-schema adaptations (the driver parquet has no ``partsupp``
table and lineitem carries only ``l_shipdate`` — no commit/receipt
dates, ship mode, or container columns; same convention as
``tpch_q2_min_cost_supplier`` / ``tpch_q4_late_order_priority``):

- Q9  — supply cost is modeled as ``0.6 * p_retailprice`` per unit
  (a fixed documented margin) instead of ``ps_supplycost``.
- Q11 — "available stock" is the observed shipped value per
  (nation, part); the importance cutoff is 2x the nation's average
  per-part value (scale-free, unlike the spec's 0.0001/SF fraction).
- Q12 — ship *modes* become ship *delay classes* derived from
  ``l_shipdate - o_orderdate`` (exact timestamp arithmetic); the
  high/low-priority pivot is unchanged.
- Q17 — the container predicate becomes a brand + size-class filter.
- Q20 — "excess stock" becomes per-part *lead supplier* (argmax of
  shipped quantity, suppkey tie-break): a threshold on supply share
  is not scale-robust when per-part supplier fan-out grows with SF.

Scale notes common to the set: nation/region are fixed-size dims and
always broadcast; customer/supplier/part are sf-proportional and join
by key (shuffle hash / sort-merge under AQE); every sorted LIMIT is a
total order (explicit tie-breaks) so Spark plans it as
TakeOrderedAndProject — per-partition heaps, no global sort.

Money discipline (VERDICT r5 items 1/6 — the ``tpch_q10`` red):
``round(sum(double), 2)`` after a float sum is one partition-order
change away from flipping the last cent whenever the exact total
lands on a half-cent boundary (q10 hit it: 307843.595 summed to
...60 on Spark and ...59 in DuckDB). Every money aggregate here
instead sums on the EXACT integer grid the fixture guarantees
(prices/balances on cents, discounts on a 0.01 grid, quantities
integral — pinned by ``tests/test_money_grid.py``):
per-line values become exact 1e-4-dollar bigints
(``cents(price) * (100 - pct(discount))``), the sum is an
overflow-safe exact decimal(38,0) on Spark / HUGEINT in DuckDB, and
the 2-dp display value is produced by a shared half-away-from-zero
integer division both engines evaluate bit-identically
(``_div_half_up`` / ``_div_half_up_sql``). Equality predicates on
money (q15's max-revenue match) compare integer cents, never
rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# Money-grid helpers live in functions/money.py (single source of
# truth shared with the analytics/curation money queries); aliased
# here to keep the query bodies terse.
from ..functions.money import (  # noqa: E402
    REV_E4_SQL as _REV_E4_SQL,
    cents as _cents,
    div_half_up as _div_half_up,
    div_half_up_sql as _div_half_up_sql,
    money2 as _money2,
    money2_sql as _money2_sql,
    pct as _pct,
    rev_e4 as _rev_e4,
    sum_exact as _sum_exact,
)


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_money2_sql(f"sum({_REV_E4_SQL})")} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    customer and the supplier share the nation, one region, one order
    year.

    The supplier join carries BOTH the l_suppkey equi-key and the
    c_nationkey = s_nationkey locality predicate in one join — Spark
    keeps it a single hash join keyed on suppkey with the nation
    equality as a residual filter, rather than a second shuffle.
    nation x region broadcast (fixed-size dims).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_money2(_sum_exact(_rev_e4())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q6_revenue_delta",
    oracle=f"""
    SELECT {_money2_sql(
        "coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * CAST(round(l_discount * 100) AS BIGINT)), 0)"
    )} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single-table scan-agg —
    the revenue that would vanish if discounts in a band were dropped.

    The entire query is one scan with all three predicates pushed to
    the parquet reader (shipdate range, discount band, quantity cap)
    and a partial-agg map-side combine: the canonical "filter + sum"
    whole-stage-codegen pipeline with zero shuffled rows beyond one
    partial aggregate per partition. The discount domain is a 0.01
    grid, so the BETWEEN band has exact double endpoints on both
    engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money2(
                F.coalesce(
                    _sum_exact(_cents(F.col("l_extendedprice")) * _pct(F.col("l_discount"))),
                    F.lit(0).cast("decimal(38,0)"),
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {_money2_sql("sum(volume_e4)")} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_REV_E4_SQL} AS volume_e4
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year — the two nation dims join under DIFFERENT roles
    (supplier side vs customer side), so the fixed-size nation table
    broadcasts twice under distinct aliases and the disjunctive pair
    predicate lands after both.

    Both nation filters are applied inside the broadcast builds
    (each side pre-filtered to the 2-nation universe), so the big
    fact join never carries rows that cannot satisfy the pair
    disjunction.
    """
    pair = ("NATION_3", "NATION_8")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    n1 = n.select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cust_nkey"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nkey"))
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_money2(_sum_exact(_rev_e4())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_e4
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume_e4) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REV_E4_SQL} AS volume_e4,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's supplier share
    of a region's consumption of one part type, by order year.

    The share is a conditional-sum-over-sum inside ONE aggregation —
    no self-join of numerator vs denominator. Customer-side nation +
    region and supplier-side nation are independent broadcast chains
    (nation appears twice under different roles, as in Q7); part is
    pre-filtered to the type before its key join so the fact scan
    prunes early.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("cust_nkey"),
        F.col("n_regionkey").alias("cust_rkey"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("nation"),
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol_e4 = _rev_e4()
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(F.broadcast(r), F.col("cust_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                _sum_exact(
                    F.when(F.col("nation") == "NATION_3", vol_e4).otherwise(
                        F.lit(0).cast("long")
                    )
                ).cast("double")
                / _sum_exact(vol_e4).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {_money2_sql("sum(amount_e4)")} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REV_E4_SQL}
                   - 60 * CAST(round(p_retailprice * 100) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT) AS amount_e4
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on a name-matched part
    family by supplier nation and order year. Fixture adaptation: no
    partsupp, so unit supply cost is modeled as 0.6 x p_retailprice
    (fixed margin — the module docstring records the convention).

    The LIKE filter lands on the part dim BEFORE its key join (the
    smallest input), so the fact tables only expand matched parts;
    nation broadcasts; the profit expression is a narrow projection
    inside whole-stage codegen.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # 0.6 * retail * qty on the e4 grid: 60 * cents(retail) * qty —
    # all-bigint per line, so partials sum exactly in any order
    amount_e4 = _rev_e4() - F.lit(60).cast("long") * _cents(
        F.col("p_retailprice")
    ) * F.round(F.col("l_quantity"), 0).cast("long")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_money2(_sum_exact(amount_e4)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_money2_sql(f"sum({_REV_E4_SQL})")} AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by lost
    revenue on returned lineitems in one quarter.

    The returnflag filter is pushed into the lineitem scan and the
    quarter filter into orders before either join; the top-20 under
    the total (revenue DESC, c_custkey) order plans as
    TakeOrderedAndProject. Group-by carries the customer attributes
    (custkey functionally determines them) so no re-join is needed
    for the display columns.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money2(_sum_exact(_rev_e4())).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH supply AS (
        SELECT n_name, l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_c
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, l_partkey
    )
    SELECT n_name, l_partkey AS p_partkey,
           CAST(value_c AS DOUBLE) / 100.0 AS supply_value
    FROM (
        SELECT n_name, l_partkey, value_c,
               sum(value_c) OVER (PARTITION BY n_name) AS tot_c,
               count(*) OVER (PARTITION BY n_name) AS n_parts
        FROM supply
    ) t
    WHERE n_parts * value_c > 2 * tot_c
    ORDER BY n_name, supply_value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) adapted to the fixture schema (no
    partsupp): per supplier-nation, the parts whose observed shipped
    value exceeds 2x that nation's average per-part value. The spec's
    0.0001/SF global fraction is replaced by a scale-free relative
    cutoff — at any SF the output is "the heavy tail above 2x mean",
    not a fraction that must be re-tuned per scale.

    One keyed aggregation builds the (nation, part) supply matrix at
    full (n_name, l_partkey) parallelism; the cutoff window then
    re-shuffles the CONTRACTED aggregate (|nations| x |parts| rows,
    not the fact) onto n_name alone. Deliberately two exchanges:
    collapsing to one by pre-partitioning the fact on n_name would
    cap parallelism at 25 nation partitions — the skew-correct plan
    pays the tiny post-agg shuffle instead. The "value > 2 x nation
    average" cutoff is evaluated as the exact integer
    cross-multiplication ``n_parts * value_c > 2 * tot_c`` (count x
    cents vs summed cents) — no float average anywhere, so the
    boundary cannot drift between engines or partition orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supply = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_partkey")
        .agg(_sum_exact(_cents(F.col("l_extendedprice"))).alias("value_c"))
    )
    w = Window.partitionBy("n_name")
    return (
        supply.withColumn("tot_c", F.sum("value_c").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .where(F.col("n_parts") * F.col("value_c") > 2 * F.col("tot_c"))
        .select(
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_c").cast("double") / F.lit(100.0)).alias("supply_value"),
        )
        .orderBy("n_name", F.col("supply_value").desc(), "p_partkey")
    )


@query(
    "tpch_q12_ship_delay_priority",
    oracle="""
    SELECT delay_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT CASE
                 WHEN l_shipdate < o_orderdate + INTERVAL 30 DAY
                     THEN 'FAST'
                 WHEN l_shipdate < o_orderdate + INTERVAL 90 DAY
                     THEN 'MEDIUM'
                 ELSE 'SLOW'
               END AS delay_class,
               o_orderpriority
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) t
    GROUP BY delay_class
    ORDER BY delay_class
    """,
)
def tpch_q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority) adapted: lineitem has no
    ship mode or commit/receipt dates, so the mode axis becomes three
    ship-DELAY classes from exact timestamp arithmetic
    (l_shipdate - o_orderdate at 30/90-day cuts); the high/low
    priority conditional pivot is the spec's.

    Interval arithmetic stays on timestamps end to end (no epoch
    casts — the r4 sub-second-truncation class, SCALING.md audit);
    the pivot is one conditional aggregation, and the 3-row output
    group-by is a near-free shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay = (
        F.when(
            F.col("l_shipdate")
            < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "FAST",
        )
        .when(
            F.col("l_shipdate")
            < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "MEDIUM",
        )
        .otherwise("SLOW")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(delay.alias("delay_class"), "o_orderpriority")
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey,
               {_div_half_up_sql(f"sum({_REV_E4_SQL})", 100)} AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(rev_cents AS DOUBLE) / 100.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarter
    revenue — the spec's view + scalar-subquery equality, kept as an
    aggregate-then-broadcast-back: the one-row max crossJoins onto
    the per-supplier revenue frame (the `subquery_scalar_agg`
    convention), then the supplier dim joins by key.

    The max/equality compares INTEGER half-up cents (``rev_cents``,
    exact decimal / HUGEINT on the two engines) — never rounded
    doubles, which sit one partition-order change from a boundary
    flip (VERDICT r5 item 6); ties (multiple suppliers at the max)
    are all returned, per spec. The display double derives from the
    same exact cents. Catalyst rewrites the crossJoin + cents
    equality into a 1-row BroadcastHashJoin, and the max-filtered
    frame (provably ≤ the tie count) is DECLARED broadcast for the
    supplier join — supplier grows with SF, the winners don't
    (earned-broadcast rule, session.py r10). Guarded in
    test_plan_shapes.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        _div_half_up(_sum_exact(_rev_e4()), 100).alias("rev_cents")
    )
    top = revenue.agg(F.max("rev_cents").alias("max_cents"))
    winners = (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("rev_cents") == F.col("max_cents"))
    )
    return (
        F.broadcast(winners)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents").cast("double") / F.lit(100.0)).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST({_div_half_up_sql(
        "coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)", 7
    )} AS DOUBLE) / 100.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#11' AND p_size < 25
      AND l_quantity < qty_thresh
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue lost
    to orders below 20% of a part's average order quantity, for one
    brand + size class (the fixture has no container column — module
    docstring records the adaptation; /7.0 = the fixture's 7-year
    order span standing in for the spec's per-year normalization).

    The spec's correlated per-part AVG subquery is decorrelated into
    one part-keyed aggregate joined back by key — the standard
    unnesting Spark itself would produce, written explicitly so the
    threshold frame is reusable. The brand/size filter lands on the
    part dim before both fact joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") < 25)
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (
                _div_half_up(
                    F.coalesce(
                        _sum_exact(_cents(F.col("l_extendedprice"))),
                        F.lit(0).cast("decimal(38,0)"),
                    ),
                    7,
                ).cast("double")
                / F.lit(100.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_money2_sql(f"coalesce(sum({_REV_E4_SQL}), 0)")} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three disjunctive
    brand x size x quantity branches over the part join — the classic
    "OR of ANDs" predicate that exercises join-predicate splitting.

    Spark pushes the derivable disjunction residue
    (brand IN (...) and the covering size range) down each side's
    scan while the full three-branch predicate evaluates post-join
    in codegen; the join itself remains a plain partkey equi-join,
    so no branch multiplies the join fan-out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.where(b1 | b2 | b3).agg(
        _money2(
            F.coalesce(_sum_exact(_rev_e4()), F.lit(0).cast("decimal(38,0)"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q20_lead_promo_suppliers",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT l_partkey, l_suppkey,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY supp_qty DESC, l_suppkey
               ) AS rk
        FROM pq
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN ranked ON s_suppkey = l_suppkey
    WHERE rk = 1
    ORDER BY s_suppkey
    """,
)
def tpch_q20_lead_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted: with no partsupp
    availqty, "suppliers holding excess promo stock" becomes the LEAD
    supplier of each PROMO part — argmax of shipped quantity in the
    window year, suppkey tie-break (a share threshold is not
    scale-robust: per-part supplier fan-out grows with SF, so any
    fixed fraction eventually selects nothing).

    Quantities are integral doubles, so the per-(part,supp) sums are
    exact and the argmax order is engine-independent. The rank
    reuses the aggregation's part-keyed partitioning; the supplier
    dim joins by key after the rk=1 prune (semi-join-sized input).
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("supp_qty").desc(), "l_suppkey"
    )
    lead = (
        pq.join(p, F.col("l_partkey") == p.p_partkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return (
        lead.join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )

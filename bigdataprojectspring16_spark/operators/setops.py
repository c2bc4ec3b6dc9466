"""Category G — set operations / exact dedup (SURVEY §2.G).

UNION ALL is shuffle-free concatenation of partition lists; the
DISTINCT variants shuffle once on the full row. ``exceptAll`` /
``intersect`` compile to left-anti / left-semi aggregates in
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money
from ..registry import query
from ..tables import load_table


def _year_slice(orders: DataFrame, year: int) -> DataFrame:
    return orders.where(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, '1995' AS order_year
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    UNION ALL
    SELECT o_orderkey, o_totalprice, '1996' AS order_year
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1995 vs 1996 order slices stacked with a tag column."""
    o = load_table(spark, sf_dir, "orders")
    a = _year_slice(o, 1995).select(
        "o_orderkey", "o_totalprice", F.lit("1995").alias("order_year")
    )
    b = _year_slice(o, 1996).select(
        "o_orderkey", "o_totalprice", F.lit("1996").alias("order_year")
    )
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer nations ∪ supplier nations (distinct union)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that have both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "distinct_exact",
    oracle="""
    SELECT DISTINCT c_mktsegment, o_orderpriority
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT composite: (mktsegment × orderpriority) pairs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .distinct()
    )


@query(
    "dedup_latest_by_key",
    oracle="""
    SELECT user_id, event_type, ts, value FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (CDC/upsert collapse): keep
    each (user, event_type)'s most recent event, tie-broken on the
    unique event_id so the survivor is deterministic —
    ``dropDuplicates`` keeps an arbitrary row and would flap between
    runs/partitionings.

    One window over the shuffle key (user_id, event_type): a single
    hash-partitioned sort, no join. At 100 TB this is the standard
    log-compaction shape; the same plan incrementalizes as
    streaming ``dropDuplicates`` within watermark per key.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


@query(
    "merge_upsert_batch",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, c_acctbal + 100 AS new_bal
        FROM customer WHERE c_custkey % 10 = 0
    ),
    del AS (SELECT c_custkey FROM customer WHERE c_custkey % 17 = 3),
    ins AS (
        SELECT c_custkey + 10000000 AS c_custkey, c_nationkey, 0.0 AS bal
        FROM customer WHERE c_custkey % 13 = 0
    ),
    merged AS (
        SELECT b.c_custkey, b.c_nationkey,
               coalesce(u.new_bal, b.c_acctbal) AS bal
        FROM customer b
        LEFT JOIN upd u ON b.c_custkey = u.c_custkey
        WHERE NOT EXISTS (SELECT 1 FROM del d
                          WHERE d.c_custkey = b.c_custkey)
        UNION ALL
        SELECT c_custkey, c_nationkey, bal FROM ins
    )
    SELECT c_nationkey, count(*) AS n_rows,
           CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_bal
    FROM merged GROUP BY c_nationkey
    """,
)
def merge_upsert_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC upsert) semantics in vanilla Spark: apply an
    update set (matched → new balance), a delete set (matched →
    drop), and an insert set (unmatched → append) to a base table in
    one lazy plan — left join + coalesce for updates, anti join for
    deletes, union for inserts — then summarize per nation.

    The change sets are derived deterministically from the base
    (key % n slices) so the query is self-contained on fixtures. This
    is exactly the join topology Delta/Iceberg MERGE plans under the
    hood: every stage is an equi join or union on c_custkey, shuffle-
    partitioned and skew-tolerant, so the shape is the 100 TB CDC
    path; at scale the wins come from partition pruning on the base
    (file skipping), which parquet + min/max stats give for free.
    """
    base = load_table(spark, sf_dir, "customer")
    upd = base.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100).alias("new_bal")
    )
    dele = base.where(F.col("c_custkey") % 17 == 3).select("c_custkey")
    ins = base.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        "c_nationkey",
        F.lit(0.0).alias("bal"),
    )
    merged = (
        base.join(upd, "c_custkey", "left")
        .join(dele, "c_custkey", "left_anti")
        .select(
            "c_custkey",
            "c_nationkey",
            F.coalesce("new_bal", "c_acctbal").alias("bal"),
        )
        .unionByName(ins)
    )
    # §MONEY r8: per-nation balance totals grow with the base table;
    # the merged bal stays on the cent grid (bal+100 is exact, inserts
    # are 0.0), so the sum runs on exact integer cents.
    return merged.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            money.sum_exact(money.cents(F.col("bal")))
            .cast("double") / 100.0
        ).alias("total_bal"),
    )


@query(
    "rollup_incremental_merge",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / 100.0 / count(*), 6) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a standing per-priority
    rollup STATE (orders before 1997-01-01) merged with a DELTA batch
    (orders from 1997 on) by combining partial aggregates — count and
    sum are algebraic, avg is re-derived from the merged sums — and
    the result is bit-for-bit the full recompute the oracle states.

    This is the materialized-view maintenance shape: at 100 TB the
    state is a tiny keyed table that is never rebuilt, each ingest
    batch contributes one partial-agg pass over only the new data,
    and the merge is a union + re-aggregation on the group key —
    constant work per batch regardless of history size.  (Spark's
    own partial/final HashAggregate split applies the identical
    algebra within one query; this operator applies it ACROSS
    batches.)

    §MONEY r8: the partials carry exact integer cents — integer
    partial-aggregate state is also the production shape, because
    merged float partials inherit batch-order dependence that exact
    integers don't.
    """
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("cnt"),
            money.sum_exact(money.cents(F.col("o_totalprice"))).alias(
                "price_c"
            ),
        )

    state = partial(o.where(F.col("o_orderdate") < cutoff))
    delta = partial(o.where(F.col("o_orderdate") >= cutoff))
    merged = state.unionByName(delta).groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("n_orders"),
        F.sum("price_c").alias("merged_c"),
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        (F.col("merged_c").cast("double") / 100.0).alias("sum_price"),
        F.round(
            F.col("merged_c").cast("double") / 100.0 / F.col("n_orders"), 6
        ).alias("avg_price"),
    )

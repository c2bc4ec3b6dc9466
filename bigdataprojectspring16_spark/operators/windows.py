"""Category E — window functions (SURVEY §2.E).

Window evaluation shuffles once on the partition key and sorts within
partitions; every key here partitions on a high-cardinality column
(custkey / user_id) so state per partition stays bounded at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money
from ..registry import query
from ..tables import load_table, ts_seconds


@query(
    "window_rank_topn",
    oracle="""
    SELECT * FROM (
        SELECT
            o_custkey,
            o_orderkey,
            o_totalprice,
            row_number() OVER w AS rn,
            rank() OVER w AS rnk,
            dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number/rank/dense_rank).

    Grouped top-k via window + filter: Spark pushes the rn<=3 limit
    into the window sort (WindowGroupLimit) so no partition
    materializes more than 3 rows — the scalable form of per-group
    top-k.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_running_total",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ), 2) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order date (rows frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT
        event_id,
        user_id,
        CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT)
            AS gap_prev_sec,
        CAST(date_diff('second', ts, lead(ts) OVER w) AS BIGINT)
            AS gap_next_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps in seconds via lag/lead.

    DuckDB ``date_diff('second', a, b)`` truncates toward zero like
    the unix_timestamp subtraction on the Spark side (both operate on
    whole-second boundaries after the µs values subtract cleanly).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    next_ts = F.lead("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (ts_seconds(F.col("ts")) - ts_seconds(prev_ts)).alias("gap_prev_sec"),
        (ts_seconds(next_ts) - ts_seconds(F.col("ts"))).alias("gap_next_sec"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT
        event_id,
        user_id,
        round(sum(value) OVER (
            PARTITION BY user_id
            ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        ), 6) AS rolling_1h_value
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum of value (range frame on event time).

    The frame is an INTERVAL range on the raw timestamp (SQL window
    spec — the DataFrame ``rangeBetween`` API takes only numeric
    offsets).  An earlier form ordered by epoch seconds with
    ``rangeBetween(-3600, 0)``; that truncates sub-second parts, so an
    event 3600.4 s back could land inside the truncated frame and
    same-second events become frame peers — undetectable at
    sf≤0.01 and a real hash divergence at sf0.1's event density
    (caught by the r4 sf0.1 sweep, tools/receipts/).  Micro-precision
    interval frames match the oracle's RANGE semantics exactly at any
    density.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.expr(
                "sum(value) OVER (PARTITION BY user_id ORDER BY ts "
                "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
            ),
            6,
        ).alias("rolling_1h_value"),
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT
        c_custkey,
        ntile(4) OVER w AS balance_quartile,
        round(percent_rank() OVER w, 6) AS pct_rank,
        round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile + percent_rank + cume_dist of customers by balance.

    Scale-safe form: the two-phase distributed rank (plans/ranks.py)
    replaces the unpartitioned window, then ntile/percent_rank/
    cume_dist are pure arithmetic on (rank, N) — exact because the
    ordering (c_acctbal, c_custkey) is a total order, matching SQL
    semantics tie-for-tie with the oracle's window functions:
    ntile(4) fills the first N mod 4 tiles one row fuller;
    percent_rank = (rank-1)/(N-1); cume_dist = rank/N.
    """
    from ..plans.ranks import with_global_rank

    c = load_table(spark, sf_dir, "customer")
    ranked = with_global_rank(
        c.select("c_custkey", "c_acctbal"),
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        rank_col="rn",
    )
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    rn, N = F.col("rn"), F.col("__n")
    q, r = (N / 4).cast("long"), N % 4
    in_full = rn <= r * (q + 1)
    ntile4 = F.when(in_full, ((rn - 1) / (q + 1)).cast("long") + 1).otherwise(
        r + ((rn - r * (q + 1) - 1) / q).cast("long") + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "c_custkey",
            ntile4.cast("long").alias("balance_quartile"),
            F.round((rn - 1) / (N - 1), 6).alias("pct_rank"),
            F.round(rn / N, 6).alias("cume"),
        )
    )


@query(
    "window_first_last",
    oracle="""
    SELECT
        event_id,
        user_id,
        first_value(event_type) OVER w AS first_type,
        last_value(event_type) OVER w AS latest_type,
        nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit frame.

    The growing frame (unbounded preceding → current row) makes
    last_value the running latest event and nth_value(2) the
    second-ever event per user — all computed in one partitioned
    sort, no self-joins.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("latest_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@query(
    "window_share_of_total",
    oracle="""
    WITH rev AS (
        SELECT n_name, r_name,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
    )
    SELECT n_name, r_name,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           round(CAST(rev_c AS DOUBLE)
                 / CAST(sum(rev_c) OVER (PARTITION BY r_name) AS DOUBLE), 6)
               AS region_share
    FROM rev
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue —
    an unordered full-partition window (sum over the whole partition)
    on top of a grouped aggregate.

    The window input is already nation-level (25 rows at any SF), so
    the full-frame window is cheap by construction; the heavy lifting
    is the preceding two-phase aggregation. Partitioned by r_name —
    never an empty partition spec (the all-to-one guard in
    tests/test_plan_shapes.py applies here too).

    §MONEY r8: the per-nation revenue sum is fact-table-scale, so it
    runs on exact integer cents; the share is one IEEE division of
    two exact integers (identical doubles on both engines) rounded
    for display.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            money.sum_exact(money.cents(F.col("o_totalprice"))).alias(
                "_rev_c"
            )
        )
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "n_name",
        "r_name",
        (F.col("_rev_c").cast("double") / 100.0).alias("revenue"),
        F.round(
            F.col("_rev_c").cast("double")
            / F.sum("_rev_c").over(w).cast("double"),
            6,
        ).alias("region_share"),
    )


@query(
    "window_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n_events,
           round(median(n_events) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS med7
    FROM daily
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row median of daily event volume per type — the
    robust rolling baseline (a single spike day shifts a rolling MEAN
    by spike/7 but leaves the rolling median untouched, which is why
    anomaly baselines prefer it).

    An exact order-statistic over a bounded 7-row frame: the window
    rides one (event_type) hash partitioning over the pre-aggregated
    daily frame — days × types rows, thousands at any corpus scale —
    so the O(frame·log frame) median cost is off the fact table
    entirely.  Spark bans ``median()`` with a window frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame's values
    are collected with ``collect_list`` (frame-legal, bounded at 7)
    and the middle element(s) picked explicitly — even counts average
    the middle pair, matching DuckDB's ``median`` definition on
    exact integer counts.
    """
    ev = load_table(spark, sf_dir, "events")
    # to_date, not date_trunc: DuckDB's date_trunc('day', ts) yields
    # DATE while Spark's yields TIMESTAMP — a §5.3 representation
    # hazard the type-faithful gate catches.
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    mid = F.expr(
        "CASE WHEN size(frame7) % 2 = 1"
        "     THEN CAST(frame7[CAST(size(frame7) / 2 AS INT)] AS DOUBLE)"
        "     ELSE (frame7[CAST(size(frame7) / 2 AS INT) - 1]"
        "           + frame7[CAST(size(frame7) / 2 AS INT)]) / 2.0 END"
    )
    return (
        daily.withColumn(
            "frame7", F.array_sort(F.collect_list("n_events").over(w))
        )
        .select(
            "event_type",
            "day",
            "n_events",
            F.round(mid, 6).alias("med7"),
        )
    )

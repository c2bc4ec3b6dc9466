"""Edge-case hardening for the as-of join rewrite (SURVEY §7.3 ranks
it the hardest relational rewrite): manufactured frames exercise the
cases the fixture may not — a purchase with NO preceding click
(left-join null), a click at exactly the purchase timestamp (>= tie),
and clicks after the purchase (must be ignored) — each compared
against DuckDB's native ASOF LEFT JOIN on the same rows.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _asof_spark(spark, rows):
    """The exact rewrite used by the declared join_asof query."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return {
        (r.event_id, r.user_id): r.last_click_ts
        for r in tagged.where(F.col("tag") == 1).collect()
    }


def _asof_duckdb(rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(
        """SELECT p.event_id, p.user_id, c.ts AS last_click_ts
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             ON p.user_id = c.user_id AND p.ts >= c.ts"""
    ).fetchall()
    return {(e, u): (t.to_pydatetime() if hasattr(t, "to_pydatetime") else t) for e, u, t in got}


CASES = {
    "no_preceding_click": [
        (1, 1, "purchase", T0),  # nothing before it -> NULL
        (2, 1, "click", T0 + dt.timedelta(minutes=5)),  # later click ignored
    ],
    "tie_at_equal_ts": [
        (1, 1, "click", T0),
        (2, 1, "purchase", T0),  # >= semantics: the tied click matches
    ],
    "latest_of_several": [
        (1, 1, "click", T0),
        (2, 1, "click", T0 + dt.timedelta(minutes=1)),
        (3, 1, "purchase", T0 + dt.timedelta(minutes=2)),
        (4, 1, "click", T0 + dt.timedelta(minutes=3)),  # after -> ignored
        (5, 1, "purchase", T0 + dt.timedelta(minutes=4)),
    ],
    "users_do_not_leak": [
        (1, 1, "click", T0),
        (2, 2, "purchase", T0 + dt.timedelta(minutes=1)),  # other user's click
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_asof_rewrite_matches_duckdb_asof(spark, name):
    rows = CASES[name]
    assert _asof_spark(spark, rows) == _asof_duckdb(rows)


def _asof_fwd_spark(spark, rows):
    """The exact rewrite used by the declared join_asof_forward query."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("ts").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tagged = purchases.unionByName(clicks).withColumn(
        "next_click_ts", F.first("click_ts", ignorenulls=True).over(w)
    )
    return {
        (r.event_id, r.user_id): r.next_click_ts
        for r in tagged.where(F.col("tag") == 0).collect()
    }


def _asof_fwd_duckdb(rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(
        """SELECT p.event_id, p.user_id, c.ts AS next_click_ts
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             ON p.user_id = c.user_id AND p.ts <= c.ts"""
    ).fetchall()
    return {
        (e, u): (t.to_pydatetime() if hasattr(t, "to_pydatetime") else t)
        for e, u, t in got
    }


FWD_CASES = {
    "no_following_click": [
        (1, 1, "click", T0),  # earlier click ignored
        (2, 1, "purchase", T0 + dt.timedelta(minutes=5)),  # nothing after -> NULL
    ],
    "tie_at_equal_ts": [
        (1, 1, "purchase", T0),  # <= semantics: the tied click matches
        (2, 1, "click", T0),
    ],
    "earliest_of_several": [
        (1, 1, "click", T0),  # before -> ignored
        (2, 1, "purchase", T0 + dt.timedelta(minutes=1)),
        (3, 1, "click", T0 + dt.timedelta(minutes=2)),
        (4, 1, "click", T0 + dt.timedelta(minutes=3)),
        (5, 1, "purchase", T0 + dt.timedelta(minutes=4)),
    ],
    "users_do_not_leak": [
        (1, 2, "click", T0 + dt.timedelta(minutes=1)),  # other user's click
        (2, 1, "purchase", T0),
    ],
}


@pytest.mark.parametrize("name", sorted(FWD_CASES))
def test_asof_forward_rewrite_matches_duckdb_asof(spark, name):
    rows = FWD_CASES[name]
    assert _asof_fwd_spark(spark, rows) == _asof_fwd_duckdb(rows)

"""Boundary-distance monitor for the last accepted float-residual
class (VERDICT r7 item 6 / SCALING.md §MONEY).

After the r7/r8 migrations, the only remaining float in a money-ish
output path is the display round of an n-divided average (or integer
ratio) whose numerator and denominator are EXACT integers — both
engines therefore compute the IDENTICAL IEEE double, and a flip is
only possible if that double sits within representation noise of a
decimal rounding tie (the engines' tie decisions go through
different machinery: BigDecimal shortest-repr vs binary-value
rounding). This monitor measures, for every representative site,
the distance from the pre-round value to its nearest tie and
asserts a >=1000x-ulp margin — so a future decade (or new fixture)
that drifts a value onto a tie fails loudly here instead of flipping
silently in a driver hash.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdataprojectspring16_spark.functions import money
from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"

#: Required margin, in ulps of the scaled value, between the
#: pre-round double and the nearest decimal rounding tie.
MARGIN_ULPS = 1000


def _assert_off_tie(values, scale: int, site: str) -> None:
    for x in values:
        if x is None:
            continue
        y = x * (10.0 ** scale)
        frac = y - math.floor(y)
        dist = abs(frac - 0.5)
        assert dist > MARGIN_ULPS * math.ulp(max(abs(y), 1.0)), (
            f"{site}: pre-round value {x!r} sits {dist:.3e} from a "
            f"10^-{scale} rounding tie (< {MARGIN_ULPS} ulps) — the "
            "round could flip between engines; migrate this site to "
            "an exact display form (SCALING.md §MONEY)"
        )


def test_q1_averages_off_tie(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    g = (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money.sum_exact(
                F.round(F.col("l_quantity"), 0).cast("long")
            ).alias("qty_t"),
            money.sum_exact(money.cents(F.col("l_extendedprice"))).alias(
                "base_c"
            ),
            money.sum_exact(money.pct(F.col("l_discount"))).alias("pct_t"),
        )
        .collect()
    )
    _assert_off_tie(
        [float(r.qty_t) / r.n for r in g], 6, "agg_pricing_summary.avg_qty"
    )
    _assert_off_tie(
        [float(r.base_c) / 100.0 / r.n for r in g],
        6,
        "agg_pricing_summary.avg_price",
    )
    _assert_off_tie(
        [float(r.pct_t) / 100.0 / r.n for r in g],
        6,
        "agg_pricing_summary.avg_disc",
    )


def test_priority_rollup_average_off_tie(spark):
    o = load_table(spark, SF_DIR, "orders")
    g = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money.sum_exact(money.cents(F.col("o_totalprice"))).alias("c"),
        )
        .collect()
    )
    _assert_off_tie(
        [float(r.c) / 100.0 / r.n for r in g],
        6,
        "rollup_incremental_merge.avg_price",
    )
    _assert_off_tie(
        [float(r.c) / 100.0 / r.n for r in g],
        2,
        "unpivot_metrics.avg_price(2dp)",
    )


def test_integer_ratio_shares_off_tie(spark):
    """window_share_of_total.region_share and orders_yoy_growth:
    ratios of exact integer cents, rounded at 6 dp."""
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "n_regionkey")
        .agg(
            money.sum_exact(money.cents(F.col("o_totalprice"))).alias("c")
        )
        .collect()
    )
    by_region: dict = {}
    for r in rev:
        by_region.setdefault(r.n_regionkey, []).append(float(r.c))
    shares = [
        v / sum(vals) for vals in by_region.values() for v in vals
    ]
    _assert_off_tie(shares, 6, "window_share_of_total.region_share")

    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            money.sum_exact(money.cents(F.col("o_totalprice"))).alias("c")
        )
        .collect()
    )
    series: dict = {}
    for r in yearly:
        series.setdefault(r.n_name, {})[r.yr] = float(r.c)
    growth = [
        ys[y] / ys[y - 1] - 1
        for ys in series.values()
        for y in ys
        if y - 1 in ys
    ]
    _assert_off_tie(growth, 6, "orders_yoy_growth.yoy_growth")

#!/usr/bin/env python
"""Interleaved A/B: float-sum Q1 (the pre-r6 form, exactness bug
class included) vs the shipped exact decimal(38,0) money-grid Q1 —
quantifies the price of exactness on the flagship aggregate.

    python tools/money_ab.py [N_pairs] [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import bigdataprojectspring16_spark as engine
from bigdataprojectspring16_spark import QUERIES
from bigdataprojectspring16_spark.tables import load_table

N = int(sys.argv[1]) if len(sys.argv) > 1 else 7
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

spark = engine.get_session("money-ab")


def float_q1(spark, sf_dir):
    """The r5 float-sum form (for measurement only — this is the
    partition-order-fragile shape the money grid replaced)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def timed(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


exact = QUERIES["agg_pricing_summary"]
# warm both arms (parquet cache)
timed(float_q1)
timed(exact)
a, b = [], []
for i in range(N):
    a.append(timed(float_q1))
    b.append(timed(exact))
    print(f"pair {i}: float={a[-1]:.3f}s exact={b[-1]:.3f}s", flush=True)
a.sort()
b.sort()
med = lambda xs: xs[len(xs) // 2]  # noqa: E731
print(f"A (float sums):          median={med(a):.3f} {[f'{x:.3f}' for x in a]}")
print(f"B (exact decimal sums):  median={med(b):.3f} {[f'{x:.3f}' for x in b]}")
print(f"exactness cost: {(med(b) / med(a) - 1) * 100:+.1f}%")
spark.stop()

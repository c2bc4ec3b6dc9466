"""Scale-safe global ordering: the two-phase distributed rank.

A bare ``Window.orderBy(...)`` (no partitionBy) moves EVERY row to
one partition — the single worst plan shape at 100 TB (Spark itself
warns ``WindowExec: No Partition Defined``). The classic fix, used
by every engine that supports distributed ORDER BY, is implemented
here once and reused by the sort/rank queries:

1. range-repartition on the sort keys (sampled boundaries, the same
   mechanism as a distributed ``ORDER BY``),
2. per-partition ``row_number`` (partitions sort independently),
3. add each partition's global offset = cumulative count of all
   preceding partitions — a partition-count-sized side table
   (32 rows here, ≤ a few thousand on a real cluster), broadcast.

The resulting rank is identical to the single-partition window
whenever the sort key is a total order (callers append a unique
tiebreaker), because range partitions are ordered by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank"]


def with_global_rank(
    df: DataFrame, order_cols: list[Column], rank_col: str = "rank"
) -> DataFrame:
    """Append a dense global ``row_number`` over ``order_cols``.

    ``order_cols`` must form a total order (no ties) — append a
    unique key as the last column; with ties the assignment within
    a tied run would depend on partition boundaries.
    """
    parted = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Partition sizes → exclusive prefix sums via a triangular
    # self-join on the partition-count-sized side table (≤ a few
    # thousand rows on any cluster). A window would need a global
    # ordering — exactly the shape this helper exists to avoid —
    # and Catalyst folds away constant partition keys, so the join
    # is the clean way to keep WindowExec out of the plan entirely.
    counts = parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    prior = counts.select(
        F.col("__pid").alias("__prior_pid"), F.col("__cnt").alias("__prior_cnt")
    )
    offsets = (
        counts.join(prior, F.col("__prior_pid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__prior_cnt"), F.lit(0)).alias("__offset"))
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("__offset")).cast("long"))
        .drop("__pid", "__offset")
    )

"""Category A — scans / sources (SURVEY §2.A).

Both keys are deliberately thin: the point is the *plan*, not the
code. ``scan_parquet`` must show a column-pruned parquet scan
(ReadSchema lists only the projected columns) and
``scan_with_pushdown`` must show the predicate in PushedFilters —
asserted by tests/test_plan_shapes.py. At 100 TB these two properties
(pruning + row-group skipping) are the difference between reading
3 columns of a 100 TB table and reading all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + projection; Catalyst prunes the parquet read schema."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


@query(
    "scan_with_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def scan_with_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter that must reach the parquet reader (PushedFilters)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )

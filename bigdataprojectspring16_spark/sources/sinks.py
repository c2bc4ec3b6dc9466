"""Sinks: parquet / CSV / JSON writers, optionally hive-partitioned.

Round-tripped (write → read back → hash-compare) in
tests/test_sources_sinks.py (SURVEY §5.2.6). ``partition_by`` writes
the hive layout that makes downstream partition pruning work — the
scan-side half of that contract is asserted in the same tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = (
        df.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles the data once at write time: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange on either side — the standard way to amortize the
    biggest fact⋈fact shuffle at 100 TB across every downstream
    query (asserted in tests/test_bucketing.py).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def write_json(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)

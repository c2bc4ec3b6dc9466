"""Source/sink round-trips (SURVEY §5.2.6) + partition-pruning check.

Write each format (with and without partitionBy), read back with an
explicit schema, and hash-compare against the source frame. The
parquet partitioned case also asserts the read side prunes
partitions (PartitionFilters in the scan), which is the point of
writing hive layouts at 100 TB.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from bigdataprojectspring16_spark.sources import readers, sinks
from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="sink-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _frames_equal(a, b) -> bool:
    if sorted(a.columns) != sorted(b.columns):
        return False
    cols = sorted(a.columns)
    return (
        a.select(cols).exceptAll(b.select(cols)).isEmpty()
        and b.select(cols).exceptAll(a.select(cols)).isEmpty()
    )


def test_parquet_roundtrip(spark, tmp):
    src = load_table(spark, SF_DIR, "orders")
    sinks.write_parquet(src, f"{tmp}/o")
    back = readers.read_parquet(spark, f"{tmp}/o")
    assert _frames_equal(src, back)


def test_parquet_partitioned_roundtrip_and_pruning(spark, tmp):
    src = load_table(spark, SF_DIR, "orders")
    sinks.write_parquet(src, f"{tmp}/p", partition_by=["o_orderstatus"])
    back = readers.read_parquet(spark, f"{tmp}/p")
    # partition column round-trips by value (moves to the path and back)
    assert _frames_equal(
        src.withColumn("o_orderstatus", F.col("o_orderstatus").cast("string")), back
    )
    # the filtered scan prunes partitions instead of reading all of them
    plan = (
        back.where(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_csv_roundtrip_with_schema(spark, tmp):
    src = load_table(spark, SF_DIR, "nation")
    sinks.write_csv(src, f"{tmp}/n")
    back = readers.read_csv(spark, f"{tmp}/n", src.schema)
    assert _frames_equal(src, back)


def test_csv_timestamp_roundtrip(spark, tmp):
    src = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    sinks.write_csv(src, f"{tmp}/ts")
    back = readers.read_csv(spark, f"{tmp}/ts", src.schema)
    assert _frames_equal(src, back)


def test_json_roundtrip_with_schema(spark, tmp):
    src = load_table(spark, SF_DIR, "customer")
    sinks.write_json(src, f"{tmp}/c")
    back = readers.read_json(spark, f"{tmp}/c", src.schema)
    assert _frames_equal(src, back)


def test_json_permissive_malformed_rows(spark, tmp):
    with open(f"{tmp}/m.json", "w") as f:
        f.write('{"a": 1, "b": "x"}\n')
        f.write("this is not json\n")
        f.write('{"a": 2, "b": "y"}\n')
    df = readers.read_json(spark, f"{tmp}/m.json", "a bigint, b string")
    rows = df.collect()
    assert len(rows) == 3  # malformed row kept as all-null, job not failed
    assert sorted(r.a for r in rows if r.a is not None) == [1, 2]

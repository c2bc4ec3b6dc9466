"""UDF/UDTF/mapPartitions surface tests (SURVEY §2.I's "tests only"
rows): the Spark 4 Python UDTF class is equivalent to the declared
posexplode form, the row-at-a-time UDF agrees with its pandas twin,
and the mapPartitions escape hatch works for per-partition batch
scoring without changing results under repartitioning.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_python_udtf_equals_posexplode(spark):
    """@udtf class (Spark 4 table function) == posexplode rewrite."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token_pos: bigint, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok

    spark.udtf.register("tokenize", Tokenize)
    d = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 20)
    d.createOrReplaceTempView("docs_slice")
    via_udtf = spark.sql(
        """SELECT doc_id, t.token_pos, t.token
           FROM docs_slice, LATERAL tokenize(text) t"""
    )
    via_explode = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("token_pos"), "token")
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_explode.collect())
    )


def test_row_udf_equals_pandas_udf(spark):
    """The same scalar computed via row-at-a-time UDF and Arrow-batched
    pandas UDF — identical results, different execution cost."""
    from pyspark.sql.functions import pandas_udf, udf

    @udf("double")
    def readability_row(text: str) -> float:
        toks = text.split(" ")
        return round(len(toks) / max(1, len(text)), 6)

    @pandas_udf("double")
    def readability_pandas(text: pd.Series) -> pd.Series:
        return (
            text.str.split(" ").str.len() / text.str.len().clip(lower=1)
        ).round(6)

    d = load_table(spark, SF_DIR, "documents")
    a = d.select("doc_id", readability_row("text").alias("r"))
    b = d.select("doc_id", readability_pandas("text").alias("r"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_map_partitions_escape_hatch(spark):
    """Per-partition imperative scoring via RDD mapPartitions: one
    'model init' per partition (the reason this API exists), results
    invariant to the partitioning."""

    def score_partition(rows):
        # expensive init happens once per partition, not per row
        weight = 0.5
        for row in rows:
            yield (row.o_orderkey, round(row.o_totalprice * weight, 2))

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    r1 = sorted(o.rdd.mapPartitions(score_partition).collect())
    r2 = sorted(o.repartition(7).rdd.mapPartitions(score_partition).collect())
    assert r1 == r2
    assert r1[0][1] == pytest.approx(
        sorted(o.collect())[0].o_totalprice * 0.5, abs=0.01
    )

"""SQL entry-point parity (SURVEY §3, entry 3): for every key whose
oracle SQL is portable ANSI, ``spark.sql(oracle)`` over registered
views must produce exactly the DataFrame form's result — the two
surfaces converge on the same logical plan, and this proves it
query by query instead of asserting it in prose.
"""

from __future__ import annotations

import pytest

from bigdataprojectspring16_spark import ORACLES, QUERIES
from bigdataprojectspring16_spark.sql import (
    PORTABLE_SQL_KEYS,
    register_views,
    to_spark_sql,
)
from tests.conftest import _sorted_rows

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF_DIR)


@pytest.mark.parametrize("name", PORTABLE_SQL_KEYS)
def test_sql_equals_dataframe(spark, name):
    sql_df = spark.sql(to_spark_sql(ORACLES[name]))
    api_df = QUERIES[name](spark, SF_DIR)
    s_cols, a_cols = sql_df.columns, api_df.columns
    assert sorted(s_cols) == sorted(a_cols)
    s = _sorted_rows(s_cols, [tuple(r) for r in sql_df.collect()])
    a = _sorted_rows(a_cols, [tuple(r) for r in api_df.collect()])
    assert s == a, f"{name}: SQL surface diverges from DataFrame surface"

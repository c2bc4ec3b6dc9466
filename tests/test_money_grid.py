"""Pins for the money-grid contract (functions/money.py).

The exact-integer money discipline assumes the fixture generator
emits prices/balances on the cent grid, rates on a 0.01 grid, and
integral quantities. If a future fixture violates that,
``round(x * 100)`` silently changes VALUES instead of just
representation — so the assumption must fail loudly here, not as a
downstream hash mismatch.

Also pins the two-engine agreement of the half-up integer division
on boundary cases (the exact r5 q10 class: totals landing on a
half-cent).
"""
import duckdb
import pytest
from pyspark.sql import functions as F

from bigdataprojectspring16_spark.functions import money

from .conftest import SF_SMALL as SF_DIR

GRID_COLS = {
    "lineitem": {
        "cents": ["l_extendedprice"],
        "pct": ["l_discount", "l_tax"],
        "integral": ["l_quantity"],
    },
    "orders": {"cents": ["o_totalprice"], "pct": [], "integral": []},
    "part": {"cents": ["p_retailprice"], "pct": [], "integral": []},
    "customer": {"cents": ["c_acctbal"], "pct": [], "integral": []},
    "supplier": {"cents": ["s_acctbal"], "pct": [], "integral": []},
}


@pytest.mark.parametrize("table", sorted(GRID_COLS))
def test_fixture_money_columns_sit_on_the_grid(table):
    spec = GRID_COLS[table]
    con = duckdb.connect()
    checks = [
        f"max(abs({c} * 100 - round({c} * 100)))"
        for c in spec["cents"] + spec["pct"]
    ] + [f"max(abs({c} - round({c})))" for c in spec["integral"]]
    if not checks:
        pytest.skip("no grid columns")
    row = con.execute(
        f"SELECT {', '.join(checks)} FROM '{SF_DIR}/{table}.parquet'"
    ).fetchone()
    # representation error of grid values is < 1e-6 * ulp-scale;
    # anything >= 0.5 would mean round() CHANGES the value
    assert all(v is not None and v < 1e-4 for v in row), (table, row)


def test_half_up_div_agrees_with_duckdb_on_boundaries(spark):
    # totals in e4 units that land exactly on half-cents (the q10
    # class), plus negatives (q9 profit can be negative)
    totals = [3078435950, 3078435949, 150, 149, 50, -150, -50, 0, -3078435950]
    sdf = spark.createDataFrame([(t,) for t in totals], "t long")
    got = {
        r["t"]: (int(r["cents"]), r["money"])
        for r in sdf.select(
            "t",
            money.div_half_up(F.col("t"), 100).alias("cents"),
            money.money2(F.col("t")).alias("money"),
        ).collect()
    }
    con = duckdb.connect()
    for t in totals:
        cents, mon = con.execute(
            f"SELECT {money.div_half_up_sql(str(t), 100)},"
            f" {money.money2_sql(str(t))}"
        ).fetchone()
        assert got[t] == (int(cents), mon), (t, got[t], (cents, mon))


def test_half_up_div_column_denominator(spark):
    # round(num/den) with a COLUMN denominator (the RFM avg path):
    # exact halves round away from zero, matching DuckDB's mirror
    cases = [(7, 2), (9, 2), (-7, 2), (10, 4), (1000001, 2000000)]
    sdf = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r["n"], r["d"]): int(r["q"])
        for r in sdf.select(
            "n", "d", money.div_half_up(F.col("n"), F.col("d")).alias("q")
        ).collect()
    }
    con = duckdb.connect()
    for n, d in cases:
        (q,) = con.execute(
            f"SELECT {money.div_half_up_sql(str(n), str(d))}"
        ).fetchone()
        assert got[(n, d)] == int(q), (n, d, got[(n, d)], q)
    assert got[(7, 2)] == 4 and got[(-7, 2)] == -4  # half away from zero
    assert got[(1000001, 2000000)] == 1  # just over half rounds up


# every key migrated to exact money/quantized sums in r6 — the
# direct regression guard for the q10 class: results must be
# BIT-IDENTICAL under a different reducer count (a float-sum path
# changes its low bits with partition order; the exact-integer path
# cannot)
MONEY_EXACT_KEYS = [
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_delta",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "agg_pricing_summary",
    "tpch_q3_topk",
    "tpch_q14_promo_share",
    "join_multiway_star",
    "orders_abc_by_segment",
    "orders_rfm_segments",
    "clean_outlier_zscore",
    "clean_winsorize",
    "scalar_math",
    "events_decayed_user_value",
    "text_bm25_topk",
    "docs_pack_sequences",
]


@pytest.mark.parametrize("key", MONEY_EXACT_KEYS)
def test_money_keys_are_partition_invariant(spark, key):
    from bigdataprojectspring16_spark import QUERIES

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(tuple(r) for r in QUERIES[key](spark, SF_DIR).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = sorted(tuple(r) for r in QUERIES[key](spark, SF_DIR).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b, f"{key}: result depends on reducer count"


def test_half_up_div_randomized_cross_engine(spark):
    """Seeded randomized sweep of div_half_up vs the DuckDB mirror —
    one batched job per engine, exact integer agreement required."""
    import random

    rng = random.Random(0xC0FFEE)
    totals = [rng.randint(-10**15, 10**15) for _ in range(400)] + [
        rng.randint(-10**6, 10**6) * 50 for _ in range(100)  # half grid
    ]
    sdf = spark.createDataFrame([(t,) for t in totals], "t long").select(
        "t", money.div_half_up(F.col("t"), 100).cast("long").alias("q")
    )
    got = {r["t"]: r["q"] for r in sdf.collect()}
    con = duckdb.connect()
    rows = con.execute(
        "SELECT t, " + money.div_half_up_sql("t", 100) + " FROM (SELECT "
        "unnest(?::BIGINT[]) AS t)", [totals]
    ).fetchall()
    for t, q in rows:
        assert got[t] == int(q), (t, got[t], q)

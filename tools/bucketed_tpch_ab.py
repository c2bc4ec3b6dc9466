#!/usr/bin/env python
"""Bucketed-warehouse amortization receipt (VERDICT r10 item 7).

`join_bucketed_colocated` proves the write-once/shuffle-never fact
join on one key; this tool quantifies what the bucketed
orders/lineitem layout buys ACROSS the TPC-H bench subset: it runs
each key twice — flat parquet vs the 8-bucket orderkey layout from
``ensure_bucketed_pair`` — by rebinding each operator module's
``load_table`` so orders/lineitem resolve to the bucketed catalog
tables (every other table stays flat), and receipts per key:

    exchanges(flat)  exchanges(bucketed)  wall(flat)  wall(bucketed)

Exchange counts come from the EXECUTED adaptive plan (AQE final),
counted as occurrences of "Exchange " nodes. Keys whose join keys
never touch the orderkey (q6, q11, ...) are expected deltas of 0 —
the receipt shows where bucketing pays and where it is moot, which
is the amortization story: one bucketed write serves every
orderkey-join query after it.

Run:  python tools/bucketed_tpch_ab.py [sf_dir] \
          > tools/receipts/bucketed_tpch_ab_r11.txt 2>&1
"""

import re
import sys
import time

sys.path.insert(0, ".")

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from bigdataprojectspring16_spark import tables as tables_mod  # noqa: E402
from bigdataprojectspring16_spark.operators import (  # noqa: E402
    analytics,
    tpch,
)
from bigdataprojectspring16_spark.sources.sinks import (  # noqa: E402
    ensure_bucketed_pair,
)

KEYS = [
    "tpch_q3_topk",
    "tpch_q4_late_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_delta",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q12_ship_delay_priority",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_sole_late_supplier",
]

#: Modules whose `load_table` binding the A arm rebinds.
OP_MODULES = (tpch, analytics)


def executed_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange ", plan))


def run_arm(spark, sf_dir, bucketed_names):
    real = tables_mod.load_table

    def bucketed_load(spark_, sf_dir_, name):
        if bucketed_names and name in ("orders", "lineitem"):
            b = bucketed_names[0] if name == "orders" else bucketed_names[1]
            return spark_.table(b)
        return real(spark_, sf_dir_, name)

    for m in OP_MODULES:
        m.load_table = bucketed_load
    try:
        out = {}
        for key in KEYS:
            t0 = time.time()
            df = QUERIES[key](spark, sf_dir)
            rows = df.collect()
            wall = time.time() - t0
            out[key] = (executed_exchanges(df), wall, len(rows))
        return out
    finally:
        for m in OP_MODULES:
            m.load_table = real


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("bucketed_tpch_ab")
    names = ensure_bucketed_pair(spark, sf_dir)
    print(f"bucketed TPC-H A/B @ {sf_dir}; bucketed tables: {names}")
    # warm both arms once, then measure (interleaved: flat, bucketed)
    run_arm(spark, sf_dir, None)
    flat = run_arm(spark, sf_dir, None)
    run_arm(spark, sf_dir, names)
    buck = run_arm(spark, sf_dir, names)
    print(f"{'key':34} {'exch_flat':>9} {'exch_buck':>9} "
          f"{'wall_flat':>9} {'wall_buck':>9} rows_equal")
    bad = 0
    for key in KEYS:
        ef, wf, nf = flat[key]
        eb, wb, nb = buck[key]
        eq = nf == nb
        bad += 0 if eq else 1
        print(f"{key:34} {ef:>9} {eb:>9} {wf:>9.2f} {wb:>9.2f} {eq}")
    tf = sum(v[1] for v in flat.values())
    tb = sum(v[1] for v in buck.values())
    xf = sum(v[0] for v in flat.values())
    xb = sum(v[0] for v in buck.values())
    print(f"{'TOTAL':34} {xf:>9} {xb:>9} {tf:>9.2f} {tb:>9.2f}")
    print(f"RESULT: {'PASS' if bad == 0 else 'FAIL'} "
          f"(row-count equality on {len(KEYS) - bad}/{len(KEYS)} keys)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Money-grid + TPC-H boundary audit at the in-repo sf10 decade
(VERDICT r8 item 3).

The §SF1 lesson (SCALING.md): float money sums are magnitude-bounded
— each new decade has caught bugs green at every smaller SF (six
grid-rule bugs at sf1 in r7; the shuffle-partition thrash at sf10 in
r8). This audit runs the money-carrying relational keys plus the
full TPC-H family where group totals reach ~1e12 cents — one decade
past anything previously verified — through the standard driver-sim
comparator against ``.bench_sf10/`` (tools/make_sf10.py).

Scope: relational keys only. The documents/embeddings families get
their sf10 evidence from the timing sweeps (bench_sweep) and the
sampled audit; the quadratic-oracle and full-output exclusions of
tools/sf1_audit.py apply here for the same reasons.

Usage:  python tools/sf10_audit.py [key ...]   # default: the audit set
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SF10_DIR = os.environ.get(
    "SF10_DIR", os.path.join(os.path.dirname(HERE), ".bench_sf10")
)

#: The audit set: every TPC-H shape plus each key whose output carries
#: a money-grid sum/average over an unboundedly-growing group
#: (functions/money.py call sites, SCALING.md §MONEY executed block).
AUDIT_KEYS = [
    # TPC-H (operators/tpch.py + the analytics-module shapes)
    "tpch_q2_min_cost_supplier",
    "tpch_q3_topk",
    "tpch_q4_late_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_delta",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_ship_delay_priority",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_lead_promo_suppliers",
    "tpch_q21_sole_late_supplier",
    "tpch_q22_idle_customers",
    # money-grid aggregates over unbounded groups
    "agg_pricing_summary",
    "agg_global",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_conditional",
    "agg_weighted_percentile",
    "agg_salted_topk",
    "agg_multi_distinct",
    "agg_percentiles",
    # money-carrying windows / composites / setops
    "window_share_of_total",
    "window_rank_topn",
    "orders_yoy_growth",
    "orders_abc_by_segment",
    "orders_rfm_segments",
    "orders_open_backlog_by_month",
    "custdist_two_level_agg",
    "supplier_return_rate_topk",
    "merge_upsert_batch",
    "rollup_incremental_merge",
    # joins whose outputs carry money aggregates
    "join_skew_events_customers",
    "join_multiway_star",
]


def main() -> int:
    if not os.path.isdir(SF10_DIR) or not os.path.exists(
        os.path.join(SF10_DIR, "lineitem.parquet")
    ):
        print(f"{SF10_DIR} missing lineitem — run: python tools/make_sf10.py")
        return 2
    keys = sys.argv[1:] or AUDIT_KEYS
    env = dict(os.environ, DRIVER_SIM_SF_DIR=SF10_DIR)
    print(
        f"sf10 money/tpch audit: {len(keys)} keys against {SF10_DIR}",
        flush=True,
    )
    return subprocess.call(
        [sys.executable, os.path.join(HERE, "driver_sim.py"), *keys], env=env
    )


if __name__ == "__main__":
    sys.exit(main())

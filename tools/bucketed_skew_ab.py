#!/usr/bin/env python
"""Bucketed-events skew-family A/B on the DECLARED plans (r13).

r12 proved the lever with a load_table-rebinding harness
(tools/receipts/bucketed_skew_ab_r12.txt: 50->18 exchanges, rows
equal 8/8) but no declared key consumed the layout. r13 wired it in:
the 8 skew-family keys route events/customer through
``tables.load_skew_table``, which consults the
``SPARK_GRAFT_BUCKETED_EVENTS`` knob (default ON). This tool now A/Bs
the PRODUCTION code path by flipping that knob per arm — the flat arm
is exactly what a user gets with the knob off, the bucketed arm is
the shipped default.

Receipts executed-plan Exchange counts (AQE final), walls, and
asserts ROWS EQUAL between arms for every key.

Run:  python tools/bucketed_skew_ab.py [sf_dir] \
          > tools/receipts/bucketed_skew_declared_r13.txt 2>&1
"""

import os
import re
import sys
import time

sys.path.insert(0, ".")

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from bigdataprojectspring16_spark.sources.sinks import (  # noqa: E402
    ensure_bucketed_events,
)
from bigdataprojectspring16_spark.tables import (  # noqa: E402
    BUCKETED_EVENTS_ENV,
)

KEYS = [
    "join_skew_events_customers",
    "sessionize_gap_batch",
    "stream_session",
    "events_funnel",
    "events_transition_matrix",
    "events_decayed_user_value",
    "events_inter_arrival_stats",
    "retention_cohorts",
]


def executed_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange ", plan))


def run_arm(spark, sf_dir, bucketed: bool):
    os.environ[BUCKETED_EVENTS_ENV] = "1" if bucketed else "0"
    try:
        out = {}
        for key in KEYS:
            t0 = time.time()
            df = QUERIES[key](spark, sf_dir)
            rows = sorted(repr(tuple(r)) for r in df.collect())
            wall = time.time() - t0
            out[key] = (executed_exchanges(df), wall, rows)
        return out
    finally:
        os.environ.pop(BUCKETED_EVENTS_ENV, None)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("bucketed-skew-ab")

    t0 = time.time()
    names = ensure_bucketed_events(spark, sf_dir)
    print(f"bucketed layout {names} ready in {time.time() - t0:.1f}s "
          f"(write-once, amortized across every run after the first)")

    flat = run_arm(spark, sf_dir, False)
    flat = run_arm(spark, sf_dir, False)  # warm arm for fair walls
    buck = run_arm(spark, sf_dir, True)

    tot_f = tot_b = 0
    mismatches = []
    print(f"\n{'key':34s} {'exch flat':>9s} {'exch buck':>9s} "
          f"{'wall flat':>9s} {'wall buck':>9s} rows_equal")
    for key in KEYS:
        ef, wf, rf = flat[key]
        eb, wb, rb = buck[key]
        eq = rf == rb
        if not eq:
            mismatches.append(key)
        tot_f += ef
        tot_b += eb
        print(f"{key:34s} {ef:9d} {eb:9d} {wf:9.2f} {wb:9.2f} "
              f"{'YES' if eq else 'NO'} ({len(rf)} rows)")
    print(f"\nTOTAL exchanges: flat {tot_f} -> bucketed {tot_b}; "
          f"row mismatches: {mismatches or 'none'}")
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())

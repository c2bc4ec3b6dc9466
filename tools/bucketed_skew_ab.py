#!/usr/bin/env python
"""Bucketed-events amortization receipt (VERDICT r11 #7).

The orderkey receipt (tools/bucketed_tpch_ab.py, 132->98 exchanges)
proved the write-once/shuffle-never lever on the TPC-H facts; this
tool extends it to the SKEW family — the place a 100 TB deployment
feels bucketing most, because the events⋈customer join funnels the
whole event stream through the hot 10% of customer keys and every
sessionization/funnel window re-shuffles events on user_id.

Arms per key: flat parquet vs ``ensure_bucketed_events`` (events
bucketed+sorted on (user_id, ts), customer on c_custkey, both 8
buckets), by rebinding the operator modules' ``load_table`` so only
events/customer resolve to the bucketed catalog tables. Receipts
executed-plan Exchange counts (AQE final), walls, and asserts ROWS
EQUAL between arms for every key.

Run:  python tools/bucketed_skew_ab.py [sf_dir] \
          > tools/receipts/bucketed_skew_ab_r12.txt 2>&1
"""

import re
import sys
import time

sys.path.insert(0, ".")

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from bigdataprojectspring16_spark import tables as tables_mod  # noqa: E402
from bigdataprojectspring16_spark.operators import (  # noqa: E402
    analytics,
    joins,
)
from bigdataprojectspring16_spark.sources.sinks import (  # noqa: E402
    ensure_bucketed_events,
)
from bigdataprojectspring16_spark.streaming import (  # noqa: E402
    batch_windows,
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

#: Modules whose `load_table` binding the bucketed arm rebinds.
OP_MODULES = (joins, analytics, batch_windows)


def executed_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange ", plan))


def run_arm(spark, sf_dir, bucketed_names):
    real = tables_mod.load_table

    def bucketed_load(spark_, sf_dir_, name):
        if bucketed_names and name in ("events", "customer"):
            b = bucketed_names[0] if name == "events" else bucketed_names[1]
            return spark_.table(b)
        return real(spark_, sf_dir_, name)

    for m in OP_MODULES:
        m.load_table = bucketed_load
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
        for m in OP_MODULES:
            m.load_table = real


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("bucketed-skew-ab")

    t0 = time.time()
    names = ensure_bucketed_events(spark, sf_dir)
    print(f"bucketed layout {names} ready in {time.time() - t0:.1f}s "
          f"(write-once, amortized across every run after the first)")

    flat = run_arm(spark, sf_dir, None)
    flat = run_arm(spark, sf_dir, None)  # warm arm for fair walls
    buck = run_arm(spark, sf_dir, names)

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

#!/usr/bin/env python
"""Direct oracle audit at the in-repo sf1 decade (r7, SCALING.md §SF1).

Runs every registry key's UNMODIFIED Spark query AND DuckDB oracle on
the `.bench_sf1/` fixtures through the standard driver-sim comparator,
excluding two documented classes:

- the 13 all-pairs/recursive-oracle keys (ALL_PAIRS_KEYS, shared with
  tools/sf01_sample_audit.py) — their ORACLES are quadratic/recursive
  SQL DuckDB cannot finish at sf1; they are covered instead by the
  deterministic-sample audit (SAMPLE_SRC=.bench_sf1 SAMPLE_MOD=64
  python tools/sf01_sample_audit.py);
- keys whose OUTPUT is a full-table-scale row set (projected > 500k
  rows at sf1): collecting and hashing millions of identical rows on
  both engines is measurement cost, not information — the keys'
  selective/aggregating semantics are covered by the smaller-SF gates.

This audit is what caught the r7 §SF1 grid-rule bugs (6 keys green at
every smaller SF); run it whenever money-sum or percentile code
changes, and once per round.

Usage:  python tools/sf1_audit.py [key ...]   # default: the audit set
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from sf01_sample_audit import ALL_PAIRS_KEYS  # noqa: E402

SF1_DIR = os.environ.get(
    "SF1_DIR", os.path.join(os.path.dirname(HERE), ".bench_sf1")
)

#: Output ∝ table size (projected rows at sf1 > 500k, from the
#: recorded sf0.01 driver sizes × 100).
FULL_OUTPUT_KEYS = [
    "scan_parquet",
    "scan_with_pushdown",
    "project_compute",
    "join_left_outer",
    "join_right_outer",
    "window_running_total",
    "window_lag_lead",
    "window_range_frame",
    "window_first_last",
    "sessionize_gap_batch",
    "stream_session",
    "stream_sliding",
    "multimodal_features",
]


def main() -> int:
    if not os.path.isdir(SF1_DIR):
        print(f"{SF1_DIR} missing — run: python tools/make_sf1.py")
        return 2
    import bigdataprojectspring16_spark as engine

    keys = sys.argv[1:] or sorted(
        set(engine.QUERIES) - set(ALL_PAIRS_KEYS) - set(FULL_OUTPUT_KEYS)
    )
    env = dict(os.environ, DRIVER_SIM_SF_DIR=SF1_DIR)
    print(f"sf1 direct audit: {len(keys)} keys against {SF1_DIR}", flush=True)
    return subprocess.call(
        [sys.executable, os.path.join(HERE, "driver_sim.py"), *keys], env=env
    )


if __name__ == "__main__":
    sys.exit(main())

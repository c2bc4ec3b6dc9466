#!/usr/bin/env python
"""Decade-scale broadcast-bounds audit (VERDICT r10 item 6).

Runs the same instrumented capture as tests/test_broadcast_bounds.py
— every registry query constructed with ``F.broadcast`` probed, every
captured frame counted — against an arbitrary fixture dir (default
the in-repo sf1 decade) and prints a per-site receipt table:

    measured  bound  ok?  site  reason

Usage:
    python tools/broadcast_bounds_audit.py [sf_dir]
        > tools/receipts/broadcast_bounds_sf1_r11.txt

Exit status 1 if any site exceeds its declared bound.
"""

import sys

sys.path.insert(0, ".")

from bigdataprojectspring16_spark import get_session  # noqa: E402
from bigdataprojectspring16_spark.plans.broadcast_audit import (  # noqa: E402
    BOUND_TABLE,
    capture_counts,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf1"
    spark = get_session("broadcast_bounds_audit")
    counts, failed = capture_counts(spark, sf_dir)
    print(f"broadcast bounds audit @ {sf_dir}: "
          f"{len(counts)} sites measured, {len(failed)} construct fails")
    if failed:
        print("CONSTRUCT FAILS:", failed)
    bad = 0
    for key in sorted(BOUND_TABLE):
        bound, reason = BOUND_TABLE[key]
        n = counts.get(key)
        if n is None:
            status = "unexercised"
        elif n <= bound:
            status = "ok"
        else:
            status = "OVER"
            bad += 1
        meas = "-" if n is None else str(n)
        print(f"{meas:>9} <= {bound:<9} {status:<11} "
              f"{key[0]}:{key[1]}#{key[2]}  [{reason}]")
    print(f"RESULT: {'FAIL' if bad or failed else 'PASS'} "
          f"({bad} over-bound, {len(failed)} construct fails)")
    return 1 if bad or failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""A/B the xxhash64 verify-coding knob (SCALING.md §SF100, r12):
for each coded dedup key, run string-form (off) vs coded (on) at the
given SF dir and assert the FULL results are identical (sorted-row
sha256), recording walls + job counts. The knob must be a pure
physical rewrite — any hash difference is a fail.

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/verify_codes_ab.py
"""
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from bigdataprojectspring16_spark.llmops.dedup import (  # noqa: E402
    VERIFY_TOKEN_CODES_CONF,
)
from bigdataprojectspring16_spark.plans.barriers import knob  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = sys.argv[1:] or [
    "dedup_minhash_lsh",
    "dedup_near_jaccard",
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "dedup_threshold_sweep",
]

spark = get_session("verify-codes-ab")
sc = spark.sparkContext


def run(key: str, arm: str, group_suffix: str = ""):
    with knob(spark, VERIFY_TOKEN_CODES_CONF, arm):
        # group must be unique per invocation: the tracker accumulates
        # job ids per group string, so a warmup sharing the timed
        # run's group would double the reported job count.
        group = f"{key}#{arm}{group_suffix}"
        sc.setJobGroup(group, key)
        t0 = time.perf_counter()
        rows = QUERIES[key](spark, SF_DIR).collect()
        wall = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    h = hashlib.sha256(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()[:16]
    return wall, jobs, len(rows), h


fails = []
for key in KEYS:
    run(key, "off", "#warm")  # warm inputs before any timed run
    w_off, j_off, n_off, h_off = run(key, "off")
    w_on, j_on, n_on, h_on = run(key, "on")
    verdict = "MATCH" if h_on == h_off else "HASH MISMATCH"
    if h_on != h_off:
        fails.append(key)
    print(
        f"{key}: off {w_off:.2f}s/{j_off}j/{n_off}rows "
        f"on {w_on:.2f}s/{j_on}j/{n_on}rows -> {verdict} "
        f"(off={h_off} on={h_on})",
        flush=True,
    )

print(f"\n{len(KEYS)} keys, {len(fails)} hash mismatches, sf_dir={SF_DIR}")
sys.exit(1 if fails else 0)

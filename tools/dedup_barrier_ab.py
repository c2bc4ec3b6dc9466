#!/usr/bin/env python
"""Interleaved A/B for the shared-frame materialization barriers in
llmops/dedup.py (MATERIALIZE_SHARED): re-evaluate-per-reference (A)
vs evaluate-once-via-lazy-localCheckpoint (B), on the three heaviest
near-dup queries at sf0.1. Same discipline as tools/cc_ab_experiment.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("AB_RUNS", "5"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = ["dedup_minhash_lsh", "dedup_threshold_sweep", "dedup_near_jaccard"]

import bigdataprojectspring16_spark as engine
from bigdataprojectspring16_spark.llmops import dedup

spark = engine.get_session("dedup-ab")


def timed(key):
    t0 = time.perf_counter()
    engine.QUERIES[key](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


results = {k: {"A": [], "B": []} for k in KEYS}
for k in KEYS:  # warm both arms
    spark.conf.set(dedup.MATERIALIZE_SHARED_CONF, 'false')
    timed(k)
    spark.conf.set(dedup.MATERIALIZE_SHARED_CONF, 'true')
    timed(k)
for i in range(N):
    for k in KEYS:
        spark.conf.set(dedup.MATERIALIZE_SHARED_CONF, 'false')
        results[k]["A"].append(timed(k))
        spark.conf.set(dedup.MATERIALIZE_SHARED_CONF, 'true')
        results[k]["B"].append(timed(k))
    print(
        f"pair {i}: "
        + " ".join(
            f"{k}: A={results[k]['A'][-1]:.2f} B={results[k]['B'][-1]:.2f}"
            for k in KEYS
        ),
        flush=True,
    )
for k in KEYS:
    a = sorted(results[k]["A"])
    b = sorted(results[k]["B"])
    med = lambda xs: xs[len(xs) // 2]
    print(
        f"{k}: A median={med(a):.2f} B median={med(b):.2f} "
        f"delta={(1 - med(b) / med(a)) * 100:+.1f}%"
    )
spark.stop()

#!/usr/bin/env python
"""Interleaved A/B for the loop-invariant-frame checkpoints in
graph_pagerank_rounds (MATERIALIZE_INVARIANTS): re-derive the edge
set / degrees / nodes per unrolled round (A) vs lazily checkpoint
each once (B). Same discipline as tools/cc_ab_experiment.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("AB_RUNS", "6"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bigdataprojectspring16_spark as engine
from bigdataprojectspring16_spark.llmops import graph

spark = engine.get_session("pr-ab")


def timed():
    t0 = time.perf_counter()
    engine.QUERIES["graph_pagerank_rounds"](spark, SF).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.perf_counter() - t0


spark.conf.set(graph.MATERIALIZE_INVARIANTS_CONF, 'false')
timed()
spark.conf.set(graph.MATERIALIZE_INVARIANTS_CONF, 'true')
timed()
a, b = [], []
for i in range(N):
    spark.conf.set(graph.MATERIALIZE_INVARIANTS_CONF, 'false')
    a.append(timed())
    spark.conf.set(graph.MATERIALIZE_INVARIANTS_CONF, 'true')
    b.append(timed())
    print(f"pair {i}: A={a[-1]:.2f} B={b[-1]:.2f}", flush=True)
a.sort()
b.sort()
med = lambda xs: xs[len(xs) // 2]
print(f"A (re-derive per round): median={med(a):.2f} {[f'{x:.2f}' for x in a]}")
print(f"B (checkpoint once):     median={med(b):.2f} {[f'{x:.2f}' for x in b]}")
print(f"delta: {(1 - med(b) / med(a)) * 100:+.1f}%")
spark.stop()

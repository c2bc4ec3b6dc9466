#!/usr/bin/env python
"""Interleaved A/B for graph_pagerank_rounds' edge build (r5):

A (selfjoin, r3/r4 form): lineitem self-join on l_orderkey, distinct
  over BOTH directed pair orientations (~2.4 M rows at sf0.1 into the
  dominant distinct shuffle).
B (group): per-order sorted part sets via one keyed collect_set, each
  unordered pair generated once by a narrow array-combination
  expansion, distinct over HALF the rows, directed set recovered by a
  shuffle-free union of the swapped copy after the barrier.

Same discipline as tools/pagerank_barrier_ab.py / SCALING.md: accept
only on a median delta beyond the noise envelope, interleaved pairs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("AB_RUNS", "6"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bigdataprojectspring16_spark as engine
from bigdataprojectspring16_spark.llmops import graph

spark = engine.get_session("pr-edge-ab")


def timed():
    t0 = time.perf_counter()
    engine.QUERIES["graph_pagerank_rounds"](spark, SF).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.perf_counter() - t0


spark.conf.set(graph.PAGERANK_EDGE_BUILD_CONF, 'selfjoin')
timed()
spark.conf.set(graph.PAGERANK_EDGE_BUILD_CONF, 'group')
timed()
a, b = [], []
for i in range(N):
    spark.conf.set(graph.PAGERANK_EDGE_BUILD_CONF, 'selfjoin')
    a.append(timed())
    spark.conf.set(graph.PAGERANK_EDGE_BUILD_CONF, 'group')
    b.append(timed())
    print(f"pair {i}: A={a[-1]:.2f} B={b[-1]:.2f}", flush=True)
a.sort()
b.sort()
med = lambda xs: xs[len(xs) // 2]
print(f"A (selfjoin 2-dir distinct): median={med(a):.2f} {[f'{x:.2f}' for x in a]}")
print(f"B (grouped 1-dir + swap):    median={med(b):.2f} {[f'{x:.2f}' for x in b]}")
print(f"delta: {(1 - med(b) / med(a)) * 100:+.1f}%")
spark.stop()

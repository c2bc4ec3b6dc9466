#!/usr/bin/env python
"""A/B for the r7 CC star-round rewrite (VERDICT r6 item 3).

Variant A (r3-r6 "groupjoin"): each star round computes neighborhood
minima with a groupBy, then JOINS them back — two shuffles of the edge
frame per star, ~5 exchanges per large+small round.
Variant B (r7 "window"): the minimum rides a window aggregate over the
same partition key — one shuffle per star, ~3 exchanges per round —
and small-star emits folded+self edges in one narrow explode.

Interleaved A B A B ... runs of graph_cluster_keep_best at sf0.1 so
host drift hits both arms equally; also records per-run Spark job
counts (the deterministic plan probe, BASELINE.md r5) and asserts the
two arms return the IDENTICAL result rows before timing anything.
Accept B on a consistent median improvement + a materially lower job
count at equal results.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("CC_AB_RUNS", "5"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bigdataprojectspring16_spark as engine
from bigdataprojectspring16_spark.llmops import graph
from bigdataprojectspring16_spark.plans.barriers import knob

spark = engine.get_session("cc-star-ab")
QUERY = "graph_cluster_keep_best"


def run(tag: str):
    group = f"ccstar-{tag}-{time.monotonic_ns()}"
    spark.sparkContext.setJobGroup(group, tag)
    t0 = time.perf_counter()
    engine.QUERIES[QUERY](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
    return dt, jobs


# --- result-equality gate (before any timing) ---
def rows(impl: str):
    with knob(spark, graph.CC_STAR_IMPL_CONF, impl):
        return sorted(
            tuple(r) for r in engine.QUERIES[QUERY](spark, SF).collect()
        )


ra, rb = rows("groupjoin"), rows("window")
assert ra == rb, f"arm results differ: {ra[:3]} vs {rb[:3]}"
print(f"result-equality gate: {len(ra)} identical rows", flush=True)

# warmup both arms
for impl in ("groupjoin", "window"):
    with knob(spark, graph.CC_STAR_IMPL_CONF, impl):
        run("warmup")

a, b, aj, bj = [], [], [], []
for i in range(N):
    with knob(spark, graph.CC_STAR_IMPL_CONF, "groupjoin"):
        dt, j = run("A")
        a.append(dt)
        aj.append(j)
    with knob(spark, graph.CC_STAR_IMPL_CONF, "window"):
        dt, j = run("B")
        b.append(dt)
        bj.append(j)
    print(
        f"run {i}: A={a[-1]:.2f}s ({aj[-1]} jobs) "
        f"B={b[-1]:.2f}s ({bj[-1]} jobs)",
        flush=True,
    )

med = lambda xs: sorted(xs)[len(xs) // 2]
print(f"A (groupjoin): {[f'{x:.2f}' for x in sorted(a)]} median={med(a):.2f} jobs={aj}")
print(f"B (window):    {[f'{x:.2f}' for x in sorted(b)]} median={med(b):.2f} jobs={bj}")
print(f"delta: {(1 - med(b) / med(a)) * 100:.1f}% wall, jobs {med(aj)} -> {med(bj)}")
spark.stop()

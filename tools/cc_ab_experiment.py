#!/usr/bin/env python
"""A/B experiment for the CC fixpoint cost (VERDICT r3 item 5).

Variant A (current): per round, `localCheckpoint()` (eager — job 1)
then the narrow `sig()` aggregate (job 2).
Variant B: `localCheckpoint(eager=False)`; the round's single `sig()`
action materializes the checkpoint — one job per round, lineage still
truncated.

Runs N timed executions of graph_cluster_keep_best at sf0.1 per
variant, interleaved A B A B … so host drift hits both arms equally.
Accept B only on a consistent >=15% median improvement (bench-noise
discipline, BASELINE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("CC_AB_RUNS", "5"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bigdataprojectspring16_spark as engine
from bigdataprojectspring16_spark.llmops import graph

spark = engine.get_session("cc-ab")


def timed():
    t0 = time.perf_counter()
    engine.QUERIES["graph_cluster_keep_best"](spark, SF).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.perf_counter() - t0


def set_variant(lazy: bool):
    # session-conf flip (race-free; module global stays the default)
    spark.conf.set(graph.LAZY_CHECKPOINT_CONF, str(lazy))


# warmup (primes parquet cache for both arms)
set_variant(False)
timed()
set_variant(True)
timed()

a, b = [], []
for i in range(N):
    set_variant(False)
    a.append(timed())
    set_variant(True)
    b.append(timed())
    print(f"run {i}: A={a[-1]:.2f}s B={b[-1]:.2f}s", flush=True)

a_s, b_s = sorted(a), sorted(b)
med = lambda xs: xs[len(xs) // 2]
print(f"A (eager+sig 2 jobs/round): {[f'{x:.2f}' for x in a_s]} median={med(a_s):.2f}")
print(f"B (lazy ckpt 1 job/round):  {[f'{x:.2f}' for x in b_s]} median={med(b_s):.2f}")
print(f"delta: {(1 - med(b_s) / med(a_s)) * 100:.1f}%")
spark.stop()

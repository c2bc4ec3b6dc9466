#!/usr/bin/env python
"""End-to-end run of the fixpoint keys under barrierMode=durable
(VERDICT r9 item 7).

``spark.bigdataprojectspring16.barrierMode=durable`` is the 100 TB
deployment path for multi-hour fixpoints — reliable ``checkpoint()``
to shared storage instead of unreplicated executor-local blocks
(plans/barriers.py). tests/test_barrier_knobs.py pins mode
EQUIVALENCE on toy frames; this tool exercises the full declared
CC / cluster-keep-best / PageRank keys at a real decade under the
durable mode with a real checkpoint dir, comparing results and job
counts against the default (local) mode in the SAME session.

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf1 \
        python tools/durable_barrier_run.py > receipt.txt

Exit non-zero on any hash mismatch between modes.
"""
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from comparator import value_hash  # noqa: E402

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from bigdataprojectspring16_spark.plans.barriers import (  # noqa: E402
    BARRIER_MODE_CONF,
    knob,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_sf1")
KEYS = sys.argv[1:] or [
    "graph_connected_components",
    "graph_cluster_keep_best",
    "graph_pagerank_rounds",
]


def run(spark, key: str, mode_label: str):
    group = f"{key}#{mode_label}"
    spark.sparkContext.setJobGroup(group, key)
    t0 = time.perf_counter()
    df = QUERIES[key](spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    cols = [f.name for f in df.schema.fields]
    sec = time.perf_counter() - t0
    jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
    return value_hash(rows, cols), len(rows), round(sec, 2), jobs


def main() -> int:
    spark = get_session("durable-barrier-run")
    ckpt = tempfile.mkdtemp(prefix="spark-graft-durable-ckpt-")
    spark.sparkContext.setCheckpointDir(ckpt)
    print(f"sf_dir={SF_DIR} checkpoint_dir={ckpt}", flush=True)
    status = 0
    for key in KEYS:
        h_local, n_local, s_local, j_local = run(spark, key, "local")
        with knob(spark, BARRIER_MODE_CONF, "durable"):
            h_dur, n_dur, s_dur, j_dur = run(spark, key, "durable")
        ok = h_local == h_dur and n_local == n_dur
        status |= 0 if ok else 1
        print(
            f"{'OK ' if ok else 'FAIL'} {key}: local {n_local} rows "
            f"{s_local}s/{j_local} jobs vs durable {n_dur} rows "
            f"{s_dur}s/{j_dur} jobs — hashes "
            f"{'match' if h_local == h_dur else 'DIFFER'}",
            flush=True,
        )
    # how much the durable mode actually wrote to "reliable storage"
    total = 0
    for root, _dirs, files in os.walk(ckpt):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    print(f"checkpoint bytes written: {total}", flush=True)
    return status


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Bench a subset of keys with the exact bench.py methodology
(untimed warmup, best-of-3 noop-sink walls, per-run job counts).

    python tools/bench_keys.py key [key ...]

Prints one JSON line per the bench contract fields (queries/jobs/
jobs_unstable) for the subset — used for before/after receipts
without paying a full 47-key sweep per iteration.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    from bigdataprojectspring16_spark import QUERIES, get_session

    keys = sys.argv[1:]
    spark = get_session("bench-keys")
    timings: dict[str, float] = {}
    job_counts: dict[str, int] = {}
    jobs_unstable: dict[str, list[int]] = {}
    for key in keys:
        fn = QUERIES[key]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        run_jobs: list[int] = []
        for i in range(RUNS):
            group = f"{key}#run{i}"
            spark.sparkContext.setJobGroup(group, key)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            run_jobs.append(
                len(
                    spark.sparkContext.statusTracker().getJobIdsForGroup(group)
                )
            )
        job_counts[key] = run_jobs[-1]
        if len(set(run_jobs)) > 1:
            jobs_unstable[key] = run_jobs
        timings[key] = round(best, 4)
    print(
        json.dumps(
            {
                "queries": timings,
                "jobs": job_counts,
                "jobs_unstable": jobs_unstable,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

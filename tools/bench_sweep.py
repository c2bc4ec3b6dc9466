#!/usr/bin/env python
"""Per-key bench sweep with error isolation (r7, for the sf1 decade).

bench.py is the driver's contract (one JSON line, aborts on error);
this tool times the same headline set one key at a time, CATCHING
per-key failures so a single blow-up at a new scale point doesn't
hide every other key's timing. Prints one JSON line per key and a
summary line; used to build the BASELINE.md sf1 scaling table.

  SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf1 python tools/bench_sweep.py [keys...]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (headline set lives there)
from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))

keys = sys.argv[1:] or bench.HEADLINE
spark = get_session("bench-sweep")

ok, failed = {}, {}
for key in keys:
    fn = QUERIES[key]
    try:
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best, jobs = float("inf"), 0
        for i in range(RUNS):
            group = f"{key}#sweep{i}"
            spark.sparkContext.setJobGroup(group, key)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            jobs = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
        ok[key] = round(best, 4)
        print(json.dumps({"key": key, "sec": ok[key], "jobs": jobs}), flush=True)
    except Exception as e:  # noqa: BLE001 — isolation is the point
        msg = str(e).split("\n")[0][:300]
        failed[key] = msg
        print(json.dumps({"key": key, "error": msg}), flush=True)

print(
    json.dumps(
        {
            "metric": "sweep_total_sec",
            "value": round(sum(ok.values()), 4),
            "n_ok": len(ok),
            "failed": failed,
            "sf_dir": SF_DIR,
            "runs": RUNS,
        }
    )
)
spark.stop()

"""SparkSession factory with the engine's tuning defaults (SURVEY §4).

Design rule: the engine never collects to the driver inside an
operator; every declared query stays a shuffle-partitioned plan so the
same code runs on local[32] for tests and on a 1000-executor cluster
at 100 TB. AQE handles runtime partition coalescing and skew joins;
the session timezone is pinned to UTC because the fixtures'
timestamps are zone-less and the DuckDB oracle compares them naively
(SURVEY §5.3 — a mismatched session TZ is the #1 hash-failure risk).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

#: Configs applied by :func:`get_session` AND re-asserted (the
#: runtime-settable subset) by :func:`ensure_session_confs` on
#: sessions the driver created for us.
ENGINE_CONFS: dict[str, str] = {
    # Correctness-critical (runtime settable).
    "spark.sql.session.timeZone": "UTC",
    # events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects
    # (PARQUET_TYPE_ILLEGAL) — read as int64 ns and let the loader
    # convert to µs timestamps (tables.py, matching DuckDB's ns→µs
    # truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: runtime re-plan, partition coalescing,
    # skew-join splitting — the 100 TB levers (SURVEY §4).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: we want NULL-on-bad-cast like DuckDB's TRY semantics
    # for the few places we cast strings (json props → int).
    "spark.sql.ansi.enabled": "false",
    # Runtime-settable: a driver-built session defaults to 200 shuffle
    # partitions, which at sf0.01 means ~170 empty tasks of pure
    # scheduling latency per shuffle across a 133-key sweep. AQE
    # coalescing hides most of it, but asserting the tuned value keeps
    # externally-built sessions on the same cost model as ours.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
}

#: Startup-only configs (not runtime settable) used when WE build the
#: session (tests / bench). On a real cluster these come from
#: spark-submit; sized here for local[32] with 128 GiB.
_STARTUP_CONFS: dict[str, str] = {
    "spark.driver.memory": "8g",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # Bucketed-table warehouse for the co-located-join path
    # (tests/test_bucketing.py); kept out of the repo tree.
    "spark.sql.warehouse.dir": "/tmp/spark-graft-warehouse",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
}


#: Sessions already asserted — every `spark.conf.get` is a py4j round
#: trip, and load_table runs for each of a query's input tables, so
#: without this cache a 133-key driver sweep pays ~7 RPCs × tables ×
#: keys of pure overhead (VERDICT.md "Next round" item 1).
_CONFS_ASSERTED: weakref.WeakSet = weakref.WeakSet()


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Assert the runtime-settable engine confs on an existing session.

    Every query function calls this, so correctness (TZ, AQE, Arrow)
    holds even when the driver — not us — built the SparkSession.
    Idempotent and cached per live session object.
    """
    if spark in _CONFS_ASSERTED:
        return spark
    for k, v in ENGINE_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build — startup value wins
    _CONFS_ASSERTED.add(spark)
    return spark


def get_session(app_name: str = "bigdataprojectspring16_spark") -> SparkSession:
    """Build (or fetch) the tuned SparkSession for tests and bench."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**_STARTUP_CONFS, **ENGINE_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_session_confs(spark)

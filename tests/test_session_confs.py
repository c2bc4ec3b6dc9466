"""Session-conf assertion semantics (ADVICE.md r2 items 1 and 3).

Two behaviors a real cluster depends on:

1. ``ensure_session_confs`` must never clobber host tuning: it lowers
   ``spark.sql.shuffle.partitions`` only when the session sits at
   Spark's stock default (200).  Any other value — e.g. thousands on a
   1000-executor cluster — is the host's decision and survives,
   because AQE can only coalesce DOWN from this value.
2. The per-session assert cache must not make conf drift permanent: a
   one-RPC sentinel probe (session timezone, the #1 hash-failure risk
   per SURVEY §5.3) detects external mutation and re-asserts the full
   engine conf set.
"""

from __future__ import annotations

from bigdataprojectspring16_spark.session import (
    ENGINE_CONFS,
    _SHUFFLE_PARTITIONS_KEY,
    _TUNED_SHUFFLE_PARTITIONS,
    ensure_session_confs,
    invalidate_conf_cache,
)

TZ_KEY = "spark.sql.session.timeZone"


def _restore(spark, key, value):
    spark.conf.set(key, value)
    invalidate_conf_cache(spark)
    ensure_session_confs(spark)


def test_stock_default_shuffle_partitions_lowered(spark):
    saved = spark.conf.get(_SHUFFLE_PARTITIONS_KEY)
    try:
        spark.conf.set(_SHUFFLE_PARTITIONS_KEY, "200")
        invalidate_conf_cache(spark)
        ensure_session_confs(spark)
        assert spark.conf.get(_SHUFFLE_PARTITIONS_KEY) == _TUNED_SHUFFLE_PARTITIONS
    finally:
        _restore(spark, _SHUFFLE_PARTITIONS_KEY, saved)


def test_host_tuned_shuffle_partitions_respected(spark):
    saved = spark.conf.get(_SHUFFLE_PARTITIONS_KEY)
    try:
        # A cluster operator sized this for their executor fleet.
        spark.conf.set(_SHUFFLE_PARTITIONS_KEY, "4096")
        invalidate_conf_cache(spark)
        ensure_session_confs(spark)
        assert spark.conf.get(_SHUFFLE_PARTITIONS_KEY) == "4096"
    finally:
        _restore(spark, _SHUFFLE_PARTITIONS_KEY, saved)


def test_sentinel_detects_timezone_drift(spark):
    ensure_session_confs(spark)  # populate the cache
    spark.conf.set(TZ_KEY, "America/New_York")  # external mutation
    ensure_session_confs(spark)  # cached session — sentinel must fire
    assert spark.conf.get(TZ_KEY) == ENGINE_CONFS[TZ_KEY] == "UTC"


def test_sentinel_repair_reasserts_full_conf_set(spark):
    ensure_session_confs(spark)
    spark.conf.set(TZ_KEY, "America/New_York")
    # A second drifted conf that is NOT the sentinel: repair must fix
    # it too (drift invalidates the whole cache entry, not just TZ).
    spark.conf.set("spark.sql.ansi.enabled", "true")
    ensure_session_confs(spark)
    assert spark.conf.get(TZ_KEY) == "UTC"
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"


def test_invalidate_conf_cache_all_sessions(spark):
    ensure_session_confs(spark)
    invalidate_conf_cache()  # no-arg form clears every session
    # Must re-assert without error and leave confs correct.
    ensure_session_confs(spark)
    assert spark.conf.get(TZ_KEY) == "UTC"

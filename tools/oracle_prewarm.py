"""Pre-warm the DuckDB oracle cache for a set of registry keys —
oracle side ONLY, no SparkSession (VERDICT r11 next-round #2).

Usage:
    DRIVER_SIM_SF_DIR=/root/testdata/sf0.1 \
        python tools/oracle_prewarm.py [key ...]     # default: all

Each key's oracle SQL runs in THIS process's DuckDB connection and
its verdict triple is stored via oracle_store; already-cached keys
are skipped instantly, so the script is idempotent and safe to
re-launch. Heavy keys (HEAVY_ORACLE_KEYS in driver_sim.py — the
30-60+ min single-threaded DP / all-pairs oracles) are best farmed
out one-process-per-key so they run concurrently:

    for k in dedup_edit_distance dedup_threshold_sweep ...; do
        python tools/oracle_prewarm.py "$k" &
    done

DUCKDB_MEM bounds each process (default 12GB — several prewarms plus
a Spark JVM must coexist on one host).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import oracle_store
from comparator import value_hash

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.1")

# oracle_sql() is plain metadata on __spark_entry__ — importing it
# pulls pyspark modules but never boots a JVM/SparkSession.
import __spark_entry__ as mod

oracles = mod.oracle_sql()
only = sys.argv[1:]
keys = only or sorted(oracles)
unknown = [k for k in keys if k not in oracles]
if unknown:
    sys.exit(f"unknown / rows-only keys (no oracle SQL): {unknown}")

comp_ver = oracle_store.comparator_version()
data_fp = oracle_store.data_fingerprint(SF_DIR)

con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '12GB')}'")
for t in oracle_store.TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/{t}.parquet')"
    )

done = skipped = 0
for name in keys:
    path = oracle_store.cache_path(name, oracles[name], comp_ver, data_fp)
    if oracle_store.load(path) is not None:
        skipped += 1
        print(f"skip {name}: cached", flush=True)
        continue
    t0 = time.time()
    otab = con.execute(oracles[name]).arrow()
    ocols = otab.column_names
    orows = [tuple(d[c] for c in ocols) for d in otab.to_pylist()]
    ohash = value_hash(orows, ocols)
    elapsed = time.time() - t0
    oracle_store.store(path, name, SF_DIR, len(orows), ocols, ohash, elapsed)
    done += 1
    print(f"warm {name}: {len(orows)} rows in {elapsed:.1f}s", flush=True)

print(f"\nprewarm: {done} computed, {skipped} already cached, "
      f"sf_dir={SF_DIR}", flush=True)

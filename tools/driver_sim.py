"""Simulate the driver's t1 smoke + t2 oracle gate through the public
surface: import __spark_entry__, run entry(), then every queries() key
at sf0.01 vs oracle_sql() in DuckDB (row-count + schema + order-
insensitive value-hash).

Type-faithful comparison (VERDICT.md r2 item 3): the r2 driver flagged
5 keys whose *values* matched but whose oracle column came back as
DuckDB HUGEINT (int128) — a representation the old `%.6g`/`str()`
normalizer was blind to. The oracle side is now fetched via `.arrow()`
(HUGEINT -> decimal128, int64 stays int64, NULLs stay NULL) and every
value is hashed with a TYPE TAG, so an int64 `6` and a decimal128 `6`
hash differently — exactly the sensitivity the real driver showed.

Floats render at DRIVER GRADE (VERDICT.md r5 item 4): `round(v, 9)`
then `repr`, the same discipline as tests/conftest.py. The old
tolerant `%.6g` provably masked the r5 driver red — q10's
307843.60-vs-307843.59 cent flip renders identically at 6 significant
digits — so a key could receipt green here and fail the real driver.
A receipt from this tool is only evidence if its comparator is at
least as strict as the driver's; `tests/test_driver_sim_comparator.py`
pins the q10 pair as a regression.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import __spark_entry__ as mod

import oracle_store
from comparator import first_diff, norm, value_hash  # noqa: F401
from bigdataprojectspring16_spark import get_session

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_session("driver-sim")

# --- t1 smoke ---
df = mod.entry(spark)
rows = df.collect()
print(f"t1 smoke: entry() -> {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# --- t2 oracle gate ---
con = duckdb.connect()
# An IN-MEMORY DuckDB has no temp_directory, so out-of-core operators
# cannot spill — a decade-scale oracle (e.g. simhash's 200M-row
# nibble stream at sf10) dies with a bad-allocation OOM instead of
# offloading. Give it a spill dir and a bounded share of RAM so the
# oracle side degrades to disk, never to a crash (and never starves
# the concurrently-running Spark JVM).
con.execute("SET temp_directory='/tmp/duckdb_spill'")
# Default cap: 40% of physical RAM (ADVICE r10 — a hardcoded 48GB
# exceeds memory on smaller hosts, breaking the never-starve-Spark
# guarantee); DUCKDB_MEM stays the explicit override.
_default_mem = f"{max(1, os.sysconf('SC_PHYS_PAGES') * os.sysconf('SC_PAGE_SIZE') * 2 // 5 // (1 << 30))}GB"
con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', _default_mem)}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

queries = mod.queries()
oracles = mod.oracle_sql()


only = set(sys.argv[1:])
#: Keys whose DUCKDB oracle is pathologically slow at sf0.1+. The r12
#: prewarm measured them all (tools/oracle_cache *.json carry
#: oracle_secs): docs_leakage_safe_split 6891s (all-pairs jaccard
#: edges + recursive reachability CTE — invisible to the r11 sweeps,
#: which died before reaching it alphabetically),
#: dedup_edit_distance 3119s, dedup_ngram_jaccard 3118s,
#: dedup_threshold_sweep 606s, dedup_near_jaccard 208s,
#: docs_subset_containment 176s, dedup_minhash_lsh 148s. With
#: DRIVER_SIM_HEAVY_LAST=1 they sort to the END so a time-boxed
#: closing sweep covers the most keys before any cutoff; with the
#: oracle cache (default ON) they cost nothing after the first run.
HEAVY_ORACLE_KEYS = {
    "dedup_edit_distance",
    "dedup_embedding_cosine",
    "sim_pairs_threshold",
    "dedup_threshold_sweep",
    "dedup_ngram_jaccard",
    "dedup_near_jaccard",
    "dedup_minhash_lsh",
    "docs_leakage_safe_split",
    "docs_subset_containment",
    # The two recursive-reachability graph oracles run ~90 min each
    # at sf0.1 (r12 prewarm: cluster_keep_best 5535s, cc 5390s;
    # pagerank_rounds' unrolled-rounds oracle is NOT heavy — 2.0s —
    # and every other oracle-keyed key warms in seconds).
    "graph_cluster_keep_best",
    "graph_connected_components",
}
_heavy_last = os.environ.get("DRIVER_SIM_HEAVY_LAST") == "1"
def _order(name):
    return (name in HEAVY_ORACLE_KEYS, name) if _heavy_last else name

# Oracle-result cache (VERDICT r11 next-round #2): replay the DuckDB
# verdict triple when (SQL, parquet fingerprint, comparator) are all
# unchanged. Default ON — every HIT is labelled in the per-key line
# and counted in the footer, so a receipt is transparent about how
# much of its oracle side was recomputed. DRIVER_SIM_ORACLE_CACHE=0
# disables for a fully-recomputed (judge-grade) sweep.
_cache_on = os.environ.get("DRIVER_SIM_ORACLE_CACHE", "1") != "0"
_comp_ver = oracle_store.comparator_version()
_data_fp = oracle_store.data_fingerprint(SF_DIR)
cache_hits = 0


def _run_oracle(name):
    """(nrows, cols, value_hash, rows-or-None, hit) for the oracle side.

    .arrow() is the type-faithful path: DuckDB HUGEINT becomes
    decimal128(38,0) (Python Decimal), int64 stays int, NULLs in int
    columns stay None (a pandas .df() would coerce the whole column
    to float64).
    """
    import time as _time

    path = oracle_store.cache_path(name, oracles[name], _comp_ver, _data_fp)
    if _cache_on:
        cached = oracle_store.load(path)
        if cached is not None:
            return (cached["nrows"], cached["cols"], cached["value_hash"],
                    None, True)
    t0 = _time.time()
    otab = con.execute(oracles[name]).arrow()
    ocols = otab.column_names
    opy = otab.to_pylist()
    orows = [tuple(d[c] for c in ocols) for d in opy]
    ohash = value_hash(orows, ocols)
    if _cache_on:
        oracle_store.store(path, name, SF_DIR, len(orows), ocols, ohash,
                           _time.time() - t0)
    return len(orows), ocols, ohash, orows, False


fails, rows_only = [], []
cache_hit_keys: list[str] = []
for name in sorted(only or queries, key=_order):
    sdf = queries[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [f.name for f in sdf.schema.fields]
    if name not in oracles:
        rows_only.append((name, len(srows)))
        status = f"rows-only ({len(srows)} rows)"
        ok = len(srows) >= 0
    else:
        n_orows, ocols, ohash, orows, hit = _run_oracle(name)
        cache_hits += hit
        if hit:
            cache_hit_keys.append(name)
        ok = (
            len(srows) == n_orows
            and sorted(scols) == sorted(ocols)
            and value_hash(srows, scols) == ohash
        )
        if ok:
            status = "MATCH" + (" [oracle-cache]" if hit else "")
        elif len(srows) != n_orows or sorted(scols) != sorted(ocols):
            status = f"MISMATCH rows {len(srows)}vs{n_orows} cols {sorted(scols)}vs{sorted(ocols)}"
        else:
            # The red path always diffs against freshly-executed rows:
            # a cached verdict never decides a failure's diagnostics.
            if orows is None:
                otab = con.execute(oracles[name]).arrow()
                ocols = otab.column_names
                orows = [tuple(d[c] for c in ocols)
                         for d in otab.to_pylist()]
            status = "HASH MISMATCH " + first_diff(srows, scols, orows, ocols)
    print(f"{'OK ' if ok else 'FAIL'} {name}: {status}")
    if not ok:
        fails.append(name)

# Subset runs must say so: "N queries, 0 fails" after a 3-key run
# used to print the FULL registry count (the verify-skill caveat) —
# a receipt could read as a full pass when it wasn't.
ran = len(only or queries)
scope = "" if not only else f" (subset of {len(queries)}-key registry)"
cache_note = f", {cache_hits} oracle-cache hits" if _cache_on else ", oracle cache OFF"
print(f"\n{ran} queries{scope}, {len(fails)} fails, {len(rows_only)} rows-only{cache_note}")

# Mechanical cache audit (VERDICT r12 #6): DRIVER_SIM_CACHE_AUDIT=K
# re-executes K of this run's cached verdicts live and fails on any
# divergence — the r12 judge did this by hand (20-key cache-off
# sample); with the env set, every receipt carries it. Sampling is
# DETERMINISTIC per (comparator, fixture) state so a receipt is
# reproducible, and skips HEAVY_ORACLE_KEYS (their single run is
# minutes-to-hours; the audit exists to catch fixture/key-pervasive
# drift, which the cheap keys expose equally).
_audit_k = int(os.environ.get("DRIVER_SIM_CACHE_AUDIT", "0") or "0")
if _audit_k > 0 and cache_hit_keys:
    import hashlib

    auditable = [k for k in cache_hit_keys if k not in HEAVY_ORACLE_KEYS]

    def _audit_rank(name):
        return hashlib.sha256(
            f"{_comp_ver}|{_data_fp}|{name}".encode()
        ).hexdigest()

    sample = sorted(auditable, key=_audit_rank)[:_audit_k]
    diverged = []
    for name in sample:
        path = oracle_store.cache_path(
            name, oracles[name], _comp_ver, _data_fp
        )
        cached = oracle_store.load(path)
        otab = con.execute(oracles[name]).arrow()
        ocols = otab.column_names
        orows = [tuple(d[c] for c in ocols) for d in otab.to_pylist()]
        live = {"nrows": len(orows), "cols": list(ocols),
                "value_hash": value_hash(orows, ocols)}
        ok = cached == live
        print(f"cache-audit {'OK  ' if ok else 'DIVERGED'} {name}"
              + ("" if ok else f": cached={cached} live={live}"))
        if not ok:
            diverged.append(name)
    print(f"cache-audit: {len(sample) - len(diverged)}/{len(sample)} "
          f"verdicts reproduced live ({len(auditable)} auditable hits, "
          f"heavy keys excluded)")
    if diverged:
        print(f"cache-audit FAILED: {diverged}")
        sys.exit(2)
if fails:
    sys.exit(1)

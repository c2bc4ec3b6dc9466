#!/usr/bin/env python
"""One-shot re-key of the oracle cache to the r13 fingerprint.

r13 folded an edge-content hash into ``oracle_store.data_fingerprint``
(ADVICE r12: the (size, mtime_ns)-only form replays a stale verdict
for a timestamp-preserving in-place regeneration). The new scheme
changes every cache path, which would force a full recompute — at
sf0.1 that is ~7.7 h of single-threaded DuckDB for the heavy oracles
alone (tools/driver_sim.py HEAVY_ORACLE_KEYS, per-entry oracle_secs).

This migration re-keys each entry WITHOUT weakening trust: an entry
is copied to its new path only if its filename matches the OLD
scheme's digest computed over the CURRENT fixture files — i.e. it
would have been a legitimate cache hit under the old rules at
migration time — and the new path's digest then binds it to the
content hash of those same files. Entries matching neither digest
(fixtures drifted since they were written) are left in place and
reported; they can never hit again under either scheme.

Run:  python tools/migrate_oracle_cache.py \
          > tools/receipts/oracle_cache_migration_r13.txt 2>&1
"""

import hashlib
import json
import os
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)
sys.path.insert(0, TOOLS)

import oracle_store  # noqa: E402


def old_data_fingerprint(sf_dir: str) -> str:
    """The r12 scheme: (size, mtime_ns) per table, no content hash."""
    parts = []
    for t in oracle_store.TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(path)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{t}:absent")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def main() -> int:
    import __spark_entry__ as mod

    oracles = mod.oracle_sql()
    comp_ver = oracle_store.comparator_version()
    fps: dict[str, tuple[str, str]] = {}

    migrated, already, orphaned, unknown_key = 0, 0, [], []
    for fn in sorted(os.listdir(oracle_store.CACHE_DIR)):
        if not fn.endswith(".json"):
            continue
        path = os.path.join(oracle_store.CACHE_DIR, fn)
        try:
            with open(path) as fh:
                entry = json.load(fh)
            key, sf_dir = entry["key"], entry["sf_dir"]
        except (OSError, ValueError, KeyError):
            orphaned.append(fn + " (unreadable)")
            continue
        if key not in oracles:
            unknown_key.append(fn)
            continue
        if sf_dir not in fps:
            fps[sf_dir] = (
                old_data_fingerprint(sf_dir),
                oracle_store.data_fingerprint(sf_dir),
            )
        old_fp, new_fp = fps[sf_dir]
        sql = oracles[key]
        old_path = oracle_store.cache_path(key, sql, comp_ver, old_fp)
        new_path = oracle_store.cache_path(key, sql, comp_ver, new_fp)
        if path == new_path:
            already += 1
        elif path == old_path:
            if not os.path.exists(new_path):
                with open(new_path + ".tmp", "w") as fh:
                    json.dump(entry, fh, indent=1)
                os.replace(new_path + ".tmp", new_path)
            os.remove(old_path)
            migrated += 1
        else:
            orphaned.append(fn)

    print(f"comparator {comp_ver}")
    for sf_dir, (old_fp, new_fp) in sorted(fps.items()):
        print(f"{sf_dir}: old fp {old_fp} -> new fp {new_fp}")
    print(
        f"migrated {migrated}, already-new {already}, "
        f"orphaned (left in place) {len(orphaned)}, "
        f"unknown-key {len(unknown_key)}"
    )
    for fn in orphaned + unknown_key:
        print(f"  orphan: {fn}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

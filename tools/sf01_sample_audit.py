#!/usr/bin/env python
"""sf0.1-scale oracle audit for the 13 all-pairs/recursive-oracle keys
(VERDICT r4 next-round #1).

These keys' ORACLE form is quadratic or recursive SQL DuckDB cannot
finish at sf0.1 (the r4 sweep excluded them; their bench-scale
correctness rested on sf0.01 oracles + invariance tests — exactly the
class the r4 truncation bug hid in). The sanctioned substitute is a
DETERMINISTIC-SAMPLE oracle: hash-mod sample the documents/embeddings
tables of sf0.1 (default 1-in-4 ≈ 25%, 5× the pair density the r4
verdict sanctioned at 5%), materialize the sample as parquet, and run
the UNMODIFIED Spark queries AND their UNMODIFIED DuckDB oracles on
it through the standard driver-sim comparator (row count + schema +
type-tagged value hash). The sample keeps sf0.1's document lengths,
token distributions, and value ranges — the axes the truncation class
varied on — while bounding the oracle's pair count at (n/4)².

Usage:  python tools/sf01_sample_audit.py            # all 13 keys
        SAMPLE_MOD=8 python tools/sf01_sample_audit.py key1 key2 ...
"""
import os
import subprocess
import sys

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.environ.get("SAMPLE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SAMPLE_DIR", "/tmp/sf01_sample")
MOD = int(os.environ.get("SAMPLE_MOD", "4"))

ALL_PAIRS_KEYS = [
    "graph_cluster_keep_best",
    "graph_connected_components",
    "docs_leakage_safe_split",
    "docs_fold_contamination",
    "dedup_minhash_lsh",
    "dedup_near_jaccard",
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "dedup_embedding_cosine",
    "dedup_threshold_sweep",
    "sim_pairs_threshold",
    "multimodal_payload_near_dup",
    "docs_subset_containment",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    # (r7: body moved under a main guard so tools/sf1_audit.py can
    # import ALL_PAIRS_KEYS without triggering a sample build + run)
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # spill dir + bounded RAM: an in-memory DuckDB cannot
    # offload without a temp_directory (driver_sim.py rule)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/documents.parquet' "
        f"WHERE hash(doc_id) % {MOD} = 0 ORDER BY doc_id) "
        f"TO '{DST}/documents.parquet' (FORMAT parquet)"
    )
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/embeddings.parquet' "
        f"WHERE hash(vec_id) % {MOD} = 0 ORDER BY vec_id) "
        f"TO '{DST}/embeddings.parquet' (FORMAT parquet)"
    )
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = f"{DST}/{t}.parquet"
        # Recreate on every run: a stale (or dangling) symlink from a
        # previous run with a different SAMPLE_SRC would silently mix
        # sources into the receipt.
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(f"{SRC}/{t}.parquet", dst)
    n_docs = con.sql(
        f"SELECT count(*) FROM '{DST}/documents.parquet'"
    ).fetchone()[0]
    n_vecs = con.sql(
        f"SELECT count(*) FROM '{DST}/embeddings.parquet'"
    ).fetchone()[0]
    print(
        f"sample: {n_docs} docs / {n_vecs} vecs (1-in-{MOD} hash-mod of {SRC})",
        flush=True,
    )

    keys = sys.argv[1:] or ALL_PAIRS_KEYS
    env = dict(os.environ, DRIVER_SIM_SF_DIR=DST)
    return subprocess.call(
        [sys.executable, os.path.join(HERE, "driver_sim.py"), *keys], env=env
    )


if __name__ == "__main__":
    sys.exit(main())

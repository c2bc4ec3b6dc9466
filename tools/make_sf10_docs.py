#!/usr/bin/env python
"""Documents-only synthetic sf10 (VERDICT r7 item 4).

The two data-proportional headline keys (`dedup_minhash_lsh`,
`dedup_threshold_sweep`) consume only the documents table, so the
third measured decade needs only that table at 100x sf0.1 — ~60 MB
in-repo (gitignored), not the full ~1.8 GB universe. Same
isomorphic-copy construction as tools/make_sf1.py (disjoint
per-copy token prefixes -> near-dup structure replicates linearly,
exactly like a corpus growing source by source); copy 0 is sf0.1
verbatim, so the decade chain sf0.1 -> sf1 -> sf10 is nested.

Run:  python tools/make_sf10_docs.py   (writes .bench_sf10/documents.parquet)
Then: SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf10 \
          python tools/bench_sweep.py dedup_minhash_lsh dedup_threshold_sweep
"""
import os

import duckdb

SRC = os.environ.get("SF10_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SF10_OUT", os.path.join(REPO, ".bench_sf10"))
COPIES = int(os.environ.get("SF10_COPIES", "100"))
STRIDE = 10_000  # > max doc_id 4,999 at sf0.1 (guarded below)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    mx = con.execute(
        f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    assert mx < STRIDE, (mx, STRIDE)
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")
    con.execute(
        f"""
        COPY (
            WITH src AS (SELECT * FROM '{SRC}/documents.parquet', copies)
            SELECT doc_id + i * {STRIDE} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE array_to_string(
                       list_transform(string_split(text, ' '),
                                      t -> 'c' || i || '_' || t), ' ')
                   END AS text,
                   lang, source,
                   CASE WHEN i = 0 THEN n_chars ELSE CAST(length(
                       array_to_string(
                           list_transform(string_split(text, ' '),
                                          t -> 'c' || i || '_' || t), ' ')
                   ) AS BIGINT) END AS n_chars
            FROM src
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM '{OUT}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    print(f"documents: {n} rows -> {OUT}")


if __name__ == "__main__":
    main()

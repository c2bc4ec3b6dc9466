#!/usr/bin/env python
"""Documents-only synthetic sf100 — the FOURTH measured decade for the
data-proportional dedup keys (VERDICT r10 item 5).

`dedup_minhash_lsh` and `dedup_threshold_sweep` are the
linear-by-design pipelines; every decade so far (sf1 in r7, sf10 in
r8, full-registry sf10 in r10) caught a bug class that was green one
decade down, so the linearity claim earns a fourth point. Same
isomorphic-copy construction as tools/make_sf10_docs.py with 1000
copies — and the SAME stride and per-copy token prefixes, so the
decade chain stays NESTED: copies 0-99 of this fixture are
bit-identical in content to .bench_sf10/documents.parquet (copy 0 is
sf0.1 verbatim). ~5M docs, ~600 MB parquet, gitignored.

Run:  python tools/make_sf100_docs.py  (writes .bench_sf100/documents.parquet)
Then: SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf100 \
          python tools/bench_sweep.py dedup_minhash_lsh dedup_threshold_sweep
"""
import os

import duckdb

SRC = os.environ.get("SF100_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SF100_OUT", os.path.join(REPO, ".bench_sf100"))
COPIES = int(os.environ.get("SF100_COPIES", "1000"))
STRIDE = 10_000  # same stride as sf10 -> nested doc_id spaces


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    mx = con.execute(
        f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    assert mx < STRIDE, (mx, STRIDE)
    assert COPIES * STRIDE < 2**40, "doc_id space"
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
    # Nesting spot-check: copy 37's first doc must equal the sf10
    # fixture's same doc when that fixture exists.
    sf10 = os.path.join(REPO, ".bench_sf10", "documents.parquet")
    if os.path.exists(sf10):
        a = con.execute(
            f"SELECT text FROM '{OUT}/documents.parquet' "
            f"WHERE doc_id = {37 * STRIDE} "
        ).fetchone()
        b = con.execute(
            f"SELECT text FROM '{sf10}' WHERE doc_id = {37 * STRIDE}"
        ).fetchone()
        assert a == b, "sf100 is not nested over sf10"
        print("nesting spot-check vs .bench_sf10: OK")
    con.close()
    print(f"documents: {n} rows -> {OUT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Deterministic synthetic sf1 fixtures (VERDICT r6 item 2).

/root/testdata ships nothing above sf0.1, so the scaling curve had a
single measured decade. This tool buys one more: it upsamples the
sf0.1 fixtures 10x into ``<repo>/.bench_sf1/`` (gitignored; ~170 MB)
as TEN ISOMORPHIC UNIVERSES — copy i is sf0.1 with every key shifted
into its own disjoint range — so that:

- FK structure is preserved exactly (copy i's lineitem references
  copy i's orders/part/supplier; region/nation stay the shared
  25-row dims), hence join fan-out and skew shape are IDENTICAL to
  sf0.1 within every copy;
- document token spaces are disjoint across copies (every token of
  copy i>0 is prefixed ``c<i>_`` — a bijection on the token space, so
  within-copy Jaccard/minhash/cluster structure is unchanged) and
  embedding vectors are cyclically rotated by i dims (an orthogonal
  permutation: within-copy geometry exact, cross-copy cosine
  uncorrelated) — near-dup pair/cluster OUTPUT therefore scales
  linearly (10x), not quadratically, which is what a corpus that
  grows by ingesting new sources actually does;
- everything is a pure function of the sf0.1 rows (no RNG, no
  timestamps), so the fixture is bit-reproducible.

Run:  python tools/make_sf1.py    (writes .bench_sf1/<table>.parquet)
Then: SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf1 python bench.py
"""
import os

import duckdb

SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SF1_OUT", os.path.join(REPO, ".bench_sf1"))
COPIES = int(os.environ.get("SF1_COPIES", "10"))

#: Key stride per remapped column: a power of ten above the sf0.1 max
#: key, so copy ranges cannot collide and remapped keys stay small
#: (max ~1e7 — far inside every engine-portable hash bound).
from strides import STRIDE  # noqa: E402 — shared copy-stride table


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")

    # Guard the stride assumptions against a changed fixture.
    for table, col, stride in [
        ("customer", "c_custkey", STRIDE["custkey"]),
        ("supplier", "s_suppkey", STRIDE["suppkey"]),
        ("part", "p_partkey", STRIDE["partkey"]),
        ("orders", "o_orderkey", STRIDE["orderkey"]),
        ("events", "event_id", STRIDE["event_id"]),
        ("events", "user_id", STRIDE["user_id"]),
        ("documents", "doc_id", STRIDE["doc_id"]),
        ("embeddings", "vec_id", STRIDE["vec_id"]),
    ]:
        mx = con.execute(
            f"SELECT max({col}) FROM '{SRC}/{table}.parquet'"
        ).fetchone()[0]
        assert mx < stride, (table, col, mx, stride)

    def emit(name: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n} rows", flush=True)

    # Shared dims: fixed cardinality at any SF (as in TPC-H itself).
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    emit(
        "customer",
        f"""
        SELECT c_custkey + i * {STRIDE['custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', copies
        """,
    )
    emit(
        "supplier",
        f"""
        SELECT s_suppkey + i * {STRIDE['suppkey']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', copies
        """,
    )
    emit(
        "part",
        f"""
        SELECT p_partkey + i * {STRIDE['partkey']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', copies
        """,
    )
    emit(
        "orders",
        f"""
        SELECT o_orderkey + i * {STRIDE['orderkey']} AS o_orderkey,
               o_custkey + i * {STRIDE['custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', copies
        """,
    )
    emit(
        "lineitem",
        f"""
        SELECT l_orderkey + i * {STRIDE['orderkey']} AS l_orderkey,
               l_partkey + i * {STRIDE['partkey']} AS l_partkey,
               l_suppkey + i * {STRIDE['suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', copies
        """,
    )
    emit(
        "events",
        f"""
        SELECT event_id + i * {STRIDE['event_id']} AS event_id,
               ts,
               user_id + i * {STRIDE['user_id']} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', copies
        """,
    )
    # Token-space prefix per copy (identity for copy 0): bijective on
    # tokens within a copy, disjoint across copies -> near-dup
    # structure replicates instead of cross-linking.
    emit(
        "documents",
        f"""
        WITH src AS (SELECT * FROM '{SRC}/documents.parquet', copies)
        SELECT doc_id + i * {STRIDE['doc_id']} AS doc_id,
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
        """,
    )
    # Cyclic dimension rotation per copy (identity for copy 0): an
    # orthogonal permutation, so norms and all within-copy angles are
    # exactly preserved while cross-copy cosines decorrelate.
    emit(
        "embeddings",
        f"""
        SELECT vec_id + i * {STRIDE['vec_id']} AS vec_id,
               CASE WHEN i = 0 THEN embedding ELSE
                   CAST(list_concat(embedding[i + 1:],
                                    embedding[1:i]) AS FLOAT[])
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', copies
        """,
    )
    con.close()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

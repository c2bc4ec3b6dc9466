"""Simulate the driver's t1 smoke + t2 oracle gate through the public
surface: import __spark_entry__, run entry(), then every queries() key
at sf0.01 vs oracle_sql() in DuckDB (row-count + schema + order-
insensitive value-hash)."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as mod

from bigdataprojectspring16_spark import get_session

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_session("driver-sim")

# --- t1 smoke ---
df = mod.entry(spark)
rows = df.collect()
print(f"t1 smoke: entry() -> {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# --- t2 oracle gate ---
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

queries = mod.queries()
oracles = mod.oracle_sql()


def norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


only = set(sys.argv[1:])
fails, rows_only = [], []
for name in sorted(only or queries):
    sdf = queries[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [f.name for f in sdf.schema.fields]
    if name not in oracles:
        rows_only.append((name, len(srows)))
        status = f"rows-only ({len(srows)} rows)"
        ok = len(srows) >= 0
    else:
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = [tuple(r) for r in ores.fetchall()]
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and value_hash(srows, scols) == value_hash(orows, ocols)
        )
        status = "MATCH" if ok else (
            f"MISMATCH rows {len(srows)}vs{len(orows)} cols {sorted(scols)}vs{sorted(ocols)}"
        )
    print(f"{'OK ' if ok else 'FAIL'} {name}: {status}")
    if not ok:
        fails.append(name)

print(f"\n{len(queries)} queries, {len(fails)} fails, {len(rows_only)} rows-only")
if fails:
    sys.exit(1)

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify via sbt first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
every <outDir>/<name> parquet against the DuckDB oracle in
<outDir>/oracle_sql.json executed over the same sf dir.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

fails = []
for name in sorted(oracle):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        fails.append((name, "missing spark output")); print(f"MISS  {name}"); continue
    try:
        spark_df = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchall()
        spark_cols = [d[0] for d in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet')").fetchall()]
        duck = con.sql(oracle[name])
        duck_cols = duck.columns
        duck_rows = duck.fetchall()
    except Exception as e:
        fails.append((name, f"error: {e}")); print(f"ERR   {name}: {str(e)[:200]}"); continue
    if sorted(spark_cols) != sorted(duck_cols):
        fails.append((name, f"cols {spark_cols} vs {duck_cols}"))
        print(f"COLS  {name}: spark={spark_cols} duck={duck_cols}"); continue
    # Dtype gate: fetched Python values are dtype-insensitive (HUGEINT and
    # BIGINT both fetch as int) but the driver's hash compare is NOT — an
    # un-cast DuckDB sum() (HUGEINT) hash-mismatches a Spark BIGINT even
    # when every value is equal. Compare declared types and fail on the
    # known-dangerous divergences.
    DANGEROUS = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
    spark_types = dict((d[0], d[1]) for d in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet')").fetchall())
    duck_types = dict((d[0], d[1]) for d in con.sql(
        f"DESCRIBE {oracle[name]}").fetchall())
    dt_bad = []
    for c in duck_cols:
        st, dt = spark_types.get(c, "?"), duck_types.get(c, "?")
        base = lambda t: t.split("(")[0]
        if base(dt) in DANGEROUS or (base(dt) == "DECIMAL") != (base(st) == "DECIMAL"):
            dt_bad.append((c, st, dt))
        elif base(st) != base(dt):
            print(f"DTYPE? {name}.{c}: spark={st} duck={dt} (non-fatal)")
    if dt_bad:
        fails.append((name, f"dtypes {dt_bad}"))
        print(f"DTYPE {name}: " + ", ".join(f"{c} spark={st} duck={dt}" for c, st, dt in dt_bad))
        continue
    # reorder columns by name (driver semantics), keep row order
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    srows = [tuple(canon(r[i]) for i in sidx) for r in spark_df]
    drows = [tuple(canon(r[i]) for i in didx) for r in duck_rows]
    if len(srows) != len(drows):
        fails.append((name, f"rows {len(srows)} vs {len(drows)}"))
        print(f"ROWS  {name}: spark={len(srows)} duck={len(drows)}"); continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    if bad:
        i, a, b = bad[0]
        fails.append((name, f"{len(bad)} mismatched rows; first at {i}: {a} != {b}"))
        print(f"DIFF  {name}: {len(bad)}/{len(srows)} rows; first@{i}:\n  spark={a}\n  duck ={b}")
    else:
        print(f"OK    {name} ({len(srows)} rows)")

extra = [n for n in os.listdir(out_dir)
         if os.path.isdir(os.path.join(out_dir, n)) and n not in oracle]
for n in sorted(extra):
    cnt = con.sql(f"SELECT count(*) FROM read_parquet('{out_dir}/{n}/*.parquet')").fetchone()[0]
    print(f"NOORA {n} (rows-only: {cnt} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)

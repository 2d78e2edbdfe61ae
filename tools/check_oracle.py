#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut>
For each <verifyOut>/<name> spark-parquet dir with an oracle SQL entry,
runs the oracle in DuckDB over the sfDir tables and compares
(sorted columns by name, sorted rows, exact values).
"""
import sys, json, glob, math
import duckdb

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

fails = 0
for name in sorted(oracle):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"MISSING  {name}")
        fails += 1
        continue
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    try:
        o = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    s = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    ocols, scols = sorted(o.column_names), sorted(s.column_names)
    if ocols != scols:
        print(f"SCHEMA   {name}: oracle={ocols} spark={scols}")
        fails += 1
        continue
    orows = sorted(tuple(norm(r[c]) for c in ocols) for r in o.to_pylist())
    srows = sorted(tuple(norm(r[c]) for c in scols) for r in s.to_pylist())
    if orows == srows:
        print(f"OK       {name} ({len(srows)} rows)")
    else:
        fails += 1
        print(f"MISMATCH {name}: oracle {len(orows)} rows, spark {len(srows)} rows")
        od = [r for r in orows if r not in set(srows)][:3]
        sd = [r for r in srows if r not in set(orows)][:3]
        print(f"  oracle-only: {od}")
        print(f"  spark-only:  {sd}")
print(f"\n{fails} failures / {len(oracle)} oracles")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each
Verify-dumped parquet, run the matching oracle SQL in DuckDB over the
same sf dir, and compare as sorted multisets (columns sorted by name,
rows sorted, values normalized).  Usage: check.py <sfDir> <verifyOut>
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = spark_rel.description
        sdata = spark_rel.fetchall()
        ocur = con.execute(sql)
        ocols = ocur.description
        odata = ocur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: error {str(e).splitlines()[0][:160]}")
        fails += 1
        continue
    snames = sorted(c[0] for c in scols)
    onames = sorted(c[0] for c in ocols)
    if snames != onames:
        print(f"FAIL {name}: schema {snames} vs {onames}")
        fails += 1
        continue
    sidx = [[c[0] for c in scols].index(n) for n in snames]
    oidx = [[c[0] for c in ocols].index(n) for n in onames]
    srows = sorted(tuple(norm(r[i]) for i in sidx) for r in sdata)
    orows = sorted(tuple(norm(r[i]) for i in oidx) for r in odata)
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
        fails += 1
    elif srows != orows:
        bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
        print(f"FAIL {name}: values differ at sorted row {bad}:")
        print(f"  spark:  {srows[bad]}")
        print(f"  oracle: {orows[bad]}")
        fails += 1
    else:
        print(f"ok   {name}: {len(srows)} rows")
print(f"{'PASS' if fails == 0 else 'FAIL'}: {len(oracle) - fails}/{len(oracle)}")
sys.exit(1 if fails else 0)

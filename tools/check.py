#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — faithful replica.

Mirrors the driver's pandas-based comparator:
  * results load as pandas DataFrames (so DuckDB HUGEINT -> float64 is a
    visible dtype mismatch against Spark's int64, exactly as the driver's
    value-hash sees it),
  * columns sorted by name, rows sorted with DataFrame.sort_values — an
    array/struct-typed output column raises TypeError here just like the
    driver's sorter, and is reported as a hard FAIL,
  * values compared EXACTLY (full float precision, no sig-digit rounding).

Usage: check.py <sfDir> <verifyOut> [only_csv]
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    # directory-shaped tables (multi-file layouts like testdata_sf1)
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def load_sorted(df, label, name):
    df = df[sorted(df.columns)]
    bad = [c for c in df.columns
           if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any()]
    if bad:
        raise TypeError(f"array/struct-typed output column(s) {bad} in {label} "
                        f"result of {name} — the driver's sorter crashes on these; "
                        "posexplode to scalar rows instead")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = 0
checked = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    checked += 1
    try:
        sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: error {str(e).splitlines()[0][:160]}")
        fails += 1
        continue
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL {name}: schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        fails += 1
        continue
    try:
        sdf = load_sorted(sdf, "spark", name)
        odf = load_sorted(odf, "oracle", name)
    except TypeError as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
        fails += 1
        continue
    # The driver's hash upcasts every integer width to uint64, so
    # int32 vs int64 is equivalent — but int vs float (the DuckDB
    # HUGEINT symptom) hashes differently and must fail.
    def kind(dt):
        return {"i": "int", "u": "int", "f": "float"}.get(dt.kind, dt.kind)
    dt_mismatch = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                   for c in sdf.columns
                   if kind(sdf[c].dtype) != kind(odf[c].dtype)]
    if dt_mismatch:
        print(f"FAIL {name}: dtype mismatch {dt_mismatch} "
              "(DuckDB HUGEINT->float64? CAST the oracle aggregate to BIGINT)")
        fails += 1
        continue
    # exact comparison; NaN==NaN allowed (a stable hash treats them alike)
    neq = ~((sdf == odf) | (sdf.isna() & odf.isna()))
    if neq.any().any():
        r = int(neq.any(axis=1).idxmax())
        cols = [c for c in sdf.columns if neq[c].iloc[r]]
        print(f"FAIL {name}: values differ at sorted row {r}, cols {cols}:")
        for c in cols[:4]:
            print(f"  {c}: spark={sdf[c].iloc[r]!r} oracle={odf[c].iloc[r]!r}")
        fails += 1
    else:
        print(f"ok   {name}: {len(sdf)} rows")
print(f"{'PASS' if fails == 0 else 'FAIL'}: {checked - fails}/{checked}")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query
output dumped by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same testdata parquet and compare canonicalized rows
(columns sorted by name, values stringified, rows sorted).

Usage: check_oracle.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
try:
    twins = json.load(open(f"{outdir}/twins.json"))
except FileNotFoundError:
    twins = {}

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return cols, sorted(rows)

ok = fail = 0
for name in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"MISS  {name}: no parquet written"); fail += 1; continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        tw = twins.get(name)
        note = f"covered by twin {tw}" if tw else "no oracle, NO TWIN"
        print(f"ROWS  {name}: {len(spark_df)} rows ({note})")
        if tw:
            ok += 1
        else:
            fail += 1  # every no-oracle gate must name a hash-green twin
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"OERR  {name}: oracle SQL failed: {e}"); fail += 1; continue
    sc, sr = canon(spark_df)
    dc, dr = canon(duck_df)
    if sc != dc:
        print(f"FAIL  {name}: columns differ spark={sc} duck={dc}"); fail += 1
    elif sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"FAIL  {name}: rows differ n_spark={len(sr)} n_duck={len(dr)} first_diffs={diffs}")
        fail += 1
    else:
        print(f"PASS  {name}: {len(sr)} rows"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

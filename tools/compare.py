#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify's parquet output against the DuckDB oracles in
oracle_sql.json, comparing (column-name-sorted, row-sorted) values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        try:
            import decimal
            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].astype(float)
        except Exception:
            pass
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

n_pass = n_fail = 0
results = {}
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p):
        continue
    raw_df = con.execute(f"SELECT * FROM '{p}/*.parquet'").df()
    if name not in oracles:
        # skip canon(): no-oracle outputs may carry non-hashable columns
        # (arrays) that the value-sort cannot handle
        results[name] = f"NO-ORACLE rows={len(raw_df)}"
        continue
    spark_df = canon(raw_df)
    try:
        ora_df = canon(con.execute(oracles[name]).df())
    except Exception as e:
        results[name] = f"ORACLE-ERR {str(e)[:200]}"
        n_fail += 1
        continue
    if list(spark_df.columns) != list(ora_df.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(spark_df.columns)} oracle={list(ora_df.columns)}"
        n_fail += 1
        continue
    if len(spark_df) != len(ora_df):
        results[name] = f"ROWCOUNT-MISMATCH spark={len(spark_df)} oracle={len(ora_df)}"
        n_fail += 1
        continue
    mism = []
    for c in spark_df.columns:
        a, b = spark_df[c], ora_df[c]
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                af, bf = a.astype(float), b.astype(float)
                eq = (af.values == bf.values) | (af.isna().values & bf.isna().values)
                if not eq.all():
                    d = np.nanmax(np.abs(af.values - bf.values))
                    mism.append(f"{c}(maxdiff={d:.3e},n={int((~eq).sum())})")
            else:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
                if not eq.all():
                    i = int((~eq).argmax())
                    mism.append(f"{c}(n={int((~eq).sum())},e.g. {a.iloc[i]!r}!={b.iloc[i]!r})")
        except Exception as e:
            mism.append(f"{c}(cmp-err {str(e)[:80]})")
    if mism:
        results[name] = "VALUE-MISMATCH " + "; ".join(mism[:5])
        n_fail += 1
    else:
        results[name] = f"PASS rows={len(spark_df)}"
        n_pass += 1

for k, v in results.items():
    print(f"{k:40s} {v}")
print(f"\n{n_pass} pass, {n_fail} fail, {len(results)-n_pass-n_fail} no-oracle")
sys.exit(1 if n_fail else 0)

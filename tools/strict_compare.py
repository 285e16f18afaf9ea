#!/usr/bin/env python3
"""Strict replica of a hash-based correctness gate: NO decimal->float
normalization. Sorts columns by name, sorts rows, compares exact string
representations of every value. Reports per-column dtype + first diff.

Usage: python3 tools/strict_compare.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
# big-soak oracles (list aggregates over 50k docs) exceed the in-memory
# budget — enable out-of-core spilling. Do NOT set
# preserve_insertion_order=false: the native-ASOF oracles (q58/q62/q77)
# have no expressible tie-break, and DuckDB's insertion-order scan is
# what makes its equal-timestamp pick line up with the Spark side's
# max-payload tie-break on tie-heavy (soak-replicated) data — measured:
# disabling it flips ~150k soak rows to arbitrary tied copies.
def connect():
    c = duckdb.connect()
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    # leave headroom below system RAM so a doomed oracle dies while the
    # box (and a reconnect) still has memory to work with; derive from
    # the actual machine (a hardcoded figure could RAISE the cap above
    # physical RAM on a smaller box and invite the kernel OOM-killer)
    half_ram_gb = max(1, (os.sysconf("SC_PAGE_SIZE") *
                          os.sysconf("SC_PHYS_PAGES")) // (2 * 1024**3))
    c.execute(f"SET memory_limit='{half_ram_gb}GB'")
    for t in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    return c

con = connect()

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

# queries that were never actually value-compared (oracle error, missing
# output, decimal ban) — without this list a consumer grepping only for
# STRICT-MISMATCH reads an errored query as covered (r6 ADVICE)
not_compared = []
# value-level failures (ROWCOUNT / STRICT-MISMATCH) — exit nonzero on
# these too, and with a SMALLER code than skipped-only: a CI consumer
# must never read an actual mismatch as success (r7 ADVICE)
mismatched = []

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify every value exactly (repr distinguishes Decimal('1.40') vs 1.4)
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if pd.isna(v) else repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p) or name not in oracles:
        continue
    if only and name not in only:
        continue
    # decimal output columns surface differently per client path
    # (Decimal('18.00') via pyarrow vs 18.0 via duckdb .df()) and
    # hash-mismatch in the driver even when values agree — ban them
    import pyarrow.parquet as pq
    parts = glob.glob(f"{p}/*.parquet")
    if not parts:
        print(f"{name}: NO-OUTPUT (query failed during Verify?)")
        not_compared.append(name)
        continue
    sch = pq.read_schema(parts[0])
    decs = [f.name for f in sch if "decimal" in str(f.type)]
    if decs:
        print(f"{name}: DECIMAL-OUTPUT {decs} — cast to DOUBLE on both sides")
        not_compared.append(name)
        continue
    # an oracle that exhausts DuckDB (soak-quadratic pair sets) must not
    # kill the whole sweep — report, RECONNECT (a failed query leaves the
    # allocator's reservation poisoned on DuckDB 1.0: every later
    # allocation OOMs), and move on
    try:
        raw_s = con.execute(f"SELECT * FROM '{p}/*.parquet'").df()
        raw_o = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE-ERROR {type(e).__name__}: {str(e)[:120]}", flush=True)
        not_compared.append(name)
        try:
            con.close()
        except Exception:
            pass
        con = None
        import gc, time
        gc.collect()
        for attempt in range(10):
            try:
                con = connect()
                break
            except Exception:
                gc.collect()
                time.sleep(6)
        if con is None:
            print("RECONNECT-FAILED: box memory never recovered; aborting sweep",
                  flush=True)
            sys.exit(2)
        continue
    s, o = canon(raw_s), canon(raw_o)
    if len(s) != len(o):
        print(f"{name}: ROWCOUNT {len(s)} vs {len(o)}")
        mismatched.append(name)
        continue
    bad = []
    for c in s.columns:
        neq = (s[c].values != o[c].values)
        if neq.any():
            i = int(neq.argmax())
            bad.append(f"{c} [spark_dtype={raw_s[c].dtype} oracle_dtype={raw_o[c].dtype}] n={int(neq.sum())} e.g. {s[c].iloc[i]} != {o[c].iloc[i]}")
    if bad:
        print(f"{name}: STRICT-MISMATCH")
        for b in bad[:6]:
            print(f"    {b}")
        mismatched.append(name)
    else:
        print(f"{name}: strict-pass rows={len(s)}")

# exit codes: 0 = all compared, all match; 1 = value-level failure
# (STRICT-MISMATCH or ROWCOUNT) regardless of skips; 3 = no value
# failures but some queries were never compared (weaker evidence)
if not_compared:
    print(f"NOT-COMPARED ({len(not_compared)}): {','.join(not_compared)}",
          flush=True)
if mismatched:
    print(f"MISMATCHED ({len(mismatched)}): {','.join(mismatched)}",
          flush=True)
    sys.exit(1)
if not_compared:
    sys.exit(3)
print("ALL-COMPARED", flush=True)

#!/usr/bin/env python3
"""Sharded strict compare — closes oracle-side resource holes (r6: q114
OOM, q147 disk spill at the 20x soak) by partitioning the COMPARISON
key space into k hash slices and verifying one slice at a time, with a
DuckDB reconnect between slices so each shard starts from a clean
allocator.

The shard predicate `abs(<col>) % k = i` is applied identically to
both sides: to the Spark parquet dump (a cheap scan filter) and
wrapped around the oracle SQL (`SELECT * FROM (<oracle>) q WHERE
abs(q.<col>) % k = i`). DuckDB pushes the outer predicate through the oracle's
projections and equi-joins down to the base column that produced
<col>, so the quadratic intermediates (candidate-pair sets, rank
vectors) shrink ~1/k per shard — that is the whole point: the oracle
never has to hold the full output's working set at once.

Union of shards == full comparison needs care (r7 ADVICE): a plain
`col % k = i` predicate silently drops NULL rows (NULL % k = NULL)
and, since both DuckDB and Spark take `%`'s sign from the dividend,
negative keys land in -(k-1)..0 and miss every nonnegative slice. So
the slices are `abs(col) % k = i` plus one dedicated `col IS NULL`
shard — a complete tiling for any BIGINT-ish domain — and the sum of
per-shard Spark rowcounts is cross-checked against the unsharded
Spark dump count at the end, so an incomplete tiling can never report
sharded-strict-pass.

Semantics are identical to tools/strict_compare.py (repr-level
canonicalization, column sort, mergesort row order); only the slicing
is new.

Usage:
  python3 tools/sharded_compare.py <sfDir> <verifyOutDir> <query> <shardCol> <k>
"""
import sys, json, glob, os, gc, time
import duckdb
import pandas as pd

sfdir, outdir, qname, shard_col = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
k = int(sys.argv[5]) if len(sys.argv) > 5 else 8
# Optional INJECTION mode (args 6+7): wrap-around sharding relies on the
# oracle engine pushing the outer output-column predicate down into the
# quadratic intermediate — DuckDB 1.0 does NOT push through the
# DISTINCT + list-join chain of e.g. q114, so every shard still
# materializes the full candidate join (measured r8: OOM at 62 GB even
# at 1/16 output). Injection shards the oracle at the SOURCE of the
# blowup instead: `anchor` must occur exactly once in the oracle text
# (e.g. the candidate-join ON clause) and is rewritten to
# `anchor AND abs(<oracle_col>) % k = i`, pruning the a-side BEFORE the
# join explodes. The Spark dump keeps the outer predicate on shard_col;
# the two tilings agree because the output column IS the anchored join
# column. The NULL shard injects `<oracle_col> IS NULL` at the same
# site (cheap — pushed into the base scan), so completeness still holds
# for a nullable domain.
anchor = sys.argv[6] if len(sys.argv) > 6 else None
oracle_col = sys.argv[7] if len(sys.argv) > 7 else None
if anchor and not oracle_col:
    sys.exit("injection mode needs both anchor and oracle_col")


def connect(threads=None):
    c = duckdb.connect()
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    # default half of RAM; override when the box is otherwise idle —
    # q114's 20x shards need ~70 GB with 32 threads but pass at 100 GB /
    # 16 threads (fewer threads = smaller per-thread operator state)
    half_ram_gb = max(1, (os.sysconf("SC_PAGE_SIZE") *
                          os.sysconf("SC_PHYS_PAGES")) // (2 * 1024**3))
    c.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', f'{half_ram_gb}GB')}'")
    threads = threads or os.environ.get("DUCKDB_THREADS")
    if threads:
        c.execute(f"SET threads={int(threads)}")
    for t in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(t)[: -len(".parquet")]
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if pd.isna(v) else repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracle = json.load(f)[qname]
if anchor and oracle.count(anchor) != 1:
    sys.exit(f"anchor must occur exactly once in the oracle "
             f"(found {oracle.count(anchor)})")
spark_glob = os.path.join(outdir, qname, "*.parquet")

total_rows = 0
failed_shards = []
# k hash slices + one NULL shard (index k) so the tiling is complete
# selective rerun of specific shard indices (comma-separated); tiling
# cross-check is skipped in this mode since the union is partial
shard_only = (set(int(x) for x in os.environ["SHARD_ONLY"].split(","))
              if os.environ.get("SHARD_ONLY") else None)
for i in range(k + 1):
    if shard_only is not None and i not in shard_only:
        continue
    # qualify the COLUMN, never prefix the whole predicate: `__q.abs(c)`
    # parses as a schema-qualified function and fails (r8 finding)
    def pred(col):
        return (f"abs({col}) % {k} = {i}" if i < k else f"{col} IS NULL")
    if anchor:
        oracle_sql = oracle.replace(
            anchor, f"{anchor} AND {pred(oracle_col)}")
        oracle_q = f"SELECT * FROM ({oracle_sql}) __q"
    else:
        oracle_q = f"SELECT * FROM ({oracle}) __q WHERE {pred('__q.' + shard_col)}"
    # a shard at the memory boundary is retried with halved thread
    # counts — DuckDB's per-thread operator state shrinks the peak
    base_threads = int(os.environ.get("DUCKDB_THREADS", "0")) or None
    # dedupe while keeping the ladder strictly decreasing: with
    # DUCKDB_THREADS<=5 the naive [t, t//2 max 4, t//4 max 2] degenerates
    # to duplicate steps (r8 ADVICE)
    thread_ladder = [base_threads]
    for cand in (max(4, (base_threads or 32) // 2),
                 max(2, (base_threads or 32) // 4)):
        prev = thread_ladder[-1]
        if prev is None or cand < prev:
            thread_ladder.append(cand)
    err = None
    for ti, threads in enumerate(thread_ladder):
        con = None
        for attempt in range(10):
            try:
                con = connect(threads)
                break
            except Exception:
                gc.collect()
                time.sleep(6)
        if con is None:
            print("RECONNECT-FAILED: box memory never recovered; aborting")
            sys.exit(2)
        try:
            raw_s = con.execute(
                f"SELECT * FROM '{spark_glob}' WHERE {pred(shard_col)}").df()
            raw_o = con.execute(oracle_q).df()
            err = None
            break
        except Exception as e:
            err = e
            try:
                con.close()
            except Exception:
                pass
            gc.collect()
            # only a memory blowup shrinks with fewer threads; a
            # deterministic SQL error would just rerun a multi-GB shard
            # pointlessly (r8 ADVICE)
            is_mem = ("OutOfMemory" in type(e).__name__
                      or "memory" in str(e).lower())
            if not is_mem:
                break
            if ti < len(thread_ladder) - 1:
                print(f"shard {i}/{k}: retrying with threads="
                      f"{thread_ladder[ti + 1]} after "
                      f"{type(e).__name__}", flush=True)
    if err is not None:
        print(f"shard {i}/{k}: ORACLE-ERROR {type(err).__name__}: "
              f"{str(err)[:120]}", flush=True)
        failed_shards.append(i)
        continue
    s, o = canon(raw_s), canon(raw_o)
    if len(s) != len(o):
        print(f"shard {i}/{k}: ROWCOUNT {len(s)} vs {len(o)}", flush=True)
        failed_shards.append(i)
    else:
        bad = []
        for c in s.columns:
            neq = (s[c].values != o[c].values)
            if neq.any():
                j = int(neq.argmax())
                bad.append(f"{c} n={int(neq.sum())} e.g. "
                           f"{s[c].iloc[j]} != {o[c].iloc[j]}")
        if bad:
            print(f"shard {i}/{k}: STRICT-MISMATCH", flush=True)
            for b in bad[:6]:
                print(f"    {b}")
            failed_shards.append(i)
        else:
            print(f"shard {i}/{k}: strict-pass rows={len(s)}", flush=True)
            total_rows += len(s)
    try:
        con.close()
    except Exception:
        pass
    del raw_s, raw_o, s, o
    gc.collect()

if failed_shards:
    print(f"{qname}: SHARDED-FAIL shards={failed_shards}")
    sys.exit(1)

# the recorded verdict must carry its trust level: injection mode rests
# on the operator-supplied assumption that the anchored join column IS
# the output shard column under an inner join (r8 ADVICE)
mode_tag = (f"mode=injection anchor={anchor!r} oracle_col={oracle_col}"
            if anchor else "mode=pushdown")

if shard_only is not None:
    print(f"{qname}: partial rerun OK shards={sorted(shard_only)} "
          f"rows={total_rows} {mode_tag} "
          f"(no tiling check in SHARD_ONLY mode)")
    sys.exit(0)

# tiling completeness: every Spark dump row must have landed in exactly
# one shard — catches any key-domain case the predicates still miss
con = connect()
spark_total = con.execute(
    f"SELECT count(*) FROM '{spark_glob}'").fetchone()[0]
con.close()
if total_rows != spark_total:
    print(f"{qname}: SHARD-TILING-INCOMPLETE sum(shards)={total_rows} "
          f"!= dump={spark_total}")
    sys.exit(1)
print(f"{qname}: sharded-strict-pass rows={total_rows} shards={k}+null "
      f"{mode_tag}")

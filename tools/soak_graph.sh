#!/bin/bash
# Constrained-heap graph-family robustness gate (round-12 verdict task 6).
#
# The r12 cold-page-cache box state exposed two REAL bugs the warm cache
# had been hiding: edge-sized MEMORY_AND_DISK checkpoint blocks squatting
# in the unified manager's protected storage region OOM'd q163/q178 at
# the organic soaks under the default 8 GB bench heap (fixed by
# GraphOps.diskCheckpoint). This script promotes that accidental
# discovery into a repeatable check: run the graph family at the CAPPED
# heap on a soak dataset and fail loudly if any query dies.
#
# Usage: soak_graph.sh [sfdir] [outfile] [heap]
#   sfdir   soak dataset dir (default /tmp/soak_org50)
#   outfile bench JSON artifact (default /root/repo/BENCH_GRAPH8G.json)
#   heap    driver heap cap (default 8g — the bench default the OOMs hit)
#
# GRAFT_DROP_CACHES=1 additionally drops the OS page cache first (echo 3
# > /proc/sys/vm/drop_caches; needs root) to reproduce the cold-cache
# state exactly. OFF by default: the heap cap alone reproduces the r12
# failure mode, and cache drops perturb anything else running on the box.
set -e
SFDIR="${1:-/tmp/soak_org50}"
OUT="${2:-/root/repo/BENCH_GRAPH8G.json}"
HEAP="${3:-8g}"
if [ ! -d "$SFDIR" ]; then
  echo "soak dataset $SFDIR missing — generate it first:" >&2
  echo "  python3 tools/make_soak.py 50 $SFDIR --organic" >&2
  exit 2
fi
if [ "${GRAFT_DROP_CACHES:-0}" = "1" ]; then
  sync && echo 3 > /proc/sys/vm/drop_caches
  echo "[soak_graph] page cache dropped" >&2
fi
GRAPHQ="q90_dup_clusters,q147_pagerank,q163_triangle_count,q178_kcore"
GRAPHQ="$GRAPHQ,q190_bfs_levels,q201_bucketed_bfs,q209_bucketed_kcore"
GRAPHQ="$GRAPHQ,q210_bucketed_pagerank"
# reps=1: this is a COMPLETES-AT-ALL gate, not a timing benchmark.
# Bench catches per-query exceptions and logs "[bench] <q> failed" to
# stderr — a soft failure (e.g. AGGREGATE_OUT_OF_MEMORY) must fail this
# gate as loudly as a whole-JVM OOM (nonzero exit), so capture stderr
# and grep it.
ERRLOG=$(mktemp /tmp/soak_graph_err.XXXXXX)
set +e
SPARK_DRIVER_MEM="$HEAP" SPARK_GRAFT_BENCH_ONLY="$GRAPHQ" \
  "$(dirname "$0")/run_bench.sh" "$SFDIR" 1 "$OUT" 2> >(tee "$ERRLOG" >&2)
RC=$?
set -e
if [ $RC -ne 0 ]; then
  echo "[soak_graph] FAIL: bench JVM exited $RC at heap $HEAP" >&2
  exit $RC
fi
if grep -q "\[bench\].*failed" "$ERRLOG"; then
  echo "[soak_graph] FAIL: query-level failures at heap $HEAP:" >&2
  grep "\[bench\].*failed" "$ERRLOG" >&2
  exit 1
fi
rm -f "$ERRLOG"
echo "[soak_graph] PASS: all graph queries completed at heap $HEAP ($SFDIR)"

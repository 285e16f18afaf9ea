#!/usr/bin/env python3
"""Build the 10-20x soak dataset from sf0.1 (driver-side tooling only —
the engine never reads this script's output except through the normal
parquet readers).

REPLICATE mode (default): facts are replicated K times with primary
keys offset per copy so uniqueness invariants hold (orders.o_orderkey,
events.event_id, documents.doc_id, embeddings.vec_id);
lineitem.l_orderkey follows the orders offset so the order->lineitem
join keeps its shape. Foreign keys into dimensions
(custkey/suppkey/partkey) are left as-is: dimensions stay single-copy,
so per-dimension fan-in grows K-fold — exactly the join-pressure
profile a larger corpus would create. Document/embedding payloads
repeat verbatim, which seeds K-way exact/near-duplicate clusters for
the dedup family at scale.

ORGANIC mode (--organic [U], U defaults to K): for the GRAPH family.
Replicate mode keeps FKs fixed, so the distinct co-occurrence graphs
(part–part via shared orders, customer–supplier via order lines) are
the SAME graph with K-fold edge multiplicity — exponents measured on
it prove the linear dedup front-end, not the graph core (r6 SCALE.md
caveat). Organic mode also remaps the FK columns per copy across a
U-times-larger key universe:

    fk' = ((fk - 1 + i * stride) % (U * max_fk)) + 1

with stride ~= 1.43 * max_fk, so copy i is a structure-preserving
(degree-skew-preserving) shifted image of the base graph interleaved
into the larger universe. With U = K the graph grows ~K-fold in both
nodes and edges at constant degree (a corpus that got K-times bigger
at constant popularity); with U < K (the "dense" variant, e.g.
--organic 3 with K=10) the K images fold into a smaller universe so
per-node degree grows ~K/U — the axis that stresses the O(m^1.5)
triangle wedge bound. Dimension tables stay single-copy: the graph
queries (q90/q147/q163/q178/q190) never join dimensions; organic
output is a GRAPH soak, not a full-suite dataset (remapped FKs
dangle past the dimension tables by design).

MUTATED mode (--mutate P, percent): for the DEDUP family. Replicate
mode repeats document text verbatim, so every base doc becomes a
K-clique of exact duplicates — dedup scale numbers measured on it
reflect the pathological output-quadratic regime (K² pairs by
construction), not the near-dup density a real crawl presents (r8
verdict task 5). With --mutate P, copy 0 stays verbatim and each copy
i>0 rewrites every whitespace token independently with probability
P/100 (deterministic hash of (token, copy, doc_id) — no RNG state, so
reruns are bit-identical). A 3-token shingle survives with prob
(1-p)^3, so base↔copy jaccard ≈ (1-p)^3 / (2-(1-p)^3): p=5% → ~0.75
(pairs sit just ABOVE q114's 0.7 threshold — dense near-dup regime,
but the margin over the cutoff is thin);
p=20% → ~0.34 (almost all pairs drop out — mostly-unique corpus).
Only documents.text is rewritten; composes with --organic (documents
never join the remapped FK columns).

MUTATED-VECTOR mode (--mutate-vec M, percent): for the SIMILARITY/ANN
family (r9 verdict task 5). Replicate mode repeats embedding vectors
verbatim, so ANN scale numbers measure retrieval over exact-duplicate
clusters — every copy lands in its anchor's LSH bucket by construction.
With --mutate-vec M, copy 0 stays verbatim and each copy i>0 perturbs
every coordinate independently and deterministically:

    x' = x * (1 + delta),  delta = ((hash(vec_id|copy|coord) % 2001)
                                    - 1000) / 1000 * M/100

i.e. relative noise uniform in [-M%, +M%] per coordinate (no RNG
state — reruns are bit-identical). Cosine between a vector and its
perturbed copy concentrates near 1 - O((M/100)^2/2) with per-pair
spread, so copies are NEAR-duplicates whose LSH signatures flip
hyperplane bits with controlled probability — the borderline-bucket
regime a real embedding corpus presents, instead of the all-identical
one. Only embeddings.embedding is rewritten; composes with --organic
and --mutate (disjoint tables).

ZIPF mode (--zipf S [, --zipf-supp M]): for GRAPH SKEW (r13 verdict
task 3). Organic mode preserves the base data's near-uniform degree
profile; real 100 TB graphs are power-law, and a bucketed edge layout
sends a hub's entire edge list to ONE bucket. --zipf S (use with
--organic) redraws every order's o_custkey from a Zipf(S) rank
distribution over the U-scaled customer universe (deterministic:
inverse-CDF of hash(o_orderkey | copy) — rank ≈ ceil(u^(-1/(S-1))),
overflow past the universe wrapped uniformly), so customer degree
follows rank^(-S): at S=1.2 the top customer alone draws ~13% of all
order lines. CAVEAT — distinct-pair saturation: trade-graph edges are
DISTINCT (cust, supp) pairs, so a hub's degree is capped by the
supplier universe; --zipf-supp M widens the supplier remap universe
M-fold (beyond --organic's U) so hub degrees stay below the cap and
the bucket-skew effect is measured, not masked. Orders/lineitem only;
the graph queries never join dimensions.

Usage: python3 tools/make_soak.py [K] [outdir] [--organic [U]] [--mutate P] [--mutate-vec M] [--zipf S] [--zipf-supp M]
       (defaults: 10 /tmp/soak)
"""
import math
import sys

import duckdb

args = [a for a in sys.argv[1:]]
organic = False
U = None
mutate_p = None
mutate_vec = None
zipf_s = None
zipf_supp = 1
if "--zipf-supp" in args:
    j = args.index("--zipf-supp")
    zipf_supp = int(args[j + 1])
    args = args[:j] + args[j + 2:]
if "--zipf" in args:
    j = args.index("--zipf")
    zipf_s = float(args[j + 1])
    args = args[:j] + args[j + 2:]
if "--mutate-vec" in args:
    j = args.index("--mutate-vec")
    mutate_vec = int(args[j + 1])
    args = args[:j] + args[j + 2:]
if "--mutate" in args:
    j = args.index("--mutate")
    mutate_p = int(args[j + 1])
    args = args[:j] + args[j + 2:]
if "--organic" in args:
    j = args.index("--organic")
    organic = True
    rest = args[j + 1:]
    args = args[:j]
    if rest:
        U = int(rest[0])
K = int(args[0]) if len(args) > 0 else 10
OUT = args[1] if len(args) > 1 else "/tmp/soak"
if organic and U is None:
    U = K
SRC = "/root/testdata/sf0.1"

# table -> columns to offset by copy_index * (max_key + 1)
OFFSET_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# organic mode: table -> FK columns remapped across the U-scaled universe
REMAP_KEYS = {
    "orders": ["o_custkey"],
    "lineitem": ["l_partkey", "l_suppkey"],
}
SINGLE_COPY = ["region", "nation", "customer", "supplier", "part"]

con = duckdb.connect()
con.execute(f"CREATE OR REPLACE TABLE _ordmax AS SELECT MAX(o_orderkey) + 1 AS off FROM '{SRC}/orders.parquet'")
ord_off = con.sql("SELECT off FROM _ordmax").fetchone()[0]

import os
os.makedirs(OUT, exist_ok=True)

for t in SINGLE_COPY:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied 1x")

for t, keys in OFFSET_KEYS.items():
    # orders/lineitem share the orders offset so the FK survives every copy
    if t in ("orders", "lineitem"):
        off = ord_off
    else:
        off = con.sql(f"SELECT MAX({keys[0]}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
    remap = REMAP_KEYS.get(t, []) if organic else []
    remap_expr = {}
    for rk in remap:
        mx = con.sql(f"SELECT MAX({rk}) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        if zipf_s is not None and rk == "o_custkey":
            # Zipf(S) redraw (see ZIPF mode docstring): u uniform in
            # (0,1) from a deterministic hash, rank = ceil(u^(-1/(S-1)))
            # (the standard inverse-CDF approximation, P(rank=r) ∝
            # r^(-S)), overflow past the universe wrapped uniformly so
            # no artificial mega-hub collects the tail mass at the clamp
            n_univ = U * mx
            inv = -1.0 / (zipf_s - 1.0)
            u = (f"GREATEST((hash(concat(o_orderkey, '|z|', i.i)) "
                 f"% 1000000007) / 1000000007.0, 1e-12)")
            raw = f"CAST(LEAST(CEIL(POW({u}, {inv})), 1e18) AS BIGINT)"
            remap_expr[rk] = f"(({raw} - 2) % {n_univ}) + 1 AS {rk}"
            print(f"  {t}.{rk}: zipf s={zipf_s} universe={n_univ}")
            continue
        if rk == "l_suppkey" and zipf_supp > 1:
            # saturation dodge (see docstring): a copy-shifted remap
            # only ever POPULATES K×base distinct suppliers, capping hub
            # degree there no matter how wide the universe — so in zipf
            # mode the supplier side is drawn per ROW, uniformly over
            # the widened universe (deterministic hash; the supplier dim
            # dangles either way in organic graph soaks)
            mod = U * zipf_supp * mx
            remap_expr[rk] = (
                f"1 + CAST(hash(concat(l_orderkey, '|s|', l_linenumber, "
                f"'|', i.i)) % {mod} AS BIGINT) AS {rk}")
            print(f"  {t}.{rk}: per-row uniform over {mod} (zipf-supp "
                  f"x{zipf_supp})")
            continue
        stride = mx + (mx * 3) // 7 + 1  # ~1.43*max: interleave, don't tile
        # the shifted images of the K copies only stay distinct (the
        # documented ~K-fold node growth, constant degree) when stride
        # shares no factor with the modulus; gcd(stride, U*mx) = g > 1
        # would alias copies i and i + (U*mx//g)/... onto the same image
        # and silently fatten the degree profile (r7 ADVICE) — bump
        # stride to the next coprime value and report it
        while math.gcd(stride, U * mx) != 1:
            stride += 1
        remap_expr[rk] = (f"(({rk} - 1 + i.i * {stride}) % {U * mx}) + 1"
                          f" AS {rk}")
        print(f"  {t}.{rk}: stride={stride} mod={U * mx} "
              f"gcd={math.gcd(stride, U * mx)}")
    mut_expr = {}
    if mutate_p and t == "documents":
        # copy 0 verbatim (exact-dup anchors survive); copies i>0 rewrite
        # each token with prob P/100, keyed by (token, copy, doc_id) so
        # repeated tokens in a doc mutate together (word-replacement
        # model) and reruns are deterministic. The rewritten token gets a
        # copy-specific suffix, so two different copies never mutate a
        # token to the SAME replacement (no accidental re-convergence).
        mut_expr["text"] = (
            "CASE WHEN i.i = 0 THEN text ELSE array_to_string("
            "list_transform(string_split_regex(trim(text), '\\s+'), "
            f"w -> CASE WHEN hash(concat(w, '|', i.i, '|', doc_id)) % 100 "
            f"< {mutate_p} THEN concat(w, '~m', i.i) ELSE w END), ' ') "
            "END AS text")
        print(f"  documents.text: mutate p={mutate_p}% (copy 0 verbatim)")
    if mutate_vec and t == "embeddings":
        # copy 0 verbatim; copies i>0 get per-coordinate relative noise
        # in [-M%, +M%], keyed by (vec_id, copy, coordinate) — see the
        # MUTATED-VECTOR docstring. Cast back to FLOAT so the parquet
        # schema (FLOAT[]) is unchanged for both engines.
        f = mutate_vec / 100.0
        mut_expr["embedding"] = (
            "CASE WHEN i.i = 0 THEN embedding ELSE "
            "list_transform(embedding, (x, xi) -> CAST(x * (1 + "
            f"(CAST(hash(concat(vec_id, '|', i.i, '|', xi)) % 2001 AS BIGINT)"
            f" - 1000) / 1000.0 * {f}) AS FLOAT)) END AS embedding")
        print(f"  embeddings.embedding: mutate-vec M={mutate_vec}% "
              "(copy 0 verbatim)")
    select = ", ".join(
        [f"{k} + i.i * {off} AS {k}" for k in keys]
        + [remap_expr.get(c, mut_expr.get(c, f'"{c}"'))
           for c in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").df()["column_name"]
           if c not in keys])
    con.execute(
        f"COPY (SELECT {select} FROM '{SRC}/{t}.parquet', "
        f"(SELECT unnest(range(0, {K})) AS i) i ORDER BY i.i) "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    mode = f"organic U={U}" if organic and t in REMAP_KEYS else "replicated"
    print(t, f"{mode} {K}x ->", n)

#!/usr/bin/env python3
"""Build the 10-20x soak dataset from sf0.1 (driver-side tooling only —
the engine never reads this script's output except through the normal
parquet readers).

Facts are replicated K times with primary keys offset per copy so
uniqueness invariants hold (orders.o_orderkey, events.event_id,
documents.doc_id, embeddings.vec_id); lineitem.l_orderkey follows the
orders offset so the order->lineitem join keeps its shape. Foreign keys
into dimensions (custkey/suppkey/partkey) are left as-is: dimensions
stay single-copy, so per-dimension fan-in grows K-fold — exactly the
join-pressure profile a larger corpus would create. Document/embedding
payloads repeat verbatim, which seeds K-way exact/near-duplicate
clusters for the dedup family at scale.

Usage: python3 tools/make_soak.py [K] [outdir]   (defaults: 10 /tmp/soak)
"""
import sys

import duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
SRC = "/root/testdata/sf0.1"

# table -> columns to offset by copy_index * (max_key + 1)
OFFSET_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
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
    select = ", ".join(
        [f"{k} + i.i * {off} AS {k}" for k in keys]
        + [f'"{c}"' for c in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").df()["column_name"]
           if c not in keys])
    con.execute(
        f"COPY (SELECT {select} FROM '{SRC}/{t}.parquet', "
        f"(SELECT unnest(range(0, {K})) AS i) i ORDER BY i.i) "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(t, f"replicated {K}x ->", n)

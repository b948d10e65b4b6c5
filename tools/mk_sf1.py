#!/usr/bin/env python3
"""Regenerate the synthetic 10x scaling corpus (/tmp/sf1_synth) used by the
PERF.md sf0.1 -> sf1 smoke. Deterministic; see PERF.md "scaling smoke" for
the design rationale:

- documents: each sf0.1 doc replicated 10x; replica i > 0 suffixes every
  word with "r{i}" so replicas are SHINGLE-DISJOINT from their originals
  (dup/near-dup density matches sf0.1; exponents stay interpretable).
  n_chars is recomputed from the rewritten text.
- embeddings: 10x with a deterministic per-replica perturbation
  (scale by 1 + i/1e4) so no replica is an exact dup of its original.
- relational: replicated 10x with consistently-shifted key spaces
  (c_custkey +i*1e8, o_orderkey/l_orderkey +i*1e9, o_custkey follows
  c_custkey, s_suppkey/p_partkey +i*1e7, lineitem FKs follow), so join
  selectivity and per-key densities match sf0.1. region/nation stay as-is
  (dimensions).

Usage: python3 tools/mk_sf1.py [src_sf_dir] [out_dir]
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"

con = duckdb.connect()
con.sql("SET preserve_insertion_order=false")
import os
os.makedirs(OUT, exist_ok=True)

R = "(SELECT unnest(range(0, 10)) AS i)"

def copy(name, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

copy("documents", f"""
  SELECT doc_id + i * 10000000 AS doc_id,
    CASE WHEN i = 0 THEN text ELSE
      array_to_string(list_transform(string_split(text, ' '),
        w -> CASE WHEN w = '' THEN w ELSE w || 'r' || CAST(i AS VARCHAR) END),
        ' ') END AS text,
    lang, source,
    CAST(length(CASE WHEN i = 0 THEN text ELSE
      array_to_string(list_transform(string_split(text, ' '),
        w -> CASE WHEN w = '' THEN w ELSE w || 'r' || CAST(i AS VARCHAR) END),
        ' ') END) AS BIGINT) AS n_chars
  FROM '{SRC}/documents.parquet' CROSS JOIN {R}""")

copy("embeddings", f"""
  SELECT vec_id + i * 10000000 AS vec_id,
    list_transform(embedding,
      x -> CAST(x * (1 + i / 10000.0) AS FLOAT)) AS embedding,
    label
  FROM '{SRC}/embeddings.parquet' CROSS JOIN {R}""")

copy("events", f"""
  SELECT event_id + i * 1000000000 AS event_id, ts,
    user_id + i * 100000000 AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet' CROSS JOIN {R}""")

copy("customer", f"""
  SELECT c_custkey + i * 100000000 AS c_custkey, c_name,
    c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet' CROSS JOIN {R}""")

copy("orders", f"""
  SELECT o_orderkey + i * 1000000000 AS o_orderkey,
    o_custkey + i * 100000000 AS o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet' CROSS JOIN {R}""")

copy("lineitem", f"""
  SELECT l_orderkey + i * 1000000000 AS l_orderkey,
    l_partkey + i * 10000000 AS l_partkey,
    l_suppkey + i * 10000000 AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet' CROSS JOIN {R}""")

copy("supplier", f"""
  SELECT s_suppkey + i * 10000000 AS s_suppkey, s_name,
    s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet' CROSS JOIN {R}""")

copy("part", f"""
  SELECT p_partkey + i * 10000000 AS p_partkey, p_name, p_brand,
    p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet' CROSS JOIN {R}""")

for t in ("region", "nation"):
    copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

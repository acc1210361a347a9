#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (10x sf0.1) for the scaling probe.

The driver ships sf{0.001,0.01,0.1}; BENCH_SF1_r8.json needs one
order-of-magnitude-larger point. This replicates the four tables the
top-10 bench queries read as 10 key-shifted copies of sf0.1:

- every key column is offset by copy_index * (max_key + 1), so key
  cardinalities scale 10x (10x graph nodes, 10x orders/parts/docs)
  instead of 10x duplicate keys;
- document text gets a per-copy suffix token so the corpus is not 10
  exact clones of itself (near-dup operators still see the copies as
  near-identical - noted in the artifact's `explained` section);
- embedding vectors get a deterministic per-(id, copy, dim) hash
  perturbation (max |delta| = 5e-3 per component) so the 10 copies are
  distinct points rather than exact clones - small enough that cluster
  structure survives, large enough that no two copies quantize or rank
  identically by construction.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1]
"""
import sys
import os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
con.execute(f"CREATE VIEW li AS SELECT * FROM read_parquet('{src}/lineitem.parquet')")
con.execute(f"CREATE VIEW o AS SELECT * FROM read_parquet('{src}/orders.parquet')")
con.execute(f"CREATE VIEW p AS SELECT * FROM read_parquet('{src}/part.parquet')")
con.execute(f"CREATE VIEW doc AS SELECT * FROM read_parquet('{src}/documents.parquet')")
con.execute(f"CREATE VIEW emb AS SELECT * FROM read_parquet('{src}/embeddings.parquet')")
omax, pmax, smax, cmax, dmax, vmax = [con.execute(q).fetchone()[0] for q in [
    "SELECT MAX(l_orderkey)+1 FROM li", "SELECT MAX(l_partkey)+1 FROM li",
    "SELECT MAX(l_suppkey)+1 FROM li", "SELECT MAX(o_custkey)+1 FROM o",
    "SELECT MAX(doc_id)+1 FROM doc", "SELECT MAX(vec_id)+1 FROM emb"]]
rng = "range(10) r(i)"
con.execute(f"""COPY (SELECT li.* REPLACE (l_orderkey + i*{omax} AS l_orderkey,
  l_partkey + i*{pmax} AS l_partkey, l_suppkey + i*{smax} AS l_suppkey)
  FROM li, {rng}) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (SELECT o.* REPLACE (o_orderkey + i*{omax} AS o_orderkey,
  o_custkey + i*{cmax} AS o_custkey)
  FROM o, {rng}) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (SELECT p.* REPLACE (p_partkey + i*{pmax} AS p_partkey)
  FROM p, {rng}) TO '{dst}/part.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (SELECT doc.* REPLACE (doc_id + i*{dmax} AS doc_id,
  text || ' cp' || i AS text)
  FROM doc, {rng}) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
# Unnest -> perturb per (vec_id, copy, dim) -> re-list keeps the delta
# deterministic AND dimension-local (a lambda without the ordinal would
# shift every component of a copy by the same amount, i.e. slide the
# vector along the all-ones direction instead of jittering it).
con.execute(f"""COPY (
  WITH flat AS (
    SELECT emb.vec_id, emb.label, r.i,
           generate_subscripts(emb.embedding, 1) AS ord,
           unnest(emb.embedding) AS val
    FROM emb, {rng})
  SELECT vec_id + i*{vmax} AS vec_id,
         list(CAST(val + ((CAST(hash(vec_id*1000003 + i*131 + ord) % 1001
                           AS BIGINT)) - 500) * 1e-5 AS FLOAT) ORDER BY ord)
           AS embedding,
         label
  FROM flat GROUP BY vec_id + i*{vmax}, label
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
for t in ['lineitem', 'orders', 'part', 'documents', 'embeddings']:
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n, 'rows,', os.path.getsize(f'{dst}/{t}.parquet') // 2**20, 'MiB')

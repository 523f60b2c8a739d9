#!/usr/bin/env python3
"""Generate a bench-only sf10 dataset by 10x keyed replication of the
sf1 dir produced by gen_sf1.py (VERDICT r5 'Next round' #1: the
second measured decade, sf1 -> sf10).

Same replication contract as gen_sf1.py (its docstring is the spec):
join keys shift per copy; source/lang/event_type cardinalities stay
fixed (so block-keyed pair operators legitimately see 10x blocks);
document tokens are suffixed per copy so cross-copy docs share no
shingles (near-dup OUTPUT stays ~linear while candidate WORK grows);
values/timestamps verbatim. The suffix alphabet differs from sf1's
('d' vs 'c'), so sf10 copy suffixes never merge with sf1's.
"""
import os
import duckdb

SRC = "/root/repo/tmp/sf1"
DST = "/root/repo/tmp/sf10"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(name, sql):
    out = f"{DST}/{name}.parquet"
    con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{name}: {n} rows", flush=True)


def offset(t, col):
    return con.sql(f"SELECT max({col}) + 1 FROM {src(t)}").fetchone()[0]


for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

C = offset("customer", "c_custkey")
O = offset("orders", "o_orderkey")
P = offset("part", "p_partkey")
S = offset("supplier", "s_suppkey")
E = offset("events", "event_id")
U = offset("events", "user_id")
D = offset("documents", "doc_id")
V = offset("embeddings", "vec_id")

copies = f"(SELECT unnest(range({COPIES})) AS cp)"

write("customer", f"""
  SELECT c_custkey + cp * {C} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN {copies}""")

write("supplier", f"""
  SELECT s_suppkey + cp * {S} AS s_suppkey,
         s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN {copies}""")

write("part", f"""
  SELECT p_partkey + cp * {P} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')} CROSS JOIN {copies}""")

write("orders", f"""
  SELECT o_orderkey + cp * {O} AS o_orderkey,
         o_custkey + cp * {C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + cp * {O} AS l_orderkey,
         l_partkey + cp * {P} AS l_partkey,
         l_suppkey + cp * {S} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN {copies}""")

write("events", f"""
  SELECT event_id + cp * {E} AS event_id,
         ts,
         user_id + cp * {U} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN {copies}""")

write("documents", f"""
  SELECT doc_id + cp * {D} AS doc_id,
         CASE WHEN cp = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1d' || cp, 'g') END AS text,
         lang, source, n_chars
  FROM {src('documents')} CROSS JOIN {copies}""")

write("embeddings", f"""
  SELECT vec_id + cp * {V} AS vec_id, embedding, label
  FROM {src('embeddings')} CROSS JOIN {copies}""")

print("done:", DST)

#!/usr/bin/env python3
"""Generate the EMBEDDINGS-ONLY fifth decade (VERDICT r9 'Next round'
#1): sf1000emb = 10x keyed replication of tmp/sf100emb's embeddings
table (20M vectors), the dataset that gives the r9-registered semdedup
plans — cell-bucketed postings (semDedupBucketed) and the three-level
capped assign — a forced-protocol decade of their own, with the
quantPre alternative as the same-boot A/B sibling.

Embeddings-only by design, same posture as gen_sf100_emb.py: the target
queries (emb_semdedup / emb_kmeans_train / emb_kmeans_quality) and
their ScaleKnobs derivations read nothing else. documents.parquet is
copied VERBATIM from sf10 so the bench harness's control query
(td_token_stats) and warm-up keep working; it is NOT scaled and must
not be read as an sf1000 table.

Same replication contract as gen_sf10.py: vec_id shifts per copy,
embedding values verbatim (so cells/centroid geometry replicates and
candidate growth isolates the SCALE effect, not a distribution shift).
"""
import os
import shutil
import duckdb

SRC = "/root/repo/tmp/sf100emb"
SRC_DOCS = "/root/repo/tmp/sf10"
DST = "/root/repo/tmp/sf1000emb"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

V = con.sql(
    f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
).fetchone()[0]

out = f"{DST}/embeddings.parquet"
con.sql(f"""
  COPY (
    SELECT vec_id + cp * {V} AS vec_id, embedding, label
    FROM read_parquet('{SRC}/embeddings.parquet')
    CROSS JOIN (SELECT unnest(range({COPIES})) AS cp)
  ) TO '{out}' (FORMAT PARQUET)""")
n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
print(f"embeddings: {n} rows", flush=True)

shutil.copyfile(f"{SRC_DOCS}/documents.parquet", f"{DST}/documents.parquet")
print("documents: copied verbatim from sf10 (control/warm-up only)")
print("done:", DST)

#!/usr/bin/env python3
"""Generate the DOCUMENTS-ONLY sixth decade, TEXT family (VERDICT r10
'Next round' #8): sf1000 = 10x keyed replication of tmp/sf100's
documents table (50M docs), the dataset that gives the text family's
scale-path operators (td_exact_dedup, td_lsh_candidates,
td_line_dedup, td_pack, txt_gopher) a decade matching the embedding
family's sf1000emb, under the forced protocol.

Documents-only by design — the target queries read nothing else.
Same replication contract as gen_sf100.py (its docstring is the spec):
doc_id shifts per copy; source/lang cardinalities stay fixed
(block-keyed operators legitimately see 10x blocks); tokens are
suffixed per copy with alphabet 'f' (sf1 'c', sf10 'd', sf100 'e') so
cross-copy docs share no shingles and no suffix ever merges across
decades — this is the decade that must CONFIRM diversity holds on the
text side (the sf1000emb multiplicity finding came from verbatim
value replication; the token-suffix contract keeps text replication
diversity-preserving by construction, and the decade verifies the
operators see it that way).
"""
import os
import duckdb

SRC = "/root/repo/tmp/sf100"
DST = "/root/repo/tmp/sf1000"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

D = con.sql(
    f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
).fetchone()[0]

out = f"{DST}/documents.parquet"
con.sql(f"""
  COPY (
    SELECT doc_id + cp * {D} AS doc_id,
           CASE WHEN cp = 0 THEN text
                ELSE regexp_replace(text, '(\\S+)', '\\1f' || cp, 'g') END AS text,
           lang, source, n_chars
    FROM read_parquet('{SRC}/documents.parquet')
    CROSS JOIN (SELECT unnest(range({COPIES})) AS cp)
  ) TO '{out}' (FORMAT PARQUET)""")
n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
print(f"documents: {n} rows", flush=True)
print("done:", DST)

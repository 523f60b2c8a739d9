#!/usr/bin/env python3
"""Generate the DOCUMENTS-ONLY fourth text decade (VERDICT r8 'Next
round' #4): sf100 = 10x keyed replication of tmp/sf10's documents table
(~6M docs), the dataset that measures the text family's linear claims
(scan-speed gates, exact dedup, LSH candidates, line dedup, budget
sample, packing) across sf10 -> sf100.

Documents-only by design — the seven target queries (txt_gopher_full,
txt_c4, td_exact_dedup, td_lsh_candidates, td_line_dedup,
td_budget_sample, td_pack) read nothing else, and replicating lineitem
(~11 GB at sf100) would only slow the copy. The bench harness's warm-up
tolerates missing tables; the control query (td_token_stats) reads the
SCALED documents here, so cross-sf boot calibration comes from a
separate same-session sf10 control run instead (see
BENCH_SF100_TEXT.json's protocol note).

Same replication contract as gen_sf10.py: doc_id shifts per copy;
source/lang cardinalities stay fixed (block-keyed operators legitimately
see 10x blocks); tokens are suffixed per copy with alphabet 'e' (sf1
used 'c', sf10 used 'd') so cross-copy docs share no shingles and no
suffix ever merges across decades — near-dup OUTPUT stays ~linear while
candidate WORK grows, the honest separation.
"""
import os
import duckdb

SRC = "/root/repo/tmp/sf10"
DST = "/root/repo/tmp/sf100"
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
                ELSE regexp_replace(text, '(\\S+)', '\\1e' || cp, 'g') END AS text,
           lang, source, n_chars
    FROM read_parquet('{SRC}/documents.parquet')
    CROSS JOIN (SELECT unnest(range({COPIES})) AS cp)
  ) TO '{out}' (FORMAT PARQUET)""")
n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
print(f"documents: {n} rows", flush=True)
print("done:", DST)

#!/usr/bin/env python3
"""Diversity-preserving embedding bench corpus (r11).

The replicated decade chain (sf1 -> sf10 -> sf100emb -> sf1000emb)
copies embedding VALUES verbatim — by design, so cell geometry
replicates and candidate growth isolates scale effects. The r10
fifth-decade finding showed what that costs: the whole chain contains
only 2,000 DISTINCT vectors (sf0.1's), so any measurement that depends
on true neighbor structure degenerates — a vector's top-k is its own
exact copies, which route together deterministically, and probe recall
reads 1.0 at any staleness (measured: BENCH_IVF_DRIFT.json's
replicated_run). Dedup/candidate work scales fine under replication;
RECALL does not.

This generator is the embedding-side analog of the text decades' token
SUFFIX contract (which keeps replicated docs distinct): a deterministic
clustered corpus with every vector distinct — `centers` cluster
centers drawn from a seeded RNG on the unit sphere, each vector =
normalize(center + noise_scale * per-vector noise). vec_ids dense from
0. Default 200k x 64-dim with 2000 centers ~ one natural cluster per
derived k-means cell at the 125-occupancy knob.

Usage: gen_emb_diverse.py [n] [out_dir]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/embdiverse"
DIMS = 64
CENTERS = 2000
NOISE = 0.3

os.makedirs(DST, exist_ok=True)
rng = np.random.RandomState(42)
centers = rng.randn(CENTERS, DIMS)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)

vec_ids = np.arange(N, dtype=np.int64)
labels = (vec_ids % CENTERS).astype(np.int32)
# NOISE is the intended noise-vector NORM relative to the unit center:
# per-component sigma must be NOISE/sqrt(DIMS), else the noise norm is
# NOISE*sqrt(DIMS) and washes out the cluster structure entirely
# (measured: top-5 neighbors went noise-driven, recall@5 vs any cell
# scheme ~0.05)
vecs = centers[labels] + (NOISE / np.sqrt(DIMS)) * rng.randn(N, DIMS)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
vecs = vecs.astype(np.float32)

emb = pa.FixedSizeListArray.from_arrays(pa.array(vecs.reshape(-1)), DIMS)
emb = emb.cast(pa.list_(pa.float32()))
table = pa.table({"vec_id": pa.array(vec_ids),
                  "embedding": emb,
                  "label": pa.array(labels)})
pq.write_table(table, f"{DST}/embeddings.parquet")
print(f"embeddings: {N} rows, {CENTERS} centers, noise {NOISE} -> {DST}")

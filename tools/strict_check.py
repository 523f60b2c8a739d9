#!/usr/bin/env python3
"""Bit-exact replica of the driver's correctness hash.

Unlike check.py (1e-9 float tolerance), this compares dtype KIND and exact
values — the driver hashes values after sorting columns by name, so an
int64-vs-float64 or 1-ulp float difference that check.py tolerates WILL
fail the driver. Run check.py first for semantics, this for hash parity.

Usage: python3 tools/strict_check.py [--skip-verify] [query ...]
       (expects graft.Verify output in /tmp/graft_verify)
"""
import json
import os
import sys

import duckdb
import pandas as pd
import numpy as np

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
only = [a for a in sys.argv[1:] if not a.startswith("-")]


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # parquet DATE arrives as datetime.date objects; the driver
            # normalizes these to datetime64 (round 1 proved date columns
            # hash-match), so do the same before falling back to str.
            import datetime
            sample = next((v for v in df[c] if v is not None), None)
            if isinstance(sample, datetime.date) and not isinstance(sample, datetime.datetime):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def kind(dtype):
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return "object"


def compare(name, a, b):
    """a=spark, b=oracle; both normalized. Returns list of problem strings."""
    probs = []
    if list(a.columns) != list(b.columns):
        return [f"columns: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"rows: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        ka, kb = kind(a[c].dtype), kind(b[c].dtype)
        if ka != kb:
            probs.append(f"{c}: dtype kind spark={ka}({a[c].dtype}) oracle={kb}({b[c].dtype})")
            continue
        va, vb = a[c].values, b[c].values
        if ka == "float":
            na, nb = np.isnan(va), np.isnan(vb)
            if not (na == nb).all():
                probs.append(f"{c}: NaN placement differs")
                continue
            m = ~na
            neq = va[m] != vb[m]
            if neq.any():
                i = np.argmax(neq)
                diffs = np.abs(va[m][neq] - vb[m][neq])
                probs.append(
                    f"{c}: {neq.sum()} float cells differ exactly "
                    f"(max abs diff {diffs.max():.3e}, e.g. {va[m][neq][0]!r} vs {vb[m][neq][0]!r})")
        else:
            sa = pd.Series(va).astype(object).where(pd.notnull(va), None)
            sb = pd.Series(vb).astype(object).where(pd.notnull(vb), None)
            neq = [i for i, (x, y) in enumerate(zip(sa, sb)) if x != y and not (x is None and y is None)]
            if neq:
                i = neq[0]
                probs.append(f"{c}: {len(neq)} cells differ, e.g. row {i}: {sa[i]!r} vs {sb[i]!r}")
    return probs


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.load(open(os.path.join(OUT_DIR, "oracle_sql.json")))
    names = only or sorted(oracle_sql)
    n_bad = 0
    for name in names:
        if name not in oracle_sql:
            print(f"{name}: NO ORACLE (rows-only check)")
            continue
        try:
            spark = pd.read_parquet(os.path.join(OUT_DIR, name))
        except Exception as e:
            print(f"{name}: SPARK READ FAILED: {e}")
            n_bad += 1
            continue
        try:
            oracle = con.execute(oracle_sql[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE FAILED: {e}")
            n_bad += 1
            continue
        probs = compare(name, normalize(spark), normalize(oracle))
        if probs:
            n_bad += 1
            print(f"{name}: MISMATCH")
            for p in probs:
                print(f"    {p}")
        else:
            print(f"{name}: exact")
    print(f"\n{len(names) - n_bad}/{len(names)} exact")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

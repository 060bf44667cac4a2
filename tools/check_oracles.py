#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare results (schema-insensitive: columns sorted by name,
rows sorted, values compared exactly after normalization).

Intended gate scale is sf0.01 (~3-4 min total). At sf0.1 the sketch-family
oracles (simhash closure CTEs, rolling-fingerprint window folds) take tens
of minutes in DuckDB's lambda evaluator even though the Spark side runs in
seconds — the oracle SQL mirrors the algorithms for verifiability, not
speed."""
import json, math, os, subprocess, sys, tempfile, glob
import duckdb
import numpy as np
import pandas as pd

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stable row sort over all columns (stringified for mixed types)
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS: spark={len(spark_df)} duck={len(duck_df)}"
    # Driver-faithful strictness the value compare below would mask:
    # (a) int-vs-float dtype drift (e.g. DuckDB HUGEINT sums → float64)
    #     hash-mismatches on the driver even when values are equal;
    # (b) array-valued columns crash the driver's lexsort outright.
    for c in spark_df.columns:
        sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
        if {sk, dk} <= {'i', 'u', 'f'} and ('f' in (sk, dk)) and sk != dk:
            return f"DTYPE col={c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype} (driver hash would differ)"
        for df, side in ((spark_df, 'spark'), (duck_df, 'duck')):
            if df[c].dtype.kind == 'O' and len(df):
                v = df[c].dropna()
                if len(v) and isinstance(v.iloc[0], (list, tuple, np.ndarray)):
                    return f"ARRAY col={c} ({side} side): driver cannot sort/hash array columns"
    a, b = normalize(spark_df), normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            av = av.astype(float); bv = bv.astype(float)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            bad = ~((av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna()))
        if bad.any():
            i = bad.idxmax()
            return f"VALUE col={c} row={i}: spark={a[c][i]!r} duck={b[c][i]!r} ({int(bad.sum())} diffs)"
    return None

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="verify")
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if not os.path.exists(os.path.join(out_dir, "oracle_sql.json")):
        filt = f" {sys.argv[3]}" if only else ""
        print(f"running graft.Verify {sf_dir} {out_dir}{filt} ...", flush=True)
        r = subprocess.run(["sbt", f"runMain graft.Verify {sf_dir} {out_dir}{filt}"],
                           cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line: print(line)
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    n_ok = n_bad = 0
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"  {name}: MISSING spark output"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(pq + "/*.parquet"))],
                                 ignore_index=True) if glob.glob(pq + "/*.parquet") else pd.DataFrame()
            duck_df = con.execute(oracles[name]).df()
            err = compare(name, spark_df, duck_df)
        except Exception as e:
            err = f"ERROR: {type(e).__name__}: {e}"
        if err: print(f"  {name}: FAIL {err}"); n_bad += 1
        else: print(f"  {name}: OK ({len(spark_df)} rows)"); n_ok += 1
        results[name] = err
    print(f"== {n_ok} ok, {n_bad} fail (out={out_dir})")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

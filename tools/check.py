#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<query>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle against DuckDB views over the
<sfDir> parquet tables, and compares values column-by-column (columns sorted
by name, exact equality; floats reported with max abs diff).

Driver-side tooling only — never imported by the Scala engine.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows spark={len(a)} duck={len(b)}"
    msgs = []
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            # The driver's hash is over rendered values, so an int64 column
            # on one side and a float64 on the other ("800" vs "800.0") is a
            # driver-visible failure even when every value is numerically
            # equal — e.g. an uncast DuckDB HUGEINT aggregate (the r15 q187f
            # escape). A float64 that only exists because pandas promoted a
            # NULLABLE integer column is fine when BOTH sides promoted the
            # same way (both kind "f"), which the branch below handles.
            if (av.dtype.kind == "f") != (bv.dtype.kind == "f"):
                msgs.append(
                    f"{c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype}"
                    " (int-vs-float renders differently in the driver hash)")
            elif av.dtype.kind == "f" or bv.dtype.kind == "f":
                aa = av.astype(float)
                bb = bv.astype(float)
                diff = (aa - bb).abs()
                bad = ~((aa == bb) | (aa.isna() & bb.isna()))
                if bad.any():
                    msgs.append(f"{c}: {int(bad.sum())} float diffs max={diff[bad].max():.3e}")
            else:
                eq = av.astype(str).eq(bv.astype(str)) | (av.isna() & bv.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    msgs.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: spark={av[i]!r} duck={bv[i]!r}")
        except Exception as e:  # noqa: BLE001
            msgs.append(f"{c}: compare error {e}")
    return "OK" if not msgs else "FAIL " + "; ".join(msgs)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # DuckDB defaults to 1 thread on some builds; the heavy replay oracles
    # (BPE training CTEs, banded joins) are embarrassingly parallel and a
    # single-threaded pass once took ~25 min — use the machine.
    con.execute(f"PRAGMA threads={os.cpu_count() or 4}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"{name}: FAIL no spark output")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL oracle error: {e}")
            n_fail += 1
            continue
        r = compare(name, spark_df, duck_df)
        print(f"{name}: {r}")
        if r != "OK":
            n_fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        qn = d.rstrip("/").split("/")[-1]
        if qn not in oracle:
            df = load_spark(outdir, qn)
            n = 0 if df is None else len(df)
            status = "OK" if n > 0 else "FAIL empty"
            print(f"{qn}: rows-only n={n} {status}")
            if n == 0:
                n_fail += 1
    print(f"== {n_fail} failures ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the same sf parquet tables, sorts
columns by name and rows by all columns, and compares values exactly.
"""
import json, math, sys, glob, os
from decimal import Decimal
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def typekind(s: pd.Series) -> str:
    """Numeric type kind for type-strict compare (the driver's hash is
    serialization-sensitive: a DuckDB HUGEINT/DECIMAL column hash-diverges
    from Spark int64 even when every value matches — the q175 class).
    Object columns are inspected: Decimal values -> 'dec', ints -> 'i'."""
    k = s.dtype.kind
    if k != 'O':
        return k
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, Decimal):
            return 'dec'
        if isinstance(v, int) and not isinstance(v, bool):
            return 'i'
        return 'O'
    return 'O'


NUMERIC_KINDS = {'i', 'u', 'f', 'dec'}


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = sorted(d for d in os.listdir(out)
                  if os.path.isdir(os.path.join(out, d)))
    for name in dirs:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"NOOUT {name}"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"SKIP  {name} (rows-only: {len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORAERR {name}: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: cols spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1; continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            ka, kb = typekind(av), typekind(bv)
            if ka != kb and (ka in NUMERIC_KINDS or kb in NUMERIC_KINDS):
                bad.append(f"{c}: TYPE spark={ka}/{av.dtype} "
                           f"duck={kb}/{bv.dtype} (driver hash diverges "
                           f"even on equal values)")
                continue
            try:
                eq = (av.astype(object).where(pd.notna(av), None) ==
                      bv.astype(object).where(pd.notna(bv), None)) | \
                     (pd.isna(av) & pd.isna(bv))
            except Exception:
                eq = pd.Series([False] * len(av))
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}[{i}]: {av.iloc[i]!r} != {bv.iloc[i]!r}")
        if bad:
            print(f"FAIL  {name}: {'; '.join(bad[:3])}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(dirs) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

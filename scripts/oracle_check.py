#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: for each Spark result
parquet in OUTDIR, run the corresponding oracle SQL in DuckDB over the fixture
tables and compare (rows sorted, columns sorted by name).

Usage: oracle_check.py SFDIR OUTDIR [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              type(v).__name__ == "ndarray" else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(oracle)}")
        sys.exit(2)
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM ({sql})").df())
            want = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns oracle={list(got.columns)} spark={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows oracle={len(got)} spark={len(want)}")
            n_bad += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                diffs.append(f"col {c} dtypes=({a.dtype},{b.dtype}) "
                             f"first diff row {idx}: oracle={a[idx]!r} spark={b[idx]!r} "
                             f"({int((~eq).sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            n_bad += 1
        else:
            # dtype check (weaker than driver's schema hash, but catches int32/int64)
            dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(want[c].dtype)]
            note = f"  [dtype note: {dt}]" if dt else ""
            print(f"ok   {name} ({len(got)} rows){note}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture parquet tables, load the Spark parquet dump from
Verify, sort columns by name + rows by value, and compare.

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>
"""
import sys, json, math, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(
                df[c].dropna().iloc[0] if len(df[c].dropna()) else None,
                datetime.date):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    # the driver's gate hashes VALUE BYTES, so a dtype skew (e.g. DuckDB
    # SUM->HUGEINT->float64 vs Spark int64) fails there even when values
    # compare equal here — treat dtype mismatch as a failure locally too
    for c in a.columns:
        da, db = str(a[c].dtype), str(b[c].dtype)
        if da != db:
            return f"DTYPE col={c}: spark={da} oracle={db}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if pd.isna(x) and pd.isna(y):
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    return f"VAL col={c} row={i}: spark={x!r} oracle={y!r} diff={x-y!r}"
            elif x != y:
                return f"VAL col={c} row={i}: spark={x!r} oracle={y!r}"
    return None

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; locally generated scale fixtures
        # (graft.DataGen) are multi-file directories -- glob those
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            sdf = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            continue
        err = cmp(norm(sdf), norm(odf))
        if err:
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(sdf)} rows)")
    print(f"{n_ok}/{len(oracle)} queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

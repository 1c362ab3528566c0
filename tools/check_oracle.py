#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tooling only;
not part of the engine). Usage:
    python3 tools/check_oracle.py <verify_outdir> <sf_dir>
Reads each <outdir>/<name> parquet dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw
tables, sorts columns by name, and compares values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == "int32":
            df[c] = df[c].astype("int64")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
    return df


def main() -> int:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    failed = []
    for name in sorted(oracle):
        try:
            exp = normalize(con.execute(oracle[name]).fetchdf())
            got = normalize(con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {e}")
            failed.append(name)
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL  {name}: schema exp={list(exp.columns)} got={list(got.columns)}")
            failed.append(name)
        elif exp.shape != got.shape:
            print(f"FAIL  {name}: shape exp={exp.shape} got={got.shape}")
            failed.append(name)
        elif not exp.equals(got):
            diff = (exp != got) & ~(exp.isna() & got.isna())
            cols = [c for c in exp.columns if diff[c].any()]
            print(f"FAIL  {name}: values differ in {cols}")
            for c in cols[:2]:
                i = diff[c].idxmax()
                print(f"      row {i} col {c}: exp={exp[c][i]!r} got={got[c][i]!r}")
            failed.append(name)
        else:
            print(f"ok    {name}  ({exp.shape[0]} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

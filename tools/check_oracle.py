#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load graft.Verify's
parquet dumps, run each oracle SQL in DuckDB over the same testdata tables,
and compare row counts, schemas (column names) and value hashes after
sorting columns by name and rows by all values.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout
(dev tool only — the engine itself has no Python dependency)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for hashing: strict str() like the driver — a float
    # "1.0" must NOT match an int "1" (judge-verified driver behavior), and
    # doubles must be bit-identical (shortest-repr str of the exact value)
    def cell(v):
        if isinstance(v, float):
            return str(float(v))
        if isinstance(v, (list, tuple)):
            return str(list(v))
        return str(v)
    s = df.apply(lambda col: col.map(cell))
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(outdir, "q*"))):
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"{name}: NO OUTPUT"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"{name}: rows-only ({len(spark_df)} rows)"); n_rowsonly += 1
            if len(spark_df) == 0:
                print(f"  !! EMPTY result"); n_fail += 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
            n_fail += 1; continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"{name}: VALUE MISMATCH in {diff.sum()}/{len(a)} rows")
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
            n_fail += 1; continue
        print(f"{name}: OK ({len(a)} rows)")
        n_pass += 1
    print(f"\npass={n_pass} rows-only={n_rowsonly} fail={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

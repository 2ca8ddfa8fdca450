#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each
oracle_sql.json entry in DuckDB over the sf parquet tables, load the
matching Spark output parquet, sort columns by name, and compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = canon(con.execute(sql).fetchdf())
            mine = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_bad += 1
            continue
        if list(oracle.columns) != list(mine.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs oracle {list(oracle.columns)}")
            n_bad += 1
            continue
        if len(oracle) != len(mine):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(oracle)}")
            n_bad += 1
            continue
        # exact-order compare on stringified cells (hash-match proxy)
        a = oracle.astype(str)
        b = mine.astype(str)
        if a.equals(b):
            print(f"ok   {name} ({len(mine)} rows)")
            n_ok += 1
        else:
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print(f"  mine:   {mine.iloc[i].to_dict()}")
                print(f"  oracle: {oracle.iloc[i].to_dict()}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

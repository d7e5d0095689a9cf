#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL from outDir/oracle_sql.json against the sf
parquet tables and compares to the Spark results Verify dumped as
outDir/<name>.parquet: columns sorted by name, rows sorted, values
hashed. Usage: python3 tools/check.py <sfDir> <outDir>
(Dev tooling only — not part of the Scala library.)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting/hashing across engines
    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"{'PASS' if ok else 'FAIL'} (rows-only, n={len(spark_df)}) {name}")
            n_rowsonly += 1
            if not ok: n_fail += 1
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            print(f"FAIL {name}: value mismatch at row {i}:\n  spark : {a.loc[i].tolist()}\n  oracle: {b.loc[i].tolist()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    missing = set(oracle) - set(names)
    for m in sorted(missing):
        print(f"FAIL {m}: no spark output")
        n_fail += 1
    print(f"\n{n_pass} oracle-pass, {n_rowsonly} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query dir in
outDir, run the matching oracle_sql.json entry in DuckDB over the sfDir
parquet tables, sort columns by name + rows, and diff against the Spark
parquet dump. Usage: check_oracle.py <sfDir> <outDir> [query ...]"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    # normalize dtypes before the string compare: int32/int64 ->
    # int64, float32/decimal -> rounded float64, so engine-side dtype
    # skew can't fake a VALUES diff
    for c in df.columns:
        import pandas.api.types as pt
        if pt.is_bool_dtype(df[c]):
            pass
        elif pt.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pt.is_numeric_dtype(df[c]) or str(df[c].dtype).startswith("decimal"):
            df[c] = df[c].astype("float64").round(6)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], float):
            df[c] = df[c].astype("float64").round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            want = norm(con.execute(sql).df())
        except Exception as ex:
            print(f"[SQLERR] {name}: {ex}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[SCHEMA] {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} duckdb={len(want)}")
            n_bad += 1
            continue
        # value compare on string repr (mirrors a hash compare)
        g = got.astype(str).values
        w = want.astype(str).values
        bad = (g != w)
        if bad.any():
            i, j = [x[0] for x in bad.nonzero()]
            print(f"[VALUES] {name}: first diff row {i} col {got.columns[j]}: "
                  f"spark={g[i][j]} duckdb={w[i][j]} ({bad.sum()} cells differ)")
            n_bad += 1
        else:
            print(f"[OK] {name}: {len(got)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

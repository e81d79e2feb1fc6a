#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

For each <name> dir under verifyOutDir: load the Spark parquet result,
run the corresponding oracle SQL from oracle_sql.json in DuckDB (with
each testdata parquet registered as a view), sort columns by name, sort
rows, and compare values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]") if "ns" in str(df[c].dtype) else df[c]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_norac = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            n_norac += 1
            print(f"  [rows-only] {name}: rows={len(got)}")
            continue
        try:
            # dtype-strict gate: the driver hashes typed values, so an
            # uncast DuckDB sum() (BIGINT -> HUGEINT/int128) passes a
            # value-only compare locally but fails the driver's hash.
            desc = con.execute(f"DESCRIBE ({oracle[name]})").df()
            huge = [f"{r['column_name']}:{r['column_type']}"
                    for _, r in desc.iterrows()
                    if "HUGEINT" in str(r["column_type"]).upper()]
            if huge:
                n_fail += 1
                print(f"  [FAIL-dtype] {name}: oracle yields {huge} — "
                      f"CAST the column(s) to BIGINT in the oracle SQL")
                continue
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-oracle-sql] {name}: {e}")
            continue
        g, e = canon(got.copy()), canon(exp.copy())
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"  [FAIL-schema] {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(g)} oracle={len(e)}")
            continue
        bad = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            try:
                same = (gc.isna() & ec.isna()) | (gc == ec)
                # exact compare; report max abs diff for floats on mismatch
                if not same.all():
                    if gc.dtype.kind == "f":
                        diff = (gc - ec).abs().max()
                        bad.append(f"{c} (maxdiff={diff!r}, n={int((~same).sum())})")
                    else:
                        bad.append(f"{c} (n={int((~same).sum())}, "
                                   f"g={gc[~same].iloc[0]!r} e={ec[~same].iloc[0]!r})")
            except Exception as ex:
                bad.append(f"{c} (cmp-error {ex}; gdt={gc.dtype} edt={ec.dtype})")
        if bad:
            n_fail += 1
            print(f"  [FAIL-values] {name}: {'; '.join(bad)}")
        else:
            n_pass += 1
            print(f"  [ok] {name}: rows={len(g)}")
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_norac}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

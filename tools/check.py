#!/usr/bin/env python3
"""Dev-only self-check: mimic the driver's DuckDB-oracle comparison.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
the sf parquet tables registered as views, loads the Spark result
parquet, canonicalizes both (columns sorted by name, rows sorted), and
reports match/mismatch. This is developer tooling only — the shipped
Scala library has no Python dependency.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result")
            n_bad += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"LOADERR  {name}: {e}")
            n_bad += 1
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duckdb={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: spark={len(got)} duckdb={len(exp)}")
            n_bad += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            # Driver-exact: the driver hashes canonicalized values, so ANY
            # dtype-kind drift (int64-vs-float64 from DuckDB HUGEINT
            # promotion, int-vs-object/string, bool-vs-int, ...) fails on
            # dtype ALONE even when stringified values agree. Compare
            # dtype KINDS generally (ADVICE r16): integer widths are
            # allowed to differ (i<->u and i32<->i64 canonicalize the
            # same), everything else must match kind-for-kind. No float
            # tolerance: the engine's FP discipline guarantees
            # bit-identical doubles.
            ka, kb = a.dtype.kind, b.dtype.kind
            int_kinds = frozenset("iu")
            kinds_match = (ka == kb or
                           (ka in int_kinds and kb in int_kinds))
            if not kinds_match:
                mismatch = (f"col {c} DTYPE: spark={a.dtype} "
                            f"duckdb={b.dtype} (driver hash fails on this)")
                break
            try:
                ok = (a.astype(str) == b.astype(str)).all()
            except Exception as e:
                ok = False
            if not ok:
                bad = (a.astype(str) != b.astype(str))
                i = bad[bad].index[0] if bad.any() else 0
                mismatch = f"col {c} row {i}: spark={a.iloc[i]!r} duckdb={b.iloc[i]!r}"
                break
        if mismatch:
            print(f"VALUES   {name}: {mismatch}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local pre-verification of SparkEntry oracles (mimics the driver's
DuckDB compare). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                            ignore_index=True)
            want = con.sql(oracle[name]).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1; continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
            # exact string-repr compare (strictest plausible driver check)
            mism = []
            for c in g.columns:
                a, b = g[c].astype(str).values, w[c].astype(str).values
                bad = [(i, a[i], b[i]) for i in range(len(a)) if a[i] != b[i]]
                if bad:
                    mism.append((c, bad[:3], len(bad)))
            if mism:
                n_fail += 1
                print(f"FAIL {name}: value mismatches")
                for c, ex, n in mism:
                    print(f"  col {c}: {n} diffs, e.g. {ex}")
            else:
                n_pass += 1
                print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

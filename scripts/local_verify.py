#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the fixture parquet and compare to the Verify parquet dumps.
Columns are sorted by name (like the driver); rows compared in output order.
Usage: local_verify.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # normalize timestamps to ns for comparison
        for c in exp.columns:
            if "datetime" in str(exp[c].dtype) or "datetime" in str(got[c].dtype):
                exp[c] = pd.to_datetime(exp[c])
                got[c] = pd.to_datetime(got[c])
            if isinstance(exp[c].dtype, object.__class__):
                pass
        bad = None
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            try:
                eq = (ev.astype(object).where(ev.notna(), None) ==
                      gv.astype(object).where(gv.notna(), None)) | (ev.isna() & gv.isna())
            except Exception:
                eq = ev.astype(str) == gv.astype(str)
            if not eq.all():
                i = int(eq.idxmin())
                bad = (c, i, ev.iloc[i], gv.iloc[i])
                break
        if bad:
            c, i, e, g = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={e!r} spark={g!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} oracle queries pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

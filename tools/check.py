#!/usr/bin/env python3
"""Local pre-verification mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Dev tooling only (duckdb/pyarrow are driver-side libs, not part of the
Scala library). Compares each <name>/ parquet dump against the oracle
SQL in oracle_sql.json: schema (column names+types after sorting columns
by name) and values (rows sorted).
"""
import json
import os
import sys

import duckdb


def connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    # buffer-manager headroom: one long-lived connection accumulating
    # pages across 80+ heavy model-replay queries has OOM'd under the
    # default (80%-of-RAM) limit even with host memory free
    con.execute("SET memory_limit='24GB'")
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir: str, out_dir: str) -> int:
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # fresh connection per query: no cross-query buffer growth, and
        # one pathological oracle can't sink the rest of the sweep
        con = connect(sf_dir)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')").fetch_arrow_table()
        except Exception as exc:  # noqa - a failed query leaves an empty dump dir
            print(f"[FAIL] {name}: unreadable dump {str(exc)[:120]}")
            n_bad += 1
            con.close()
            continue
        if name not in oracle:
            print(f"[rows-only] {name}: rows={got.num_rows} "
                  + ("OK" if got.num_rows > 0 else "EMPTY!"))
            if got.num_rows == 0:
                n_bad += 1
            con.close()
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as exc:  # noqa
            print(f"[FAIL] {name}: oracle error {str(exc)[:120]}")
            n_bad += 1
            con.close()
            continue
        ok = True
        g_cols = sorted(got.column_names)
        e_cols = sorted(exp.column_names)
        if g_cols != e_cols:
            print(f"[FAIL] {name}: columns differ got={g_cols} exp={e_cols}")
            ok = False
        else:
            g_schema = [(c, str(got.schema.field(c).type)) for c in g_cols]
            e_schema = [(c, str(exp.schema.field(c).type)) for c in e_cols]
            if g_schema != e_schema:
                print(f"[warn] {name}: types differ {g_schema} vs {e_schema}")
            gdf = got.to_pandas()[g_cols].sort_values(g_cols).reset_index(drop=True)
            edf = exp.to_pandas()[e_cols].sort_values(e_cols).reset_index(drop=True)
            if len(gdf) != len(edf):
                print(f"[FAIL] {name}: row counts {len(gdf)} vs {len(edf)}")
                ok = False
            else:
                for c in g_cols:
                    gv, ev = gdf[c], edf[c]
                    try:
                        eq = (gv.isna() & ev.isna()) | (gv == ev)
                        same = eq.all()
                    except Exception as exc:  # noqa
                        print(f"[FAIL] {name}.{c}: compare error {exc}")
                        ok = False
                        continue
                    if not same:
                        diff = ~eq
                        idx = diff[diff].index[:3]
                        print(f"[FAIL] {name}.{c}: {int(diff.sum())} diffs, "
                              f"e.g. got={list(gv[idx])} exp={list(ev[idx])}")
                        ok = False
        if ok:
            print(f"[ok]   {name}: rows={got.num_rows}")
        else:
            n_bad += 1
        con.close()
    print(f"=== {n_bad} failing")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

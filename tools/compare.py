#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: compare.py <sfDir> <verifyOutDir>

Registers the sfDir parquet tables as DuckDB views (raw, same as the
driver), runs each SQL in oracle_sql.json, loads the corresponding Spark
parquet result, sorts columns by name + rows by all columns, and compares
values exactly. Prints PASS/FAIL per query.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        # driver's hash is dtype-KIND-sensitive (int vs float vs object —
        # r1 showed q16 etc. fail on int64 vs float64) but width-tolerant
        # (q20's int32 vs int64 passed). Compare kind only.
        dt_bad = [(c, str(want[c].dtype), str(got[c].dtype))
                  for c in want.columns if want[c].dtype.kind != got[c].dtype.kind]
        if dt_bad:
            c, w, g = dt_bad[0]
            print(f"FAIL {name}: dtype col={c} want={w} got={g}")
            n_fail += 1
            continue
        bad = None
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} want={a!r} got={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

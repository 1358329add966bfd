#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL in DuckDB over the testdata parquet tables and
compares against the parquet written by `graft.Verify` — columns sorted
by name, exact value equality. Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>

This is a dev tool only; the engine itself has no Python dependency.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def connect(sf_dir: str):
    con = duckdb.connect()
    # allow out-of-core: the heavy recursive-CTE oracles at sf0.1 can
    # otherwise tip a long-lived session over (observed: q117 OOM'ing
    # ONLY when run after 100+ earlier queries in one connection)
    con.execute("PRAGMA temp_directory='/tmp/graft_duck_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main(sf_dir: str, out_dir: str) -> int:
    con = connect(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).df()
        except Exception as e:
            # a memory failure is SESSION state, not a verdict: retry
            # once on a fresh connection before recording a failure
            try:
                con.close()
                con = connect(sf_dir)
                want = con.execute(sql).df()
            except Exception:
                print(f"FAIL {name}: duckdb error: {e}")
                failures += 1
                continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  duck={list(want.columns)}\n  spark={list(got.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ duck={len(want)} spark={len(got)}")
            failures += 1
            continue
        # exact compare, cell by cell, after normalizing to strings the
        # same way for both frames (mirrors a value-hash compare)
        mismatch = None
        for c in want.columns:
            a, b = want[c], got[c]
            try:
                same = (a.astype(str).values == b.astype(str).values)
            except Exception:
                same = (a.values == b.values)
            if not same.all():
                i = int((~same).argmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i])
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: value mismatch col={c} row={i} duck={av!r} spark={bv!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(want)} rows, {len(want.columns)} cols)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

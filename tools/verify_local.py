#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (t2).

Usage: python3 tools/verify_local.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB over the parquet tables in <sfDir>, reads the Spark result parquet from
<outDir>/<name>/, sorts columns by name, and compares shape + values. Reports
both order-sensitive and row-sorted equality so we catch either driver
behavior. Exact match is the bar; a float-tolerance diff is reported
separately to distinguish "FP jitter" from "wrong".
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        # The driver hashes raw value bytes, where -0.0 != 0.0 — a plain
        # float== comparison hid exactly that mismatch in round 12
        # (DuckDB's binary round yields -0.0 where Spark's BigDecimal
        # round yields +0.0). Be as strict as the driver.
        if fa == 0.0 and fb == 0.0:
            return np.signbit(fa) == np.signbit(fb)
        return fa == fb
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = np.asarray(a), np.asarray(b)
        return a.shape == b.shape and bool(np.all(a == b))
    return a == b


def frame_diff(got: pd.DataFrame, exp: pd.DataFrame, label: str):
    bad = 0
    first = None
    for ci, c in enumerate(got.columns):
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        for ri in range(len(gv)):
            if not cells_equal(gv[ri], ev[ri]):
                bad += 1
                if first is None:
                    first = (c, ri, gv[ri], ev[ri])
    return bad, first


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    # Declare-vs-dump reconciliation against declared.json — the FULL
    # declared query list Verify writes before dumping — so a rows-only
    # entry that silently vanishes is caught too (oracle_sql.json only
    # covers the SQL-checkable subset; round 7's ev_sessionize vanished
    # from the gate exactly this way). Fall back to oracle keys when
    # declared.json is absent (older dump dirs).
    import os
    try:
        declared = set(json.load(open(f"{outdir}/declared.json")))
    except FileNotFoundError:
        declared = set(oracle)
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))}
    missing = sorted(declared - dumped)
    if missing:
        print(f"MISSING dumps for {len(missing)} declared queries: "
              f"{', '.join(missing)}")
    errored = sorted(d for d in dumped
                     if os.path.exists(os.path.join(outdir, d, "_ERROR.txt")))
    for d in errored:
        msg = open(os.path.join(outdir, d, "_ERROR.txt")).read().strip()
        print(f"ERROR marker in {d}: {msg[:200]}")
    try:
        failed = json.load(open(f"{outdir}/failed.json"))
        for k, v in sorted(failed.items()):
            print(f"FAILED (verify-side) {k}: {v[:200]}")
    except FileNotFoundError:
        pass

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape {got.shape} != {exp.shape}")
            n_fail += 1
            continue
        bad, first = frame_diff(got, exp, name)
        if bad == 0:
            print(f"PASS {name}  ({got.shape[0]}x{got.shape[1]})")
            n_pass += 1
        else:
            # retry row-sorted, in case only ordering differs
            key = list(got.columns)
            gs = got.sort_values(key, kind="mergesort").reset_index(drop=True)
            es = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
            bad2, first2 = frame_diff(gs, es, name)
            if bad2 == 0:
                print(f"WARN {name}: values match only after row sort "
                      f"(ordering differs)")
                n_fail += 1
            else:
                c, ri, g, e = first
                print(f"FAIL {name}: {bad} cells differ; first at col={c} "
                      f"row={ri}: got={g!r} exp={e!r}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(oracle)} oracle queries"
          + (f"; {len(missing)} declared-but-missing" if missing else "")
          + (f"; {len(errored)} error-marked" if errored else ""))
    sys.exit(1 if (n_fail or missing or errored) else 0)


if __name__ == "__main__":
    main()

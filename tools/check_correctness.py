#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares each
query's parquet output: row count, column names, and exact values after
sorting rows and columns. Strict equality — if this passes, any
reasonable hash compare passes.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is b:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
            if math.isnan(af) and math.isnan(bf):
                return True
            return af == bf
        except (TypeError, ValueError):
            return False
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    checked = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        checked += 1
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # Driver hash is dtype-sensitive: DuckDB HUGEINT aggregates (count_if,
        # SUM over ints) materialize as float64 in pandas while Spark emits
        # int64 — values compare equal but hashes differ. Fail on kind drift.
        kind_bad = None
        for c in got.columns:
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            if gk != wk and {gk, wk} <= {"i", "u", "f"} and "f" in {gk, wk}:
                kind_bad = (c, got[c].dtype, want[c].dtype)
                break
        if kind_bad:
            c, gd, wd = kind_bad
            print(f"FAIL {name}: dtype kind mismatch col={c}: spark={gd} duckdb={wd}"
                  " (cast HUGEINT aggregates to BIGINT in oracle SQL)")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not values_equal(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={a!r} duckdb={b!r}")
            failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    # queries without oracle: rows-only check
    all_outputs = {d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json")}
    for name in sorted(all_outputs - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"rows {name}: {n} rows (no oracle)")
    print(f"\n{checked} oracle-checked, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

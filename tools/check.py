#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir> [query ...]

Expects graft.Verify to have populated <verify_out_dir> with one parquet
dir per query plus oracle_sql.json. Runs each oracle SQL in DuckDB over
views named after the fixture tables, then compares against the Spark
parquet: columns sorted by name, rows sorted by all columns, values
compared exactly (with a small float tolerance report for diagnostics).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm_type(t: str) -> str:
    """Canonical type label for dtype-parity: the driver's hash
    stringifies values, so an oracle HUGEINT/DOUBLE vs a Spark
    BIGINT ("4568.0" vs "4568") hash-mismatches even when every cell
    compares equal. Catch the skew at the type level."""
    t = str(t).upper()
    if t in ("REAL",):
        return "FLOAT"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    return t


def dtype_skew(got_rel, want_rel):
    """Column-name-sorted type comparison; returns list of
    (col, spark_type, oracle_type) mismatches."""
    g = dict(zip(got_rel.columns, [norm_type(t) for t in got_rel.types]))
    w = dict(zip(want_rel.columns, [norm_type(t) for t in want_rel.types]))
    return [(c, g[c], w[c]) for c in sorted(set(g) & set(w)) if g[c] != w[c]]


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=", 1)[0]: (a.split("=", 1)[1] if "=" in a else "")
            for a in sys.argv[1:] if a.startswith("--")}
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            print(f"WARN: no view for {t}: {e}")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # r13 hardening: an empty dump must never "pass" silently — the
    # round-13 driver artifact came back {} while the engine was green.
    # Fail loudly on an empty oracle map, and cross-check the dump
    # against graft.Verify's own run_meta.json query count when the
    # full (un-filtered) gate is being run.
    if not oracles:
        print("FAIL: oracle_sql.json is EMPTY — verify dump is broken "
              "or was never run; refusing to pass an empty gate")
        sys.exit(2)
    meta = {}
    try:
        meta = json.load(open(f"{out_dir}/run_meta.json"))
    except Exception as e:
        print(f"WARN: run_meta.json unreadable: {e}")
    if not only and meta.get("n_queries") is not None:
        n_meta = int(meta["n_queries"])
        if n_meta != len(oracles):
            print(f"FAIL: oracle_sql.json has {len(oracles)} entries but "
                  f"run_meta.json says SparkEntry.queries has {n_meta} — "
                  f"partial dump; refusing to pass")
            sys.exit(2)
    n_pass = n_fail = 0
    failed_names = []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            )
            got = got_rel.df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            failed_names.append(name)
            continue
        try:
            want_rel = con.sql(sql)
            want = want_rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            failed_names.append(name)
            continue
        skew = dtype_skew(got_rel, want_rel)
        if skew:
            print(f"FAIL {name}: dtype skew (col, spark, oracle): {skew}")
            n_fail += 1
            failed_names.append(name)
            continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            n_fail += 1
            failed_names.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1
            failed_names.append(name)
            continue
        bad = []
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cell_eq(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches, first: {bad[:3]}")
            n_fail += 1
            failed_names.append(name)
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # Self-check artifact (r13 advice #3): a committed per-round summary
    # (count + git head + pass/fail) so an empty/missing driver artifact
    # is immediately diagnosable against the builder's own run.
    if "--summary" in opts and opts["--summary"]:
        summary = {
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_oracles": len(oracles),
            "failed": sorted(failed_names),
            "sf_dir": sf_dir,
            "run_meta": meta,
        }
        with open(opts["--summary"], "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"summary -> {opts['--summary']}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

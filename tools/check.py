#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir> [query ...]
           [--workers=N] [--summary=FILE] [--slowest=K]

Expects graft.Verify to have populated <verify_out_dir> with one parquet
dir per query plus oracle_sql.json. Runs each oracle SQL in DuckDB over
views named after the fixture tables, then compares against the Spark
parquet: columns sorted by name, rows sorted by all columns, values
compared exactly (with a small float tolerance report for diagnostics).

r15 (verdict #1/#4): the gate outgrew a single process (~22 min at 378
queries — the likely cause of the empty CORRECTNESS_r13/r14 driver
artifacts), so oracles now run SHARDED across worker processes (DuckDB
compares are embarrassingly parallel), every result line is flushed as
it lands (partial progress survives a timeout), each line carries its
oracle wall time, the slowest oracles are reported at the end, and
--summary writes a per-query {rows_match, schema_match, hash_match,
err, secs} map in the driver artifact's shape so an empty driver
artifact can be back-filled 1:1.
"""
import json
import math
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# set per worker in _init (a fresh DuckDB connection per process)
_CON = None
_SF_DIR = None
_OUT_DIR = None
_ORACLES = None


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm_type(t):
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
    import pandas as pd
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


def _init(sf_dir, out_dir, oracles, duck_threads):
    """Per-worker init: own DuckDB connection + fixture views, with a
    bounded thread count so N workers don't oversubscribe the box."""
    global _CON, _SF_DIR, _OUT_DIR, _ORACLES
    import duckdb
    _SF_DIR, _OUT_DIR, _ORACLES = sf_dir, out_dir, oracles
    _CON = duckdb.connect()
    _CON.sql(f"SET threads TO {duck_threads}")
    for t in TABLES:
        try:
            _CON.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass  # parent already warned once


def _check_one(name):
    """Run one oracle compare; returns the per-query record
    (driver-artifact shape + wall time)."""
    t0 = time.monotonic()
    rec = {"rows_match": False, "schema_match": False,
           "hash_match": False, "err": None}

    def done(status, msg=""):
        rec["secs"] = round(time.monotonic() - t0, 3)
        return name, status, msg, rec

    sql = _ORACLES[name]
    try:
        got_rel = _CON.sql(
            f"SELECT * FROM read_parquet('{_OUT_DIR}/{name}/*.parquet')")
        got = got_rel.df()
    except Exception as e:
        rec["err"] = f"spark output unreadable: {e}"
        return done("FAIL", rec["err"])
    try:
        want_rel = _CON.sql(sql)
        want = want_rel.df()
    except Exception as e:
        rec["err"] = f"oracle sql error: {e}"
        return done("FAIL", rec["err"])
    skew = dtype_skew(got_rel, want_rel)
    if skew:
        rec["err"] = f"dtype skew (col, spark, oracle): {skew}"
        return done("FAIL", rec["err"])
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        rec["err"] = (f"columns {list(got.columns)} vs oracle "
                      f"{list(want.columns)}")
        return done("FAIL", rec["err"])
    rec["schema_match"] = True
    if len(got) != len(want):
        rec["err"] = f"rows {len(got)} vs oracle {len(want)}"
        return done("FAIL", rec["err"])
    rec["rows_match"] = True
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
        rec["err"] = f"{len(bad)}+ cell mismatches, first: {bad[:3]}"
        return done("FAIL", rec["err"])
    rec["hash_match"] = True
    return done("PASS", f"{len(got)} rows, {len(got.columns)} cols")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=", 1)[0]: (a.split("=", 1)[1] if "=" in a else "")
            for a in sys.argv[1:] if a.startswith("--")}
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # r13 hardening: an empty dump must never "pass" silently — the
    # round-13 driver artifact came back {} while the engine was green.
    if not oracles:
        print("FAIL: oracle_sql.json is EMPTY — verify dump is broken "
              "or was never run; refusing to pass an empty gate",
              flush=True)
        sys.exit(2)
    meta = {}
    try:
        meta = json.load(open(f"{out_dir}/run_meta.json"))
    except Exception as e:
        print(f"WARN: run_meta.json unreadable: {e}", flush=True)
    if not only and meta.get("n_queries") is not None:
        n_meta = int(meta["n_queries"])
        if n_meta != len(oracles):
            print(f"FAIL: oracle_sql.json has {len(oracles)} entries but "
                  f"run_meta.json says SparkEntry.queries has {n_meta} — "
                  f"partial dump; refusing to pass", flush=True)
            sys.exit(2)
    names = sorted(n for n in oracles if not only or n in only)
    missing = sorted(only - set(oracles))
    for m in missing:
        print(f"WARN: requested query {m} not in oracle_sql.json",
              flush=True)

    # Longest-processing-time-first scheduling: feed the pool in
    # descending size of the Spark output dir (a cheap proxy for
    # oracle cost that keeps the tail short); chunksize=1 so workers
    # steal work as they finish.
    def out_size(n):
        d = os.path.join(out_dir, n)
        try:
            return sum(e.stat().st_size for e in os.scandir(d))
        except Exception:
            return 0
    ordered = sorted(names, key=out_size, reverse=True)

    n_cpu = os.cpu_count() or 8
    workers = int(opts.get("--workers", 0) or min(8, n_cpu, len(ordered)) or 1)
    workers = max(1, workers)
    duck_threads = max(1, n_cpu // workers)
    t_start = time.monotonic()
    per_query = {}
    n_pass = n_fail = 0
    failed_names = []

    def consume(res):
        nonlocal n_pass, n_fail
        name, status, msg, rec = res
        per_query[name] = rec
        if status == "PASS":
            n_pass += 1
            print(f"PASS {name} ({msg}) [{rec['secs']:.2f}s]", flush=True)
        else:
            n_fail += 1
            failed_names.append(name)
            print(f"FAIL {name}: {msg} [{rec['secs']:.2f}s]", flush=True)

    if workers == 1:
        _init(sf_dir, out_dir, oracles, duck_threads)
        for n in ordered:
            consume(_check_one(n))
    else:
        ctx = mp.get_context("fork")
        with ctx.Pool(workers, initializer=_init,
                      initargs=(sf_dir, out_dir, oracles,
                                duck_threads)) as pool:
            for res in pool.imap_unordered(_check_one, ordered,
                                           chunksize=1):
                consume(res)
    wall = time.monotonic() - t_start
    slow_k = int(opts.get("--slowest", 10) or 10)
    slow = sorted(per_query.items(), key=lambda kv: -kv[1]["secs"])[:slow_k]
    print("-- slowest oracles: " + ", ".join(
        f"{n}={r['secs']:.1f}s" for n, r in slow), flush=True)
    print(f"== {n_pass} pass, {n_fail} fail == "
          f"({wall:.1f}s wall, {workers} workers)", flush=True)
    # Self-check artifact (r13 advice #3 + r14 verdict #4): a committed
    # per-round summary with the driver artifact's per-query shape so
    # an empty/missing driver artifact is back-fillable 1:1.
    if "--summary" in opts and opts["--summary"]:
        summary = {
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_oracles": len(oracles),
            "failed": sorted(failed_names),
            "sf_dir": sf_dir,
            "run_meta": meta,
            "wall_secs": round(wall, 1),
            "workers": workers,
            "queries": {n: per_query[n] for n in sorted(per_query)},
        }
        with open(opts["--summary"], "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"summary -> {opts['--summary']}", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

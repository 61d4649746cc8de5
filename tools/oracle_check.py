#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: load Spark's parquet result, run the
matching oracle SQL (oracle_sql.json) in DuckDB over the sfDir tables,
normalize (sort columns by name, sort rows, round floats), and diff.
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd

# Opt-in per-query oracle time cap (seconds). 0 = off (default: the
# driver-shaped behavior). The sf1 full-surface gate (tools/sf1full.py)
# sets this so a DuckDB formulation that goes super-linear at real sf1
# cardinality is RECORDED as oracle-infeasible instead of hanging the
# gate — the r19 composite-gate discipline, made mechanical.
TIMEOUT = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            # strip tz / ns-vs-us differences
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Let large-composite oracle runs (tools/pinstress.py at 100x)
    # SPILL instead of OOM: a bounded memory limit plus a temp
    # directory turns DuckDB's window/sort operators out-of-core.
    # Harmless at the driver's sf0.01 scale.
    tmp = os.environ.get("ORACLE_TMP", "/tmp/duckdb_spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(
        f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_timeout = 0
    present = {q for q in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, q))}
    for q in sorted(set(oracle) - present):
        print(f"[MISSING] {q}: no output dir (query failed in Verify?)")
        n_fail += 1
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(os.path.join(qdir, "*.parquet")))],
                        ignore_index=True)
        if q not in oracle:
            print(f"[rows-only] {q}: rows={len(got)}")
            continue
        # Timeout discipline (ADVICE r20): the timer's interrupt must
        # not fire after the query already succeeded (it would abort
        # the NEXT query), and a genuine oracle error racing the timer
        # must classify as an error, not a timeout. A lock around the
        # finished-check + interrupt closes the first race; requiring
        # the caught exception to BE the interrupt closes the second.
        hit = []
        lock = threading.Lock()
        finished = []
        def _fire(qname=q):
            with lock:
                if not finished:
                    hit.append(qname)
                    con.interrupt()
        timer = None
        if TIMEOUT > 0:
            timer = threading.Timer(TIMEOUT, _fire)
            timer.start()
        try:
            try:
                want = con.execute(oracle[q]).df()
            finally:
                with lock:
                    finished.append(True)
                if timer is not None:
                    timer.cancel()
                if hit and finished:
                    # Interrupt raced a completed query: absorb any
                    # pending interrupt flag so it cannot abort the
                    # next query on this connection.
                    try:
                        con.execute("SELECT 1")
                    except Exception:
                        pass
        except Exception as e:  # OOM/spill exhaustion on huge composites
            # ADVICE r21: some duckdb versions surface con.interrupt()
            # as a different exception type (e.g. RuntimeError with an
            # INTERRUPT message) — accept either the exact type or an
            # 'interrupt' marker in type/message, so a genuine oracle
            # timeout is never misclassified as a FAIL.
            if hit and ("interrupt" in type(e).__name__.lower()
                        or "interrupt" in str(e).lower()):
                print(f"[TIMEOUT-oracle] {q}: oracle exceeded {TIMEOUT:.0f}s"
                      f" — recorded oracle-infeasible at this scale"
                      f" (spark rows={len(got)})")
                n_timeout += 1
                continue
            print(f"[FAIL oracle-err] {q}: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL cols] {q}: spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL rows] {q}: spark={len(g)} duck={len(w)}")
            n_fail += 1
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL vals] {q}: {bad.sum()} differing rows; first:")
            print(pd.concat([g[bad].head(3).add_prefix("spark_"),
                             w[bad].head(3).add_prefix("duck_")], axis=1).to_string())
            n_fail += 1
            continue
        print(f"[ok] {q}: {len(g)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail" +
          (f", {n_timeout} oracle-timeout" if n_timeout else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

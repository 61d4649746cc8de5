#!/usr/bin/env python3
"""sf1 FULL-SURFACE gate with REAL cardinality growth (r19 task 1).

The composite gates (tools/pinstress.py) multiply ROWS but not
DISTINCT VALUES: every copy repeats the same customers, timestamps,
vocabulary, and vectors, so sketch saturation, LSH bucket-size
distribution shifts, vocabulary-head changes, and overflow at true
magnitudes stay untested. This tool synthesizes sf1 from sf0.1 with
BOTH axes scaled — every fixture table, not just the TPC-H trio —
then runs the ENTIRE driver contract (all SparkEntry.queries) against
it with the DuckDB oracle, per-query time-capped so an oracle
formulation that goes super-linear at real cardinality is RECORDED as
oracle-infeasible (the r19 composite-gate discipline) instead of
hanging the gate.

Cardinality design, per table (copy i in 0..9, SHIFT=1e8 — below the
fixture ReKeyOffset 1e11, above every real key, uniform across tables
so any cross-table key equality is preserved within a copy):

  customer/supplier/part  keys +i*SHIFT; name labels suffixed per copy
                          (key AND label NDV grow 10x; low-cardinality
                          categoricals stay fixed, like real scaling)
  orders                  o_orderkey, o_custkey +i*SHIFT (FK -> the
                          copy's customers); date range FIXED (TPC-H
                          scaling grows rows-per-date, not the range)
  lineitem                l_orderkey, l_partkey, l_suppkey +i*SHIFT
  events                  event_id, user_id +i*SHIFT (10x users =
                          10x session groups); ts +i ms (distinct
                          timestamps ~10x without moving any row
                          across a window/session boundary)
  documents               doc_id +i*SHIFT; copy i>0 texts get a fresh
                          per-copy token suffix (vocabulary grows;
                          copies become near-dups of the original —
                          the realistic 10-way near-dup cluster shape,
                          harder than exact duplication for banding);
                          n_chars recomputed so the fixture invariant
                          n_chars == length(text) holds
  embeddings              vec_id +i*SHIFT; copy i>0 vectors perturbed
                          element-wise by a value-dependent term
                          (distinct vectors, slightly rotated — 10x
                          distinct points for LSH/IVF cell occupancy)
  region/nation           symlinked (dimension tables do not scale)

Usage: python3 tools/sf1full.py [out_dir] [queries_csv]
Env:   SF1_SRC (default /root/testdata/sf0.1),
       ORACLE_TIMEOUT_SEC (default 180 — per-query oracle cap),
       SPARK_DRIVER_MEM (default 48g for this gate).
Writes <out_dir>/SF1GATE.json with a per-query status map.
Exit 0 iff no query FAILS (oracle timeouts are recorded, not failed —
each carries the engine row count for the sanity read COVERAGE.md
documents).
"""
import json
import os
import re
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1full"
QUERIES = sys.argv[2] if len(sys.argv) > 2 else None
COPIES = 10
SHIFT = 10 ** 8

# table -> SELECT list builder (i = copy index column in scope).
def keyed(cols, keys, names=()):
    sel = []
    for c in cols:
        if c in keys:
            sel.append(f"{c} + i * {SHIFT} AS {c}")
        elif c in names:
            sel.append(
                f"CASE WHEN i = 0 THEN {c} ELSE {c} || '#' || i END AS {c}")
        else:
            sel.append(c)
    return ", ".join(sel)


def synth():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    plans = {
        "customer": lambda c: keyed(c, {"c_custkey"}, {"c_name"}),
        "supplier": lambda c: keyed(c, {"s_suppkey"}, {"s_name"}),
        "part": lambda c: keyed(c, {"p_partkey"}, {"p_name"}),
        "orders": lambda c: keyed(c, {"o_orderkey", "o_custkey"}),
        "lineitem": lambda c: keyed(
            c, {"l_orderkey", "l_partkey", "l_suppkey"}),
        "events": lambda c: ", ".join(
            f"{x} + i * {SHIFT} AS {x}" if x in ("event_id", "user_id")
            else f"ts + to_milliseconds(i) AS ts" if x == "ts"
            else x for x in c),
        "documents": lambda c: ", ".join(
            f"{x} + i * {SHIFT} AS {x}" if x == "doc_id"
            else ("CASE WHEN i = 0 THEN text ELSE text || ' q' || i || "
                  "'x' || (doc_id % 101) END AS text") if x == "text"
            else ("length(CASE WHEN i = 0 THEN text ELSE text || ' q' || "
                  "i || 'x' || (doc_id % 101) END) AS n_chars")
            if x == "n_chars" else x for x in c),
        "embeddings": lambda c: ", ".join(
            f"{x} + i * {SHIFT} AS {x}" if x == "vec_id"
            else ("CASE WHEN i = 0 THEN embedding ELSE list_transform("
                  "embedding, x -> CAST(x + 0.0003 * i * sin(x * 997.0)"
                  " AS FLOAT)) END AS embedding")
            if x == "embedding" else x for x in c),
    }
    for table in sorted(os.listdir(SRC)):
        if not table.endswith(".parquet"):
            continue
        name = table[: -len(".parquet")]
        src, dst = os.path.join(SRC, table), os.path.join(OUT, table)
        if os.path.lexists(dst):
            os.remove(dst)
        if name not in plans:
            os.symlink(src, dst)
            print(f"[sf1full] {name}: symlinked (dimension)")
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        con.execute(
            f"COPY (SELECT {plans[name](cols)} FROM '{src}' CROSS JOIN "
            f"(SELECT unnest(range({COPIES})) AS i)) TO '{dst}' "
            f"(FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"[sf1full] {name}: x{COPIES} -> {n} rows")


def main():
    synth()
    verify_out = os.path.join(OUT, "_verify_out")
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    args = f"{OUT} {verify_out}" + (f" {QUERIES}" if QUERIES else "")
    print(f"[sf1full] running graft.Verify {args}")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {args}"],
        cwd=REPO, env=env)
    if r.returncode != 0:
        print("[sf1full] graft.Verify FAILED")
        return 1
    env2 = dict(os.environ)
    env2.setdefault("ORACLE_TIMEOUT_SEC", "180")
    env2.setdefault("ORACLE_MEM", "48GB")
    env2.setdefault("ORACLE_TMP", "/tmp/duckdb_spill")
    print("[sf1full] running oracle_check (per-query cap "
          f"{env2['ORACLE_TIMEOUT_SEC']}s)")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
         OUT, verify_out],
        cwd=REPO, env=env2, capture_output=True, text=True)
    lines = r.stdout.splitlines()
    if not any(ln.startswith("== ") for ln in lines):
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        print(f"[sf1full] GATE FAILED: oracle_check crashed "
              f"(exit {r.returncode})")
        return 1
    wanted = set(QUERIES.split(",")) if QUERIES else None
    status = {}
    for ln in lines:
        m = re.match(r"\[(ok|rows-only|TIMEOUT-oracle|FAIL[^\]]*|"
                     r"MISSING)\] (\S+?):", ln)
        if not m:
            continue
        tag, q = m.group(1), m.group(2)
        if wanted is not None and q not in wanted:
            continue
        status[q] = ("pass" if tag == "ok" else
                     "rows-only" if tag == "rows-only" else
                     "oracle-timeout" if tag == "TIMEOUT-oracle" else
                     "FAIL")
        print(ln)
    gate = {"sf": "sf1-full", "copies": COPIES, "shift": SHIFT,
            "status": status,
            "pass": sum(v == "pass" for v in status.values()),
            "rows_only": sum(v == "rows-only" for v in status.values()),
            "oracle_timeout": sum(
                v == "oracle-timeout" for v in status.values()),
            "fail": sum(v == "FAIL" for v in status.values())}
    with open(os.path.join(OUT, "SF1GATE.json"), "w") as f:
        json.dump(gate, f, indent=1, sort_keys=True)
    print(f"[sf1full] == {gate['pass']} pass, {gate['rows_only']} "
          f"rows-only, {gate['oracle_timeout']} oracle-timeout, "
          f"{gate['fail']} FAIL -> {OUT}/SF1GATE.json")
    if gate["fail"]:
        print("[sf1full] GATE FAILED")
        return 1
    if wanted and len(status) < len(wanted):
        print(f"[sf1full] GATE FAILED: targeted queries missing: "
              f"{sorted(wanted - set(status))}")
        return 1
    print("[sf1full] GATE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())

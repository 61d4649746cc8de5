#!/usr/bin/env python3
"""sf1 anchor for the headline dozen (r17 verdict task 7).

All per-round correctness and bench evidence tops out at sf0.1 plus
synthetic composites; this tool anchors the headline queries one real
decade up. It synthesizes sf1 for the TPC-H trio — orders, events,
lineitem replicated 10x with primary keys shifted 1e8 per copy
(lineitem.l_orderkey moves in lockstep with orders.o_orderkey so the
FK stays consistent; every other table symlinks at sf0.1) — then:

  1. runs graft.Verify + the DuckDB oracle on the sf1 dir for the
     headline queries (correctness at sf1, not just timing);
  2. times the same queries with graft.Bench at sf0.1 and sf1
     back-to-back on the same host, and prints the sf0.1 -> sf1
     time-ratio table for COVERAGE.md.

A ratio near 10x on a query whose input scaled 10x is linear; one
well below is constant-dominated at these sizes; anything
super-linear gets a plan read. Queries over documents/embeddings
(dedup_minhash_lsh, similarity_topk_cosine) ride along with UNSCALED
inputs by design — the task scales the relational trio only — so
their expected ratio is ~1 and they serve as same-host controls.

Usage: python3 tools/sf1anchor.py [out_dir]   (default /tmp/sf1)
Env: SF1_QUERIES to override the headline list.
See tools/sf1full.py for the FULL-surface sf1 gate with real
cardinality growth on every fixture table (r20) — this anchor keeps
the cheap trio-composite timing-ratio view.
Exit 0 iff the sf1 correctness gate passes and both bench runs emit
timings for every query.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SF01 = os.environ.get("PINSTRESS_SF", "/root/testdata/sf0.1")

HEADLINE = os.environ.get("SF1_QUERIES", ",".join([
    "q1_agg", "pipeline_medallion", "dedup_minhash_lsh",
    "similarity_topk_cosine", "sessionize", "asof_join",
    "window_moving_agg", "time_resample", "stream_windowed_agg",
    "table_connector_skipping", "group_agg_multi",
    "topk_orderby_limit"]))

# lineitem shifts l_orderkey by the same per-copy offset as orders
# shifts o_orderkey: joins across the trio stay exact at sf1.
os.environ["PINSTRESS_TABLES"] = (
    "orders=o_orderkey,events=event_id,lineitem=l_orderkey")
os.environ["PINSTRESS_SF"] = SF01
os.environ["PINSTRESS_OUT"] = OUT
os.environ["PINSTRESS_COPIES"] = os.environ.get("SF1_COPIES", "10")

sys.path.insert(0, os.path.join(REPO, "tools"))
import pinstress  # noqa: E402  (after env so its config sees ours)


def bench(sf_dir):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Bench {HEADLINE}"],
        cwd=REPO, env=env, capture_output=True, text=True)
    for ln in r.stdout.splitlines():
        # sbt prefixes forked-run stdout with "[info] ".
        if "BENCH_FULL " in ln:
            return json.loads(
                ln.split("BENCH_FULL ", 1)[1])["queries"]
    print(r.stdout[-3000:])
    print(r.stderr[-2000:])
    raise SystemExit(f"bench at {sf_dir} emitted no BENCH_FULL "
                     f"(exit {r.returncode})")


def main():
    # Correctness first: Verify + oracle on the sf1 composite, via
    # pinstress's targeted mode (it already knows how to treat
    # [MISSING] rows for un-run queries).
    sys.argv = ["pinstress.py", HEADLINE]
    pinstress.QUERIES = HEADLINE
    rc = pinstress.main()
    if rc != 0:
        print("[sf1anchor] sf1 correctness gate FAILED")
        return rc
    print("[sf1anchor] timing at sf0.1 ...")
    t01 = bench(SF01)
    print("[sf1anchor] timing at sf1 ...")
    t1 = bench(OUT)
    names = HEADLINE.split(",")
    missing = [n for n in names if n not in t01 or n not in t1]
    if missing:
        print(f"[sf1anchor] FAILED: no timing for {missing}")
        return 1
    print(f"{'query':34s} {'sf0.1 s':>8s} {'sf1 s':>8s} {'ratio':>6s}")
    for n in sorted(names, key=lambda n: -t1[n] / max(t01[n], 1e-9)):
        print(f"{n:34s} {t01[n]:8.2f} {t1[n]:8.2f} "
              f"{t1[n] / max(t01[n], 1e-9):6.2f}")
    print("[sf1anchor] PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())

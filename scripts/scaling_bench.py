"""Two-cluster-size scaling evidence (sandbox protocol, BASELINE.md §3).

Builds a seeded synthetic link graph once, then runs the identical PageRank
job in FRESH JVMs at local[8] (N) and local[32] (4N), both strategies, plus
the pages-extraction pipeline. Emits BENCH/scaling.json and a results table in BENCH/scaling_auto.md.
The curated, hardware-contextualized analysis lives in BENCH/BASELINE.md
(produced from scripts/measure_all.sh records) — this script does not
overwrite it.

Usage: python scripts/scaling_bench.py [--n-vertices 4000000] [--avg-deg 10]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_edges(path: str, n_vertices: int, avg_deg: int) -> None:
    from haskellpagerank_spark.session import get_spark
    from haskellpagerank_spark.sources.synthetic import synth_edges
    spark = get_spark(app_name="scaling-build", cores=32,
                      shuffle_partitions=32)
    synth_edges(spark, n_vertices, avg_deg).write.mode(
        "overwrite").parquet(path)
    spark.stop()


def run_level(cores: int, edges: str, n_vertices: int, strategy: str,
              extract_pages: int = 0) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "scaling_job.py"),
           "--cores", str(cores), "--edges", edges,
           "--n-vertices", str(n_vertices), "--strategy", strategy]
    if extract_pages:
        cmd += ["--extract-pages", str(extract_pages)]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vertices", type=int, default=4_000_000)
    ap.add_argument("--avg-deg", type=int, default=10)
    ap.add_argument("--edges-path", default="/tmp/hpr_scaling_edges.parquet")
    ap.add_argument("--extract-pages", type=int, default=200_000)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.edges_path, "_SUCCESS")):
        print("building edge table ...", file=sys.stderr)
        build_edges(args.edges_path, args.n_vertices, args.avg_deg)

    results = []
    for strategy in ("spmv", "join"):
        for cores in (8, 32):
            print(f"running {strategy} at local[{cores}] ...", file=sys.stderr)
            r = run_level(cores, args.edges_path, args.n_vertices, strategy,
                          extract_pages=(args.extract_pages
                                         if strategy == "spmv" else 0))
            print(json.dumps(r), file=sys.stderr)
            results.append(r)

    def eff(s):
        lo = next(r for r in results if r["strategy"] == s and r["cores"] == 8)
        hi = next(r for r in results if r["strategy"] == s and r["cores"] == 32)
        return lo, hi, (hi["edges_per_sec"] / lo["edges_per_sec"]) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    summary = {"results": results}
    lines = [
        "| job | local[8] (N) | local[32] (4N) | scaling efficiency |",
        "|---|---|---|---|",
    ]
    for s in ("spmv", "join"):
        lo, hi, e = eff(s)
        summary[f"efficiency_{s}"] = round(e, 3)
        lines.append(
            f"| PageRank 5-iter, {s} strategy, {lo['n_edges']:,} edges "
            f"| {lo['edges_per_sec']:,.0f} e/s ({lo['wall_s']}s) "
            f"| {hi['edges_per_sec']:,.0f} e/s ({hi['wall_s']}s) "
            f"| **{e:.3f}** |")
    ex = [r for r in results if "extract_pages_per_sec" in r]
    if len(ex) == 2:
        lo = next(r for r in ex if r["cores"] == 8)
        hi = next(r for r in ex if r["cores"] == 32)
        e = (hi["extract_pages_per_sec"] / lo["extract_pages_per_sec"]) / 4.0
        summary["efficiency_extract"] = round(e, 3)
        lines.append(
            f"| pages generate+extract, {lo['extract_pages']:,} pages "
            f"| {lo['extract_pages_per_sec']:,.0f} p/s ({lo['extract_wall_s']}s) "
            f"| {hi['extract_pages_per_sec']:,.0f} p/s ({hi['extract_wall_s']}s) "
            f"| **{e:.3f}** |")

    with open(os.path.join(REPO, "BENCH", "scaling_auto.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "scaling_auto.md"), "w") as fh:
        fh.write(
            "# BENCH/scaling_auto.md — automated scaling run\n\n"
            "Protocol (BASELINE.md §3): identical job, identical seeded\n"
            "input, fresh JVM per level, local[8] = N vs local[32] = 4N,\n"
            "shuffle partitions scaled with cores. Efficiency =\n"
            "(tput_4N / tput_N) / 4. Machine: 32 cores, pyspark 4.1.2.\n\n"
            + "\n".join(lines) + "\n\n"
            "Raw per-run records: BENCH/scaling_auto.json.\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

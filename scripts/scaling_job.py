"""One scaling-measurement run: PageRank on a pre-built edge parquet at a
given parallelism, fresh JVM. Prints one JSON line.

Usage: python scripts/scaling_job.py --cores N --edges PATH --n-vertices N
       [--iters 5] [--strategy spmv|join] [--extract-pages N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--edges", required=True)
    ap.add_argument("--n-vertices", type=int, required=True)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--strategy", default="spmv",
                    choices=["spmv", "join", "local", "star"])
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "cc", "lp"])
    ap.add_argument("--shuffle-partitions", type=int, default=0)
    ap.add_argument("--extract-pages", type=int, default=0,
                    help="also time the pages extract pipeline at this size")
    args = ap.parse_args()

    from haskellpagerank_spark.operators.graph import Graph
    from haskellpagerank_spark.operators.pagerank import (
        PageRankConfig, run_pagerank)
    from haskellpagerank_spark.operators.pagerank_csr import run_pagerank_spmv
    from haskellpagerank_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{args.cores}", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions or args.cores)
    edges = spark.read.parquet(args.edges)
    g = Graph(edges=edges.persist(), num_vertices=args.n_vertices)
    n_edges = g.edges.count()

    t0 = time.monotonic()
    if args.algo == "cc":
        from haskellpagerank_spark.operators.components import (
            connected_components)
        from haskellpagerank_spark.operators.components_csr import (
            connected_components_spmv)
        from haskellpagerank_spark.operators.components_local import (
            connected_components_local)
        from haskellpagerank_spark.operators.components_star import (
            connected_components_star)
        ccrun = {"spmv": connected_components_spmv,
                 "join": connected_components,
                 "local": connected_components_local,
                 "star": connected_components_star}[args.strategy]
        res = ccrun(g)
        res.df.count()
    elif args.algo == "lp":
        if args.strategy == "spmv":
            raise SystemExit("LP has no SpMV form (label multiset state); "
                             "use join or local")
        from haskellpagerank_spark.operators.components import (
            label_propagation)
        from haskellpagerank_spark.operators.components_local import (
            label_propagation_local)
        lprun = (label_propagation_local if args.strategy == "local"
                 else label_propagation)
        res = lprun(g, args.iters)
        res.df.count()
    else:
        cfg = PageRankConfig(damping=0.85, num_iters=args.iters,
                             sink_mode="redistribute")
        if args.strategy == "local":
            from haskellpagerank_spark.operators.pagerank_local import (
                run_pagerank_local as runner)
        else:
            runner = (run_pagerank_spmv if args.strategy == "spmv"
                      else run_pagerank)
        res = runner(g, cfg)
        res.ranks.count()
    wall = time.monotonic() - t0
    # one-time preprocessing (CSR block build / weighted-edge shuffle)
    # amortizes over arbitrarily many sweeps; the per-iteration rate is the
    # metric that scales with cluster size
    iterate_s = sum(m.wall_s for m in res.metrics)

    out = {
        "cores": args.cores,
        "strategy": args.strategy,
        "algo": args.algo,
        "n_edges": n_edges,
        "iters": res.iterations,
        "wall_s": round(wall, 3),
        "build_s": round(wall - iterate_s, 3),
        "iterate_s": round(iterate_s, 3),
        "edges_per_sec": round(n_edges * res.iterations / wall, 1),
        "edges_per_sec_iterate": round(
            n_edges * res.iterations / iterate_s, 1),
    }

    if args.extract_pages:
        from haskellpagerank_spark.sources.pages import (
            extract_links, generate_pages)
        t0 = time.monotonic()
        pages = generate_pages(spark, num_pages=args.extract_pages, seed=42,
                               avg_links=8)
        n_links = extract_links(pages).count()
        dt = time.monotonic() - t0
        out["extract_pages"] = args.extract_pages
        out["extract_links"] = n_links
        out["extract_wall_s"] = round(dt, 3)
        out["extract_pages_per_sec"] = round(args.extract_pages / dt, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

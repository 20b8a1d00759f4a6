"""Diameter crossover: star CC vs min-label CC on a long path graph.

The experiment the strategy exists for — a P_n path has diameter n-1, so
min-label propagation needs n-1 supersteps while alternating
large-star/small-star (components_star.py) lands in O(log n) rounds. The
min-label arm runs a capped number of rounds (the full run would take
weeks) and reports measured seconds/round plus the extrapolated
wall-to-convergence; the star arm runs to the actual fixpoint. A second
pair runs both on the low-diameter cs graph to document the OTHER side of
the tradeoff (min-label's collapsing frontier wins when diameter is ~10).

Usage: python scripts/star_cc_bench.py [--path-n 2000000] [--cores 8]
       [--cap 20] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line; merge into BENCH/crossover.json by hand.
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
    ap.add_argument("--path-n", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--cap", type=int, default=20,
                    help="min-label rounds to sample on the path arm")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from haskellpagerank_spark.operators.components import (
        connected_components)
    from haskellpagerank_spark.operators.components_star import (
        connected_components_star)
    from haskellpagerank_spark.operators.graph import Graph
    from haskellpagerank_spark.session import get_spark
    from haskellpagerank_spark.sources.tpch_graph import cs_graph

    spark = get_spark(app_name="star-cc-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    n = args.path_n
    path_edges = (
        spark.range(n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .repartition(args.cores)
        .persist()
    )
    path_edges.count()
    g_path = Graph(edges=path_edges, num_vertices=n)
    out: dict = {"path_n": n, "cores": args.cores}

    t0 = time.monotonic()
    star = connected_components_star(g_path)
    n_comp = star.df.agg(F.countDistinct("component").alias("c")).first()["c"]
    out["path_star_wall_s"] = round(time.monotonic() - t0, 3)
    out["path_star_rounds"] = star.iterations
    out["path_star_components"] = int(n_comp)
    assert n_comp == 1, "path must collapse to one component"

    # negative control: sample the min-label join path for --cap rounds
    t0 = time.monotonic()
    capped = connected_components(g_path, max_iters=args.cap)
    dt = time.monotonic() - t0
    out["path_minlabel_rounds_sampled"] = capped.iterations
    out["path_minlabel_sampled_wall_s"] = round(dt, 3)
    out["path_minlabel_s_per_round"] = round(dt / max(capped.iterations, 1), 3)
    out["path_minlabel_rounds_needed"] = n - 1
    out["path_minlabel_extrapolated_days"] = round(
        (n - 1) * dt / max(capped.iterations, 1) / 86400, 1)
    out["path_minlabel_converged"] = (
        capped.metrics[-1].extra.get("changed", 1) == 0)

    # low-diameter side: the cs graph, where min-label's frontier collapses
    g_cs = cs_graph(spark, args.sf_dir)
    g_cs = g_cs.with_edges(g_cs.edges.persist())
    out["cs_n_edges"] = g_cs.edges.count()
    t0 = time.monotonic()
    ml = connected_components(g_cs)
    out["cs_minlabel_wall_s"] = round(time.monotonic() - t0, 3)
    out["cs_minlabel_rounds"] = ml.iterations
    t0 = time.monotonic()
    st = connected_components_star(g_cs)
    out["cs_star_wall_s"] = round(time.monotonic() - t0, 3)
    out["cs_star_rounds"] = st.iterations

    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())

"""spark-submit entry point — the reference CLI re-expressed for Spark.

Mirrors /root/reference/executables/Main.hs:42-46,118-152 (Options record:
--file, --method, --graphcoloring) with the new engine's extra surface
(pages-table input, sink modes, checkpoint/resume, parquet output).

Cluster usage (the production invocation shape the north rule names):

    zip -r engine.zip haskellpagerank_spark
    spark-submit --py-files engine.zip scripts/run_job.py \
        --edges-parquet s3://.../edges --method pagerankS \
        --damping 0.85 --sink-mode redistribute \
        --checkpoint-dir s3://.../ck --output s3://.../ranks

Locally (this sandbox): python scripts/run_job.py --file
/root/reference/executables/input/rmatTest.txt --method pagerankS

Methods (determineMethod, Main.hs:75-85 + north-rule additions):
  pagerankS   synchronous Jacobi (PageRankStep.hs) — join or spmv strategy
  pagerank    alias of pagerankS here (async Gauss-Seidel is not
              BSP-expressible; documented in SURVEY.md §2.5)
  pagerankPP  color-scheduled Gauss-Seidel (PageRankWithPreprocessing.hs)
              — per-color sub-supersteps over a greedy coloring
  prism       incremental activation-set PageRank (Prism.hs family)
  coloringGreedy / jonesPlassman / coloring2Dist / coloringNonDet
  cc          connected components (auto-tiered; join path if checkpointing)
  lp          label propagation (auto-tiered; join path if checkpointing)
  triangles   triangle count
  scc / bowtie / hits / kcore / clustering / summary / walks / effdiam
              structure + centrality extensions (operators/structure.py,
              centrality.py, walks.py); --num-iters doubles as k for kcore
              and walk length for walks
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--file", help="reference-style edge-list text")
    src.add_argument("--edges-parquet", help="edge table parquet (src,dst)")
    src.add_argument("--pages-parquet",
                     help="pages table parquet (url,warc_ts,html,text,lang); "
                          "edges are extracted + dictionary-encoded")
    ap.add_argument("--method", default="pagerankS")
    ap.add_argument("--damping", type=float, default=0.15,
                    help="multiplies the link sum "
                         "(reference default 0.15, InternalPageRank.hs:23-24)")
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--num-iters", type=int, default=0,
                    help="0 = run to convergence (Main.hs:142)")
    ap.add_argument("--sink-mode", default="reflect",
                    choices=["reflect", "redistribute", "none"])
    ap.add_argument("--strategy", default="auto",
                    choices=["auto", "join", "spmv", "star"],
                    help="star applies to --method cc only "
                         "(diameter-independent large/small-star)")
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--output", help="write result parquet here")
    ap.add_argument("--seed", type=int, default=42,
                    help="Jones-Plassmann priority seed (Main.hs:96-98)")
    args = ap.parse_args()

    from haskellpagerank_spark.session import get_spark
    from haskellpagerank_spark.operators import graph as G
    from haskellpagerank_spark.operators.pagerank import (
        PageRankConfig, run_pagerank)

    spark = get_spark(app_name=f"hpr-{args.method}")
    t0 = time.monotonic()
    if args.file:
        g = G.read_edge_list(spark, args.file)
        vertices = None
    elif args.edges_parquet:
        g = G.from_edge_df(spark.read.parquet(args.edges_parquet))
        vertices = None
    else:
        from haskellpagerank_spark.sources.pages import build_graph
        g, vertices = build_graph(spark.read.parquet(args.pages_parquet))
    g = g.with_edges(g.edges.persist())
    n_edges = g.edges.count()
    load_s = time.monotonic() - t0

    cfg = PageRankConfig(
        damping=args.damping, tol=args.eps, num_iters=args.num_iters,
        sink_mode=args.sink_mode, checkpoint_dir=args.checkpoint_dir,
        init_value=1.0 / max(g.num_vertices, 1),  # CLI init (Main.hs:138)
    )

    t0 = time.monotonic()
    m = args.method
    iters = 0
    if m == "pagerankPP":
        from haskellpagerank_spark.operators.pagerank_pp import (
            run_pagerank_pp)
        if cfg.sink_mode == "redistribute":
            raise SystemExit("pagerankPP implements the reference's "
                             "amended-graph semantics (reflect/none)")
        res = run_pagerank_pp(g, cfg)
        out, iters = res.ranks, res.iterations
        summary = {"rank_sum": out.agg({"rank": "sum"}).first()[0]}
    elif m in ("pagerankS", "pagerank", "pagerankND", "pagerankVC",
               "pagerankEC"):
        if args.strategy == "join":
            res = run_pagerank(g, cfg)
        elif args.strategy == "spmv":
            from haskellpagerank_spark.operators.pagerank_csr import (
                run_pagerank_spmv)
            res = run_pagerank_spmv(g, cfg)
        else:
            from haskellpagerank_spark.operators.pagerank_csr import (
                run_pagerank_auto)
            res = run_pagerank_auto(g, cfg)
        out, iters = res.ranks, res.iterations
        # stdout summary = rank sum + time (summarizeVector, Main.hs:154-164)
        total = out.agg({"rank": "sum"}).first()[0]
        summary = {"rank_sum": total}
    elif m == "prism":
        from haskellpagerank_spark.operators.prism import (
            run_pagerank_incremental)
        res = run_pagerank_incremental(g, cfg)
        out, iters = res.ranks, res.iterations
        summary = {"rank_sum": out.agg({"rank": "sum"}).first()[0]}
    elif m in ("coloringGreedy", "jonesPlassman", "coloring2Dist",
               "coloringNonDet"):
        from haskellpagerank_spark.operators import coloring as C
        fn = {"coloringGreedy": lambda: C.greedy_coloring(g),
              "jonesPlassman": lambda: C.jones_plassmann(g, seed=args.seed),
              "coloring2Dist": lambda: C.distance2_coloring(g),
              "coloringNonDet": lambda: C.speculative_coloring(g)}[m]
        res = fn()
        out, iters = res.df, res.iterations
        summary = {"num_colors": C.num_colors(out),
                   "conflicts": C.validate_coloring(g, out)}
    elif m == "cc":
        from haskellpagerank_spark.operators.components import (
            connected_components, connected_components_auto)
        # --strategy star = the diameter-independent large/small-star path
        # (checkpointable); --checkpoint-dir alone = min-label frontier
        # path; otherwise the scale-tiered dispatch picks the strategy
        if args.strategy == "star":
            from haskellpagerank_spark.operators.components_star import (
                connected_components_star)
            res = connected_components_star(
                g, checkpoint_dir=args.checkpoint_dir)
        elif args.checkpoint_dir:
            res = connected_components(g, checkpoint_dir=args.checkpoint_dir)
        else:
            res = connected_components_auto(g)
        out, iters = res.df, res.iterations
        summary = {"n_components":
                   out.select("component").distinct().count()}
    elif m == "lp":
        from haskellpagerank_spark.operators.components import (
            label_propagation, label_propagation_auto)
        res = (label_propagation(g, num_iters=args.num_iters or 5,
                                 checkpoint_dir=args.checkpoint_dir)
               if args.checkpoint_dir
               else label_propagation_auto(g, num_iters=args.num_iters or 5))
        out, iters = res.df, res.iterations
        summary = {"n_labels": out.select("label").distinct().count()}
    elif m == "triangles":
        from haskellpagerank_spark.operators.triangles import triangle_count
        out = triangle_count(g)
        summary = {"n_triangles": out.first()["n_triangles"]}
    elif m == "scc":
        from haskellpagerank_spark.operators.structure import (
            strongly_connected_components_auto)
        res = strongly_connected_components_auto(g)
        out, iters = res.df, res.iterations
        summary = {"n_sccs": out.select("scc").distinct().count()}
    elif m == "bowtie":
        from haskellpagerank_spark.operators.structure import bowtie
        res = bowtie(g)
        out, iters = res.df, res.iterations
        summary = {r["component"]: r["count"]
                   for r in out.groupBy("component").count().collect()}
    elif m == "hits":
        from haskellpagerank_spark.operators.centrality import hits
        res = hits(g, num_iters=args.num_iters or 10)
        out, iters = res.df, res.iterations
        summary = {}
    elif m == "kcore":
        from haskellpagerank_spark.operators.centrality import k_core
        res = k_core(g, k=max(args.num_iters, 2))  # --num-iters doubles as k
        out, iters = res.df, res.iterations
        summary = {"core_size": out.count()}
    elif m == "clustering":
        from haskellpagerank_spark.operators.structure import (
            clustering_coefficient)
        out = clustering_coefficient(g)
        summary = {"avg_cc": out.agg({"cc": "avg"}).first()[0]}
    elif m == "summary":
        from haskellpagerank_spark.operators.structure import (
            graph_summary, powerlaw_alpha)
        out = graph_summary(g).crossJoin(
            powerlaw_alpha(g).withColumnRenamed("alpha", "powerlaw_alpha"))
        summary = out.first().asDict()
    elif m == "walks":
        from haskellpagerank_spark.operators.walks import random_walks
        out = random_walks(g, walk_length=args.num_iters or 5,
                           seed=args.seed)
        summary = {"n_walk_steps": out.count()}
    elif m == "salsa":
        from haskellpagerank_spark.operators.centrality import salsa
        res = salsa(g, num_iters=args.num_iters or 10)
        out, iters = res.df, res.iterations
        summary = {"auth_sum": out.agg({"authority": "sum"}).first()[0]}
    elif m == "anf":
        from haskellpagerank_spark.operators.anf import anf
        res = anf(g, radius=args.num_iters or 8)
        out, iters = res.df, res.iterations
        summary = {"nf": [m_.extra["nf_sum"] for m_ in res.metrics]}
    elif m == "effdiam":
        from haskellpagerank_spark.operators.anf import effective_diameter
        res = effective_diameter(g, max_radius=args.num_iters or 64)
        out, iters = None, res.iterations
        summary = {"effective_diameter": res.effective_diameter,
                   "q": res.q, "saturated": res.saturated, "nf": res.nf}
    elif m in ("betweenness", "harmonic", "closeness"):
        # landmark set: all vertices up to 1024, else the first 1024 ids
        # (sampled-landmark estimate; exact on small graphs)
        lms = list(range(min(g.num_vertices, 1024)))
        if m == "betweenness":
            from haskellpagerank_spark.operators.betweenness import (
                betweenness)
            res = betweenness(g, lms)
        elif m == "harmonic":
            from haskellpagerank_spark.operators.structure import (
                harmonic_centrality)
            res = harmonic_centrality(g, lms)
        else:
            from haskellpagerank_spark.operators.structure import (
                closeness_centrality)
            res = closeness_centrality(g, lms)
        out, iters = res.df, res.iterations
        summary = {"n_landmarks": len(lms)}
    else:
        raise SystemExit(f"unknown method {m!r} (see --help)")
    run_s = time.monotonic() - t0

    if args.output and out is not None:  # effdiam is summary-only
        if vertices is not None and "id" in out.columns:
            out = out.join(vertices, "id")
        out.write.mode("overwrite").parquet(args.output)

    print(json.dumps({
        "method": m, "n_vertices": g.num_vertices, "n_edges": n_edges,
        "iterations": iters, "load_s": round(load_s, 3),
        "run_s": round(run_s, 3),
        "edges_per_sec": round(n_edges * max(iters, 1) / run_s, 1),
        **{k: (round(v, 9) if isinstance(v, float) else v)
           for k, v in summary.items()},
    }))


if __name__ == "__main__":
    main()

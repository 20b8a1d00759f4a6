"""Distributed per-color Gauss–Seidel PageRank — the reference's pagerankPP.

Reference semantics (pagerank/Data/Graph/PageRankWithPreprocessing.hs):
``graphLoopIO`` (:170-209) sweeps the color groups of a proper coloring in
ascending color order; within a group, ``vertexLoopIO`` (:75-102) updates
every vertex *in place* from the CURRENT rank array —

    x_v = dConst + d * sum_{u -> v} x_u / outdeg_u        (Gauss–Seidel)

with dConst = (1-d)/n_nonsink over the amended graph (:268-294), vertices
with no out-edges pinned to 0 (:88), convergence when no vertex moved by
more than ``threshold`` during a full sweep, and the buffer AFTER the final
sweep returned (single buffer, unlike Jacobi's previous-iterate quirk).

Why the coloring makes this distributable: same-colored vertices are
non-adjacent, so their in-neighborhoods never include each other — updating
a whole color class *simultaneously* is bit-equivalent to updating it
sequentially. The reference exploits exactly this to run each color group
on its thread gang (:190-203); the BSP analogue is one filtered
join-aggregate sub-superstep per color:

    for color c in 1..C:
        msgs_c = edges[dst.color = c] JOIN ranks ON src -> SUM(w * rank)
        ranks  = ranks with color-c rows replaced by f(msgs_c)

Gauss–Seidel converges in roughly half the sweeps of Jacobi; the price is
C sub-supersteps per sweep instead of one. With JP/greedy colorings C is
small (max degree bound), and each sub-superstep shuffles only the
in-edges of one color class — the per-sweep shuffle volume stays |E|.

Scale notes: the weighted edge set is pre-partitioned by color once
(persisted with a ``dcolor`` column), so the per-color filter is a
partition-pruned scan, not a re-shuffle; each color step localCheckpoints
lazily and the sweep-end residual aggregation materializes the chain.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, IterationMetrics
from .coloring import greedy_coloring
from .graph import Graph, amend_sinks, out_degrees
from .pagerank import PageRankConfig, PageRankResult, weighted_edges


def run_pagerank_pp(g: Graph, cfg: PageRankConfig | None = None,
                    colors: DataFrame | None = None) -> PageRankResult:
    """Per-color Gauss–Seidel PageRank (see module docstring).

    ``colors``: (id, color) proper coloring of the graph; None -> greedy
    input-order coloring (the reference test harness uses Jones–Plassmann
    with priority = vertex id, which IS greedy input order —
    TestPageRankPP.hs:31-34). amendSinks only reverses existing edges, so
    a coloring of g is valid for the amended graph too.
    """
    cfg = cfg or PageRankConfig(damping=0.15, tol=1e-4, sink_mode="reflect")
    if cfg.sink_mode == "redistribute":
        raise ValueError("pagerankPP implements the reference's "
                         "amended-graph semantics; use reflect/none")
    spark = g.spark
    n = g.num_vertices
    if n == 0:
        return PageRankResult(ranks=g.vertices().select(
            "id", F.lit(0.0).alias("rank")), iterations=0)

    work = amend_sinks(g) if cfg.sink_mode == "reflect" else g
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if colors is None:
        colors = greedy_coloring(work).df
    colors = colors.repartition(shuffle_p, "id").persist()
    color_list = [int(r["color"]) for r in
                  colors.select("color").distinct().orderBy("color").collect()]

    # weighted edges tagged with the DESTINATION's color — one join at
    # build time — then SPLIT into one persisted table per color class: a
    # sub-superstep scans only its own color's in-edges, so a full sweep
    # reads |E| rows total. (A single cached table with a `.where(dcolor=c)`
    # filter would re-scan all cached partitions once per color —
    # C x |E| per sweep, the difference between fine and fatal at C ~ 50
    # on a 100 TB edge set.)
    ewc = (
        weighted_edges(work)
        .join(colors.select(F.col("id").alias("dst"),
                            F.col("color").alias("dcolor")), "dst")
        .repartition(shuffle_p, "src")
        .persist()
    )
    n_edges = ewc.count()
    ew_by_color = {
        c: ewc.where(F.col("dcolor") == c)
        .select("src", "dst", "w").persist()
        for c in color_list
    }

    base = (
        out_degrees(work)
        .select("id", (F.col("deg") > 0).alias("has_out"))
        .join(colors, "id")
        .repartition(shuffle_p, "id")
        .persist()
    )
    n_nonsink = base.where("has_out").count()
    d = cfg.damping
    dconst = (1.0 - d) / n_nonsink if n_nonsink else 0.0
    init = cfg.init_value if cfg.init_value is not None else 1.0 / n

    ranks = base.select(
        "id", "color", "has_out",
        F.when(F.col("has_out"), F.lit(float(init)))
        .otherwise(F.lit(0.0)).alias("rank"),
    ).localCheckpoint(eager=True)

    # resumable: snapshots carry (id, rank); color/has_out are rebuilt from
    # the (deterministic) coloring + degree tables on resume
    ckpt = CheckpointManager(cfg.checkpoint_dir, cfg.checkpoint_interval)
    start_sweep = 0
    resumed = ckpt.resume(spark, required_columns=("id", "rank")) \
        if cfg.checkpoint_dir else None
    if resumed is not None:
        ranks = (
            base.join(resumed[0].select("id", "rank"), "id")
            .select("id", "color", "has_out", "rank")
            .repartition(shuffle_p, "id")
            .localCheckpoint(eager=True)
        )
        start_sweep = resumed[1]

    metrics: list[IterationMetrics] = []
    total_sweeps = cfg.num_iters if cfg.num_iters > 0 else cfg.max_iters
    if cfg.num_iters == 0 and start_sweep >= total_sweeps:
        total_sweeps = start_sweep + 1  # one verification sweep, not a raise
    it = start_sweep
    while it < total_sweeps:
        it += 1
        t0 = time.monotonic()
        sweep_start = ranks
        for c in color_list:
            msgs = (
                ew_by_color[c]
                .join(ranks.select(F.col("id").alias("src"), "rank"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("w") * F.col("rank")).alias("msg"))
            )
            ranks = (
                ranks.join(msgs, "id", "left")
                .select(
                    "id", "color", "has_out",
                    F.when(F.col("color") != c, F.col("rank"))
                    .when(~F.col("has_out"), F.lit(0.0))
                    .otherwise(F.lit(dconst)
                               + F.lit(d) * F.coalesce("msg", F.lit(0.0)))
                    .alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
        # per-vertex movement over the FULL sweep == movement at its own
        # update time (each vertex updates exactly once per sweep), i.e.
        # exactly the reference's isAboveThreshold flag
        res = (
            ranks.alias("n").join(sweep_start.alias("o"), "id")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("l1"),
                 F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("linf"))
            .first()
        )
        l1, linf = float(res["l1"] or 0.0), float(res["linf"] or 0.0)
        m = IterationMetrics(
            iteration=it, l1_residual=l1, linf_residual=linf,
            rows_shuffled=n_edges + len(color_list) * n,
            wall_s=time.monotonic() - t0,
            extra={"strategy": "gauss_seidel_pp",
                   "colors": len(color_list)},
        )
        metrics.append(m)
        ckpt.write(ranks.select("id", "rank"), m)
        converged = (linf if cfg.tol_norm == "linf" else l1) <= cfg.tol
        if cfg.num_iters == 0 and converged:
            break
    else:
        if cfg.num_iters == 0:
            for df in (ewc, base, colors, *ew_by_color.values()):
                df.unpersist()
            raise RuntimeError(
                f"pagerank_pp did not converge within max_iters="
                f"{cfg.max_iters}")

    for df in (ewc, base, colors, *ew_by_color.values()):
        df.unpersist()
    # single buffer: the state AFTER the converging sweep (the reference's
    # GS loop has no previous-iterate quirk)
    return PageRankResult(ranks=ranks.select("id", "rank"),
                          iterations=it, metrics=metrics)

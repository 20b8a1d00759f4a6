"""Incremental (activation-set) PageRank — the reference's prism family.

Reference semantics (graphcoloring/Data/Graph/Prism.hs): instead of
recomputing every vertex each sweep, keep an *activation set*; a vertex
whose rank moved by more than epsilon re-sends, activating its
out-neighbors; terminate when the set drains (prism5 is the benchmarked
variant, Prism.hs:489-515; color-bag scheduling is a shared-memory
locking device with no BSP analogue — SURVEY.md §2.5).

Spark formulation = semi-naive delta propagation, exploiting the linearity
of the PageRank operator:

    x_v = dconst + d * S_v,   S_v = sum_{u->v} w_uv * sent_u

Each superstep ships only the *deltas* of vertices whose un-sent change
exceeds ``activate_eps``:

    delta_u = x_u - sent_u            (frontier = {u : |delta_u| > eps})
    S_v    += sum w_uv * delta_u      (join frontier -> groupBy dst)
    x_v     = dconst + d * S_v

The frontier collapses geometrically, so late supersteps shuffle a tiny
fraction of |E| — exactly the prism win, and the same skeleton our CC uses.
Converges to the unique Jacobi fixpoint within O(eps/(1-d)) per vertex
(tests check against the converged oracle).

The reference ships six prism variants differing only in activation-set
bookkeeping (Prism.hs:299-317 snoc-list bag, 322-341 filtered lists,
344-363 loop counter, 519-543 precomputed neighbor Sets, 489-515 the
benchmarked canonical, 369-392 mutable sets).  The distributed analogue of
that axis is the *frontier representation*, exposed as ``frontier_mode``:

``"rows"`` (default; ≈ prism1/prism5 bags)
    the frontier is a materialized bag of ``(id, delta)`` rows joined
    against the weighted edge table — deg(u) narrow rows ship per active u.
``"adj_sets"`` (≈ prism4 precomputed neighbor sets)
    the adjacency is pre-grouped ONCE into ``src -> array<(dst, w)>``; each
    superstep joins one grouped row per frontier vertex and explodes on the
    reduce side.  Wins when the frontier is tiny and degrees modest; a hub
    row becomes a mega-array — the same trade the reference measured
    against prism3 (Prism.hs:517-518, "union is not fast enough").
``"bitmap"`` (≈ prism6/prism2 mutable-set membership)
    no separate frontier lineage at all: the activation set lives as a
    boolean flag over the dense vertex state (the distributed bitmap), and
    the message join filters the checkpointed state in place.

All modes run the same per-superstep float arithmetic shape and converge
to the same fixpoint; ``tests/test_prism.py`` pins cross-mode parity and
the gate query unions all three tagged modes against one fixpoint twin.
prism3's loop counter is the ``iterations``/metrics surface every mode
already returns.  ``frontier_mode="auto"`` dispatches on the max amended
out-degree: adj_sets below :data:`ADJ_SETS_MAX_DEGREE` (measured ~1.25x
faster on hub-free graphs), rows above it (hub-safe).

Only ``sink_mode`` "reflect"/"none" (the reference's domain — prism always
runs on amended graphs; isolated vertices stay pinned at 0, PageRank.hs:35).
"""

from __future__ import annotations

import time
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, IterationMetrics
from .graph import Graph, amend_sinks, out_degrees
from .pagerank import PageRankConfig, PageRankResult, weighted_edges


FRONTIER_MODES = ("rows", "adj_sets", "bitmap")

# auto picks adj_sets only when no amended-graph out-degree exceeds this —
# above it a single grouped adjacency row holds >64k (dst, w) structs
# (several MB) and the pre-group trades a narrow-row shuffle for
# straggler/memory risk on the hub partitions (measured the other way:
# adj_sets is ~1.25x faster than rows on the modest-degree cs graph,
# BENCH/prism_modes.json)
ADJ_SETS_MAX_DEGREE = 65536


def run_pagerank_incremental(g: Graph, cfg: PageRankConfig | None = None,
                             activate_eps: float | None = None,
                             warm_ranks=None,
                             frontier_mode: str = "rows") -> PageRankResult:
    """Prism-style incremental PageRank; see module docstring.

    ``warm_ranks`` (id, rank) warm-starts from a previously converged
    state — THE prism scenario (Prism.hs:299-317): after a small edge
    delta, re-deriving the accumulated sums ``s`` from the old ranks over
    the NEW edge set costs one full |E| join, after which only vertices
    actually moved by the delta re-activate, so the convergence tail
    shuffles tiny frontiers instead of re-running a cold power iteration.
    Converges to the same fixpoint from any start (linear operator).
    """
    cfg = cfg or PageRankConfig(damping=0.15, sink_mode="reflect", tol=1e-6)
    if cfg.sink_mode == "redistribute":
        raise ValueError("incremental mode implements the reference's "
                         "amended-graph semantics; use reflect/none")
    if frontier_mode not in FRONTIER_MODES + ("auto",):
        raise ValueError(f"frontier_mode must be one of "
                         f"{FRONTIER_MODES + ('auto',)}, "
                         f"got {frontier_mode!r}")
    eps = activate_eps if activate_eps is not None else cfg.tol
    spark = g.spark
    n = g.num_vertices
    if n == 0:
        return PageRankResult(ranks=g.vertices().select(
            "id", F.lit(0.0).alias("rank")), iterations=0)

    work = amend_sinks(g) if cfg.sink_mode == "reflect" else g
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ew = weighted_edges(work).repartition(shuffle_p, "src").persist()
    n_edges = ew.count()

    if frontier_mode == "auto":
        # warm starts drain in a handful of tiny-frontier supersteps, so
        # the one-time adjacency pre-group can't amortize (measured: warm
        # 6.8s adj_sets vs 4.8s rows at sf0.1, cold 21.2s vs 23.6s) — only
        # cold convergence considers adj_sets, and only when no amended
        # out-degree balloons a grouped row (one shuffle-free agg; ew is
        # already hash-partitioned by src)
        if warm_ranks is not None:
            frontier_mode = "rows"
        else:
            max_deg = (ew.groupBy("src").count()
                       .agg(F.max("count")).first()[0]) or 0
            frontier_mode = ("adj_sets" if max_deg <= ADJ_SETS_MAX_DEGREE
                             else "rows")

    adj = None
    if frontier_mode == "adj_sets":
        # prism4's precomputed neighbor Sets: one-time group of the
        # weighted adjacency so each superstep joins ONE row per frontier
        # vertex (explode happens post-join). Hub rows become mega-arrays —
        # acceptable on amended web graphs, and the reason "rows" stays the
        # default (the reference hit the same wall, Prism.hs:517-518).
        adj = (
            ew.groupBy("src")
            .agg(F.collect_list(F.struct("dst", "w")).alias("nbrs"))
            .persist()
        )
        adj.count()

    base = (
        out_degrees(work)
        .select("id", (F.col("deg") > 0).alias("has_out"))
        .repartition(shuffle_p, "id")
        .persist()
    )
    n_nonsink = base.where("has_out").count()
    d = cfg.damping
    dconst = (1.0 - d) / n_nonsink if n_nonsink else 0.0
    init = cfg.init_value if cfg.init_value is not None else 1.0 / n

    # state: x = current rank; s = accumulated weighted sum of *sent* values;
    # sent = value last propagated. Initial x comes from one full sweep
    # position: x0 = init everywhere, nothing sent yet (sent=0, s=0) -> the
    # first superstep is a full send (frontier = all), mirroring the
    # reference's "activation set = all vertices" start (Prism.hs:507).
    if warm_ranks is None:
        state = base.select(
            "id", "has_out",
            F.when(F.col("has_out"), F.lit(float(init)))
            .otherwise(F.lit(0.0)).alias("x"),
            F.lit(0.0).alias("s"),
            F.lit(0.0).alias("sent"),
        ).localCheckpoint(eager=True)
    else:
        # warm start: sent = old converged ranks, s re-derived over the NEW
        # weighted edges in one full join (the only full-|E| pass of the
        # run), x = operator applied once. |x - sent| is ~0 away from the
        # edge delta, so the first frontier is already localized.
        sent0 = (
            base.join(warm_ranks.select(
                "id", F.col("rank").alias("sent")), "id", "left")
            .select("id", "has_out",
                    F.coalesce("sent", F.lit(0.0)).alias("sent"))
        )
        s0 = (
            ew.join(sent0.select(F.col("id").alias("src"), "sent"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("sent")).alias("s0"))
        )
        state = (
            sent0.join(s0, "id", "left")
            .select("id", "has_out",
                    F.coalesce("s0", F.lit(0.0)).alias("s"), "sent")
            .withColumn("x", F.when(~F.col("has_out"), F.lit(0.0))
                        .otherwise(F.lit(dconst) + F.lit(d) * F.col("s")))
            .select("id", "has_out", "x", "s", "sent")
            .localCheckpoint(eager=True)
        )

    # resumable iteration: the snapshot carries the FULL prism state
    # (x, s, sent, has_out), so a killed job restarts mid-loop with its
    # accumulated sums and frontier intact
    ckpt = CheckpointManager(cfg.checkpoint_dir, cfg.checkpoint_interval)
    start_iter = 0
    resumed = ckpt.resume(
        spark, required_columns=("id", "x", "s", "sent", "has_out")) \
        if cfg.checkpoint_dir else None
    if resumed is not None:
        state = (resumed[0].repartition(shuffle_p, "id")
                 .localCheckpoint(eager=True))
        start_iter = resumed[1]

    metrics: list[IterationMetrics] = []
    it = start_iter
    while it < cfg.max_iters:
        it += 1
        t0 = time.monotonic()
        active = F.abs(F.col("x") - F.col("sent")) > eps
        delta = (F.col("x") - F.col("sent")).alias("delta")
        if frontier_mode == "bitmap":
            # prism6's mutable membership set: the activation set is a
            # predicate over the dense checkpointed state — no separate
            # frontier lineage is materialized; stats come from one full
            # scan with the flag folded into conditional aggregates
            stats = state.agg(
                F.count(F.when(active, F.lit(1))).alias("n"),
                F.coalesce(F.sum(F.when(
                    active, F.abs(F.col("x") - F.col("sent")))),
                    F.lit(0.0)).alias("l1"),
                F.coalesce(F.max(F.when(
                    active, F.abs(F.col("x") - F.col("sent")))),
                    F.lit(0.0)).alias("linf"),
            ).first()
            frontier = state.where(active).select("id", delta)
        else:
            frontier = state.where(active).select("id", delta)
            frontier = frontier.localCheckpoint(eager=False)
            # one scalar agg: frontier size + TRUE residuals (sum/max of
            # the un-sent deltas) — manifest comparable across strategies
            stats = frontier.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.abs("delta")), F.lit(0.0)).alias("l1"),
                F.coalesce(F.max(F.abs("delta")), F.lit(0.0)).alias("linf"),
            ).first()
        n_active = int(stats["n"])
        if n_active == 0:
            break
        if frontier_mode == "adj_sets":
            msgs = (
                adj.join(frontier.withColumnRenamed("id", "src"), "src")
                .select("delta", F.explode("nbrs").alias("nb"))
                .groupBy(F.col("nb.dst").alias("id"))
                .agg(F.sum(F.col("nb.w") * F.col("delta")).alias("dmsg"))
            )
        else:
            msgs = (
                ew.join(frontier.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("w") * F.col("delta")).alias("dmsg"))
            )
        state = (
            state
            .withColumn("sent", F.when(
                F.abs(F.col("x") - F.col("sent")) > eps, F.col("x"))
                .otherwise(F.col("sent")))
            .join(msgs, "id", "left")
            .select(
                "id", "has_out",
                F.col("s") + F.coalesce("dmsg", F.lit(0.0)),
                "sent",
            )
            .toDF("id", "has_out", "s", "sent")
            .withColumn("x", F.when(
                ~F.col("has_out"), F.lit(0.0)).otherwise(
                F.lit(dconst) + F.lit(d) * F.col("s")))
            .select("id", "has_out", "x", "s", "sent")
            .localCheckpoint(eager=True)
        )
        m = IterationMetrics(
            iteration=it, l1_residual=float(stats["l1"]),
            linf_residual=float(stats["linf"]), rows_shuffled=n_active,
            wall_s=time.monotonic() - t0,
            extra={"frontier": n_active, "strategy": "incremental",
                   "frontier_mode": frontier_mode},
        )
        metrics.append(m)
        ckpt.write(state, m)

    ew.unpersist()
    if adj is not None:
        adj.unpersist()
    base.unpersist()
    return PageRankResult(
        ranks=state.select("id", F.col("x").alias("rank")),
        iterations=it, metrics=metrics)

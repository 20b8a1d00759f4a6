"""Connected components and label propagation — iterative superstep kernels.

Both reuse the engine's superstep skeleton (join + agg + localCheckpoint +
driver-side convergence scalar), the same shape as PageRank
(operators/pagerank.py) and the reference's prism activation loop
(graphcoloring/Data/Graph/Prism.hs:299-317 — frontier-driven recompute).
The reference itself has no CC/LP; they are north-rule scope
(BASELINE.json: "connected components (iterative min-label hash-partitioned
propagation), label propagation").

Scale design:
- the undirected simple edge set is computed once, hash-partitioned by src,
  and persisted — each iteration shuffles only the |V|-row label table;
- min-label propagation uses a **frontier**: after the first sweep only
  vertices whose label changed last round send messages (semi-naive
  evaluation, the prism pattern) — on web graphs the active set collapses
  after a few rounds while the diameter tail keeps running;
- map-side partial aggregation (min/count per dst per partition) bounds the
  shuffle at <= |V| rows per partition regardless of skew; AQE splits any
  residual skewed reduce partition.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, IterationMetrics
from .graph import Graph, invert


@dataclass
class IterativeResult:
    df: DataFrame
    iterations: int
    metrics: list[IterationMetrics] = field(default_factory=list)


def _undirected_simple(g: Graph, shuffle_p: int) -> DataFrame:
    return (
        g.edges.unionAll(invert(g.edges))
        .dropDuplicates(["src", "dst"])
        .repartition(shuffle_p, "src")
    )


def connected_components(
    g: Graph,
    max_iters: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> IterativeResult:
    """Undirected CC by iterative min-label propagation with a change
    frontier. Returns (id, component) where component = min vertex id in the
    component — the invariant the tests assert (SURVEY.md §5.3).
    """
    spark = g.spark
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = _undirected_simple(g, shuffle_p).persist()

    labels = g.vertices().select("id", F.col("id").alias("component"))
    labels = labels.repartition(shuffle_p, "id").localCheckpoint(eager=True)
    # frontier: vertices whose label changed last round (all, initially)
    frontier = labels
    ckpt = CheckpointManager(checkpoint_dir, checkpoint_interval)
    resumed = ckpt.resume(spark, required_columns=("id", "component")) \
        if checkpoint_dir else None
    start_iter = 0
    if resumed is not None:
        labels = resumed[0].repartition(shuffle_p, "id").localCheckpoint(eager=True)
        frontier = labels  # conservative: full resend after resume
        start_iter = resumed[1]
    return _cc_frontier_loop(edges, labels, frontier, max_iters,
                             start_iter, ckpt)


def connected_components_incremental(
    g: Graph,
    prev_labels: DataFrame,
    max_iters: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> IterativeResult:
    """CC over an *updated* graph, warm-started from the previous converged
    labels — the components analogue of prism/maintain_ranks.

    Min-label propagation from any labeling converges to per-vertex
    ``min over its component of the initial labels``; starting from the old
    converged labels (each = min id of its old component) that minimum IS
    the min id of the new component, so the fixpoint is exact. Edges can
    only be *added* between runs (a crawl never deletes links from the edge
    sink); deletions require a cold recompute.

    The initial frontier is derived, not supplied: only edges whose
    endpoints *disagree* under ``prev_labels`` can trigger any change, so
    one |E| scan seeds the frontier with exactly those endpoints (plus
    vertices unseen by ``prev_labels``, which start as their own id). After
    a converged-state re-run that scan finds nothing and the loop exits in
    one sweep without shuffling messages — the metrics' ``frontier_init``
    extra records the seed size so tests can assert the collapse.
    """
    spark = g.spark
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = _undirected_simple(g, shuffle_p).persist()

    labels = (
        g.vertices()
        .join(prev_labels.select("id", F.col("component").alias("prev")),
              "id", "left")
        .select("id", F.coalesce("prev", F.col("id")).alias("component"))
        .repartition(shuffle_p, "id")
        .localCheckpoint(eager=True)
    )
    # disagreement scan: endpoints of edges whose labels differ. The dst
    # side suffices as message *receivers*; the undirected edge set holds
    # both directions, so each disagreeing endpoint appears as a dst.
    lab_src = labels.select(F.col("id").alias("src"),
                            F.col("component").alias("c_src"))
    lab_dst = labels.select(F.col("id").alias("dst"),
                            F.col("component").alias("c_dst"))
    touched = (
        edges.join(lab_src, "src").join(lab_dst, "dst")
        .where(F.col("c_src") != F.col("c_dst"))
        .select(F.col("src").alias("id"))
        .distinct()
    )
    frontier = (
        labels.join(touched, "id", "left_semi")
        .localCheckpoint(eager=True)
    )
    n_frontier = frontier.count()
    ckpt = CheckpointManager(checkpoint_dir, checkpoint_interval)
    res = _cc_frontier_loop(edges, labels, frontier, max_iters, 0, ckpt,
                            skip_if_empty_frontier=n_frontier == 0)
    if res.metrics:
        res.metrics[0].extra["frontier_init"] = n_frontier
    return res


def _cc_frontier_loop(
    edges: DataFrame,
    labels: DataFrame,
    frontier: DataFrame,
    max_iters: int,
    start_iter: int,
    ckpt: CheckpointManager,
    skip_if_empty_frontier: bool = False,
) -> IterativeResult:
    """Shared semi-naive min-label loop: messages flow only from last
    round's changed vertices; stops when nothing changed."""
    if skip_if_empty_frontier:
        # converged warm start: nothing can change, skip the message sweeps
        edges.unpersist()
        return IterativeResult(df=labels, iterations=0, metrics=[
            IterationMetrics(iteration=0, l1_residual=0.0, linf_residual=0.0,
                             rows_shuffled=0, wall_s=0.0,
                             extra={"changed": 0})])
    n_und_edges = edges.count()
    metrics: list[IterationMetrics] = []
    it = start_iter
    while it < max_iters:
        it += 1
        t0 = time.monotonic()
        # candidate labels pushed from last round's changed vertices only
        msgs = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("cand"))
        )
        new_labels = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("cand", F.col("component")))
                .alias("component"),
                (F.coalesce("cand", F.lit(2**62)) < F.col("component"))
                .alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=False)
        n_changed = new_labels.where("_changed").count()
        frontier = new_labels.where("_changed").select("id", "component")
        new_labels = new_labels.select("id", "component")
        m = IterationMetrics(
            iteration=it, l1_residual=float(n_changed),
            linf_residual=float(1 if n_changed else 0),
            rows_shuffled=n_und_edges, wall_s=time.monotonic() - t0,
            extra={"changed": n_changed},
        )
        metrics.append(m)
        ckpt.write(new_labels, m)
        labels = new_labels
        if n_changed == 0:
            break
    edges.unpersist()
    return IterativeResult(df=labels, iterations=it, metrics=metrics)


# rounds of frontier min-label the top tier gets before the star fallback.
# Crawl-shaped graphs converge in <10 (measured: 6 at 42M edges,
# BENCH/crossover.json), so the budget never trips there; a long-diameter
# adversary (a 2M-vertex path needs 2M supersteps ≈ 113 days measured rate)
# trips it after ~16 cheap rounds and finishes in O(log n) star rounds.
FRONTIER_ROUND_BUDGET = 16


def connected_components_auto(g: Graph, **kw) -> IterativeResult:
    """Scale-tiered dispatch, mirroring pagerank_csr.run_pagerank_auto:
    driver-local numpy below LOCAL_MAX_EDGES (the COST regime), CSR-block
    SpMV while the label vector broadcasts comfortably, the shuffle-join
    frontier path beyond — budgeted, with a diameter-independent
    large/small-star fallback so auto NEVER runs O(diameter) unbounded.
    All tiers produce identical (id, component = min id)."""
    from .components_csr import connected_components_spmv
    from .components_local import connected_components_local
    from .pagerank_csr import SPMV_MAX_VERTICES
    from .pagerank_local import LOCAL_MAX_EDGES
    n_edges = g.edges.count()
    if n_edges <= LOCAL_MAX_EDGES:
        return connected_components_local(g)
    if g.num_vertices <= SPMV_MAX_VERTICES:
        return connected_components_spmv(g)
    budget = kw.pop("max_iters", FRONTIER_ROUND_BUDGET)
    res = connected_components(g, max_iters=budget, **kw)
    if res.metrics and res.metrics[-1].extra.get("changed", 0) != 0:
        from .components_star import finish_with_star
        return finish_with_star(g, res)
    return res


def label_propagation_auto(g: Graph, num_iters: int = 5,
                           **kw) -> IterativeResult:
    """LP tiering: driver-local numpy below LOCAL_MAX_EDGES, the
    shuffle-join superstep path beyond (LP's mode aggregate has no
    broadcast-vector SpMV form — the per-dst state is a label multiset,
    not a scalar). Identical (id, label) across tiers."""
    from .components_local import label_propagation_local
    from .pagerank_local import LOCAL_MAX_EDGES
    n_edges = g.edges.count()
    if n_edges <= LOCAL_MAX_EDGES:
        return label_propagation_local(g, num_iters)
    return label_propagation(g, num_iters, **kw)


def label_propagation(
    g: Graph,
    num_iters: int = 5,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> IterativeResult:
    """Synchronous community label propagation, fully deterministic.

    Labels init to vertex id; each round every vertex adopts the most
    frequent label among its (undirected, deduped) neighbors, ties broken by
    the smallest label; isolated vertices keep their own label. Early-stops
    when no label changed. Matches oracle.label_propagation exactly.

    The mode aggregation is two Catalyst-native stages: count per (dst,
    label), then a max_by-style reduce per dst — no Python in the loop.
    """
    spark = g.spark
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = _undirected_simple(g, shuffle_p).persist()
    n_und_edges = edges.count()

    labels = g.vertices().select("id", F.col("id").alias("label"))
    labels = labels.repartition(shuffle_p, "id").localCheckpoint(eager=True)
    ckpt = CheckpointManager(checkpoint_dir, checkpoint_interval)
    resumed = ckpt.resume(spark, required_columns=("id", "label")) \
        if checkpoint_dir else None
    start_iter = 0
    if resumed is not None:
        labels = resumed[0].repartition(shuffle_p, "id").localCheckpoint(eager=True)
        start_iter = resumed[1]

    metrics: list[IterationMetrics] = []
    it = start_iter
    while it < num_iters:
        it += 1
        t0 = time.monotonic()
        counts = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # mode with deterministic tie-break: max count, then min label —
        # a single max_by over a sortable (cnt, -label) struct
        winner = (
            counts.groupBy("id")
            .agg(
                F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg")))
                .alias("w")
            )
            .select("id", (-F.col("w.neg")).alias("new_label"))
        )
        new_labels = (
            labels.join(winner, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", F.col("label")).alias("label"),
                (F.coalesce("new_label", F.col("label")) != F.col("label"))
                .alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = new_labels.where("_changed").count()
        new_labels = new_labels.select("id", "label")
        m = IterationMetrics(
            iteration=it, l1_residual=float(n_changed),
            linf_residual=float(1 if n_changed else 0),
            rows_shuffled=n_und_edges, wall_s=time.monotonic() - t0,
            extra={"changed": n_changed},
        )
        metrics.append(m)
        ckpt.write(new_labels, m)
        labels = new_labels
        if n_changed == 0:
            break
    edges.unpersist()
    return IterativeResult(df=labels, iterations=it, metrics=metrics)

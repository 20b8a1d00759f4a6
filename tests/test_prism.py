"""Incremental (prism-style) PageRank: converges to the Jacobi fixpoint
with a draining frontier (TestPrism.hs's invariant style, SURVEY.md §5)."""

import numpy as np
import pytest

from haskellpagerank_spark import oracle as O
from haskellpagerank_spark.fixtures import FIXTURE_EDGES, PAGERANK_FIXTURES
from haskellpagerank_spark.operators.graph import from_pairs
from haskellpagerank_spark.operators.pagerank import PageRankConfig
from haskellpagerank_spark.operators.prism import run_pagerank_incremental


@pytest.mark.parametrize("name", ["doubleSquare", "princeton", "complete",
                                  "sinkAndSource"])
def test_incremental_reaches_jacobi_fixpoint(spark, name):
    pairs = FIXTURE_EDGES[name]
    src, dst, n = O.parse_edges(pairs)
    asrc, adst = O.amend_sinks(src, dst, n)
    want = O.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-12, init=1.0)
    g = from_pairs(spark, pairs)
    res = run_pagerank_incremental(g, PageRankConfig(
        damping=0.15, tol=1e-9, sink_mode="reflect", init_value=1.0,
        max_iters=500), activate_eps=1e-9)
    got = res.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_frontier_drains(spark):
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    res = run_pagerank_incremental(g, PageRankConfig(
        damping=0.15, tol=1e-8, sink_mode="reflect", init_value=1.0,
        max_iters=500))
    sizes = [m.extra["frontier"] for m in res.metrics]
    assert sizes[0] == g.num_vertices         # full first activation
    assert sizes[-1] <= sizes[0]              # collapses over time
    # rank sum invariant on a stochastic (amended) graph
    s = res.ranks.agg({"rank": "sum"}).first()[0]
    assert abs(s - 1.0) < 0.05


@pytest.mark.parametrize("mode", ["adj_sets", "bitmap"])
def test_frontier_modes_reach_same_fixpoint(spark, mode):
    """prism4/prism6 analogues (precomputed-neighbor-set and bitmap
    frontiers) converge to the same Jacobi fixpoint as the default bag
    frontier — the distributed twin of the reference's bookkeeping-only
    prism variants (Prism.hs:299-543)."""
    for name in ("doubleSquare", "sinkAndSource"):
        pairs = FIXTURE_EDGES[name]
        src, dst, n = O.parse_edges(pairs)
        asrc, adst = O.amend_sinks(src, dst, n)
        want = O.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-12,
                                 init=1.0)
        g = from_pairs(spark, pairs)
        res = run_pagerank_incremental(g, PageRankConfig(
            damping=0.15, tol=1e-9, sink_mode="reflect", init_value=1.0,
            max_iters=500), activate_eps=1e-9, frontier_mode=mode)
        got = res.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert all(m.extra["frontier_mode"] == mode for m in res.metrics)


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_frontier_modes_agree_on_random_graphs(spark, seed):
    """Randomized three-way frontier-mode parity on seeded G(n,p) digraphs
    with sinks, duplicate edges, and a hub: every mode must land within
    activation-eps-scale distance of the same fixpoint (the modes share
    per-superstep arithmetic, but message-sum ORDER differs, so exact
    bit-parity is not the contract — the fixpoint is)."""
    import random
    rng = random.Random(seed)
    n = rng.randint(15, 30)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.12]
    pairs += [(0, v) for v in range(1, n, 3)]              # hub
    pairs += rng.sample(pairs, k=max(1, len(pairs) // 8))  # duplicates
    g = from_pairs(spark, pairs)
    cfg = PageRankConfig(damping=0.15, tol=1e-10, sink_mode="reflect",
                         init_value=1.0, max_iters=500)
    got = {}
    for mode in ("rows", "adj_sets", "bitmap"):
        res = run_pagerank_incremental(g, cfg, activate_eps=1e-10,
                                       frontier_mode=mode)
        got[mode] = res.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got["adj_sets"], got["rows"], atol=1e-7)
    np.testing.assert_allclose(got["bitmap"], got["rows"], atol=1e-7)


def test_frontier_mode_auto_dispatch(spark, monkeypatch):
    """auto picks adj_sets on hub-free graphs and falls back to the
    hub-safe rows bag when any amended out-degree exceeds the envelope
    (forced here by shrinking the threshold to 0)."""
    import haskellpagerank_spark.operators.prism as P
    cfg = PageRankConfig(damping=0.15, tol=1e-8, sink_mode="reflect",
                         init_value=1.0, max_iters=500)
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    res = run_pagerank_incremental(g, cfg, frontier_mode="auto")
    assert res.metrics[0].extra["frontier_mode"] == "adj_sets"
    monkeypatch.setattr(P, "ADJ_SETS_MAX_DEGREE", 0)
    res = run_pagerank_incremental(g, cfg, frontier_mode="auto")
    assert res.metrics[0].extra["frontier_mode"] == "rows"


def test_frontier_mode_rejects_unknown(spark):
    g = from_pairs(spark, FIXTURE_EDGES["square"])
    with pytest.raises(ValueError, match="frontier_mode"):
        run_pagerank_incremental(g, frontier_mode="snoc")


def test_incremental_rejects_redistribute(spark):
    g = from_pairs(spark, FIXTURE_EDGES["square"])
    with pytest.raises(ValueError):
        run_pagerank_incremental(g, PageRankConfig(sink_mode="redistribute"))


def test_prism_checkpoint_resume(spark, tmp_path):
    """Kill-and-resume: interrupt the incremental run after 3 supersteps,
    resume from the snapshot manifest, land on the same fixpoint as an
    uninterrupted run (the snapshot carries the full x/s/sent state)."""
    import numpy as np
    from haskellpagerank_spark.operators.pagerank import PageRankConfig
    pairs = FIXTURE_EDGES["hub"] + FIXTURE_EDGES["doubleSquare"]
    g = from_pairs(spark, pairs)
    base_cfg = dict(damping=0.15, tol=1e-9, sink_mode="reflect")
    full = run_pagerank_incremental(g, PageRankConfig(**base_cfg,
                                                      max_iters=300))
    ck = str(tmp_path / "ck")
    run_pagerank_incremental(g, PageRankConfig(
        **base_cfg, max_iters=3, checkpoint_dir=ck, checkpoint_interval=1))
    resumed = run_pagerank_incremental(g, PageRankConfig(
        **base_cfg, max_iters=300, checkpoint_dir=ck, checkpoint_interval=1))
    assert resumed.iterations > 3  # continued past the interrupted point
    a = full.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    b = resumed.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_warm_start_after_edge_delta(spark):
    """THE prism scenario (Prism.hs:299-317): converge, add a few edges,
    warm-start from the old ranks — lands on the new graph's fixpoint with
    a localized (non-full) first frontier."""
    pairs = FIXTURE_EDGES["doubleSquare"] + FIXTURE_EDGES["complete"]
    g = from_pairs(spark, pairs)
    cfg = PageRankConfig(damping=0.15, tol=1e-9, sink_mode="reflect",
                         init_value=1.0, max_iters=500)
    cold = run_pagerank_incremental(g, cfg, activate_eps=1e-9)

    delta = [(0, 3), (2, 0)]  # new edges not in the fixture
    g2 = from_pairs(spark, pairs + delta)
    warm = run_pagerank_incremental(g2, cfg, activate_eps=1e-9,
                                    warm_ranks=cold.ranks)
    cold2 = run_pagerank_incremental(g2, cfg, activate_eps=1e-9)

    a = warm.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    b = cold2.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-6)
    # oracle agreement on the post-delta graph
    src, dst, n = O.parse_edges(pairs + delta)
    asrc, adst = O.amend_sinks(src, dst, n)
    want = O.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-12,
                             init=1.0)
    np.testing.assert_allclose(a, want, atol=1e-6)


def test_warm_start_no_delta_converges_immediately(spark):
    """Warm-starting on the SAME graph finds an (almost) empty frontier:
    the run costs one |E| join, not a power iteration."""
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    cfg = PageRankConfig(damping=0.15, tol=1e-9, sink_mode="reflect",
                         init_value=1.0, max_iters=500)
    cold = run_pagerank_incremental(g, cfg, activate_eps=1e-9)
    warm = run_pagerank_incremental(g, cfg, activate_eps=1e-6,
                                    warm_ranks=cold.ranks)
    assert warm.iterations <= 2
    a = warm.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    b = cold.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_maintain_ranks_over_catalog_snapshots(spark, tmp_path):
    """VERDICT r4 #7: prism rank maintenance consumes the same catalog
    table the engine writes. Commit snapshot 1, converge cold; append a
    delta commit (snapshot 2); warm-maintain from snapshot-1 ranks must
    land on the exact fixpoint of snapshot 2 (parity with a cold
    recompute), in fewer supersteps, with the manifest diff reported."""
    from haskellpagerank_spark.sources.catalog import Table
    from haskellpagerank_spark.streaming.ingest import maintain_ranks_catalog

    n = 12
    base_pairs = [(i, (i + 1) % n) for i in range(n)] + [(0, 5), (3, 9)]
    delta_pairs = [(7, 2), (4, 11), (11, 4)]
    cfg = PageRankConfig(damping=0.85, tol=1e-10, sink_mode="reflect",
                         max_iters=300)
    t = Table(str(tmp_path / "edges_tbl"))
    s1 = t.commit(spark.createDataFrame(base_pairs, "src long, dst long"))
    cold1 = maintain_ranks_catalog(spark, t, n, cfg=cfg, snapshot=s1)

    s2 = t.commit(spark.createDataFrame(delta_pairs, "src long, dst long"))
    warm = maintain_ranks_catalog(spark, t, n, prev_ranks=cold1.ranks,
                                  snapshot=s2, base_snapshot=s1, cfg=cfg)
    cold2 = maintain_ranks_catalog(spark, t, n, cfg=cfg, snapshot=s2)

    got = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    want = {r["id"]: r["rank"] for r in cold2.ranks.collect()}
    assert set(got) == set(want)
    np.testing.assert_allclose(
        np.array([got[i] for i in range(n)]),
        np.array([want[i] for i in range(n)]), atol=1e-9)
    assert warm.iterations < cold2.iterations
    assert warm.metrics[0].extra["delta_files"] >= 1
    assert warm.metrics[0].extra["delta_rows"] == len(delta_pairs)


def test_maintain_ranks_catalog_noop_round_keeps_lineage(spark, tmp_path):
    """Regression: the steady-state no-op maintenance round (snapshot delta
    disturbs no rank — here, duplicate edges of an already-uniform-weight
    pair set, or simply re-running against the same snapshot) used to skip
    the documented delta_files/delta_rows lineage because the prism loop
    converged before its first sweep left any metrics. Lineage must land
    on a zero-cost metrics record instead."""
    from haskellpagerank_spark.sources.catalog import Table
    from haskellpagerank_spark.streaming.ingest import maintain_ranks_catalog

    n = 8
    pairs = [(i, (i + 1) % n) for i in range(n)]
    cfg = PageRankConfig(damping=0.85, tol=1e-10, sink_mode="reflect",
                         max_iters=300)
    t = Table(str(tmp_path / "noop_tbl"))
    s1 = t.commit(spark.createDataFrame(pairs, "src long, dst long"))
    cold = maintain_ranks_catalog(spark, t, n, cfg=cfg, snapshot=s1)

    # same snapshot, converged warm state: nothing to drain
    warm = maintain_ranks_catalog(spark, t, n, prev_ranks=cold.ranks,
                                  snapshot=s1, base_snapshot=s1, cfg=cfg)
    assert warm.metrics, "lineage record present even on a no-op round"
    assert warm.metrics[0].extra["delta_files"] == 0
    assert warm.metrics[0].extra["delta_rows"] == 0
    got = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    want = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-12

"""pagerankPP (distributed per-color Gauss–Seidel) vs the color-scheduled
sequential oracle (PageRankWithPreprocessing.hs:75-294 semantics).

Key property under test: given a proper coloring, the engine's simultaneous
per-color-class update is bit-equivalent to the reference's sequential
color-scheduled sweep — so the parity bound is 1e-12, not "close".
"""

import numpy as np
import pytest

from haskellpagerank_spark import fixtures, oracle
from haskellpagerank_spark.operators import graph as G
from haskellpagerank_spark.operators.coloring import jones_plassmann
from haskellpagerank_spark.operators.pagerank import PageRankConfig
from haskellpagerank_spark.operators.pagerank_pp import run_pagerank_pp


def rank_vector(result, n):
    v = np.zeros(n)
    for row in result.ranks.collect():
        v[row["id"]] = row["rank"]
    return v


def _oracle_pp(name, **kw):
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
    asrc, adst = oracle.amend_sinks(src, dst, n)
    colors = oracle.greedy_coloring(asrc, adst, n)
    return oracle.pagerank_pp(asrc, adst, n, colors, **kw), n


@pytest.mark.parametrize("name", ["doubleSquare", "myFavorite", "complete",
                                  "simpleGraphOneNodeMissing"])
def test_pp_fixed_sweeps_matches_oracle_exactly(spark, name):
    want, n = _oracle_pp(name, damping=0.15, init=1.0, num_iters=3)
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])
    res = run_pagerank_pp(g, PageRankConfig(
        damping=0.15, num_iters=3, sink_mode="reflect", init_value=1.0))
    assert res.iterations == 3
    assert np.allclose(rank_vector(res, n), want, atol=1e-12), name


@pytest.mark.parametrize("name", fixtures.PAGERANK_FIXTURES)
def test_pp_convergence_matches_oracle_and_fixpoint(spark, name):
    want, n = _oracle_pp(name, damping=0.15, eps=1e-4, init=1.0)
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])
    res = run_pagerank_pp(g, PageRankConfig(
        damping=0.15, tol=1e-4, sink_mode="reflect", init_value=1.0,
        max_iters=200))
    got = rank_vector(res, n)
    # same stopping rule, same schedule -> same sweep count, same buffer
    assert np.allclose(got, want, atol=1e-12), name
    # reference invariant: sum ~ 1 (TestPageRankPP.hs:26-38)
    assert 0.95 <= float(got.sum()) <= 1.05
    # GS converges to the same fixpoint as Jacobi
    src, dst, _ = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
    asrc, adst = oracle.amend_sinks(src, dst, n)
    fix = oracle.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-12,
                                 init=1.0)
    assert np.allclose(got, fix, atol=1e-3), name


def test_pp_accepts_custom_coloring(spark):
    # a JP coloring (different class structure) must reach the same fixpoint
    name = "doubleSquare"
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])
    from haskellpagerank_spark.operators.graph import amend_sinks
    colors = jones_plassmann(amend_sinks(g), seed=7).df
    res = run_pagerank_pp(g, PageRankConfig(
        damping=0.15, tol=1e-10, sink_mode="reflect", init_value=1.0,
        max_iters=300), colors=colors)
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
    asrc, adst = oracle.amend_sinks(src, dst, n)
    fix = oracle.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-13,
                                 init=1.0)
    assert np.allclose(rank_vector(res, n), fix, atol=1e-8)


def test_pp_converges_in_fewer_sweeps_than_jacobi(spark):
    # the point of GS scheduling: ~2x fewer sweeps to the same tolerance
    from haskellpagerank_spark.operators.pagerank import (
        reference_config, run_pagerank)
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["doubleSquare"])
    pp = run_pagerank_pp(g, PageRankConfig(
        damping=0.15, tol=1e-8, sink_mode="reflect", init_value=1.0,
        max_iters=200))
    jac = run_pagerank(g, reference_config(tol=1e-8))
    assert pp.iterations < jac.iterations


def test_pp_checkpoint_resume(spark, tmp_path):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["doubleSquare"])
    ck = str(tmp_path / "ck")
    base = dict(damping=0.15, sink_mode="reflect", init_value=1.0,
                checkpoint_dir=ck, checkpoint_interval=1)
    run_pagerank_pp(g, PageRankConfig(num_iters=2, **base))
    resumed = run_pagerank_pp(g, PageRankConfig(num_iters=5, **base))
    straight = run_pagerank_pp(g, PageRankConfig(
        damping=0.15, num_iters=5, sink_mode="reflect", init_value=1.0))
    n = g.num_vertices
    np.testing.assert_allclose(rank_vector(resumed, n),
                               rank_vector(straight, n), atol=1e-14)
    assert resumed.iterations == 5


def test_pp_rejects_redistribute_mode(spark):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["square"])
    with pytest.raises(ValueError):
        run_pagerank_pp(g, PageRankConfig(sink_mode="redistribute"))

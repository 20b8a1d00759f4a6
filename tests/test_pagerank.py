"""PageRank vs the NumPy oracle on the reference fixture graphs.

Gate from BASELINE.json: per-vertex scores allclose 1e-6 vs the reference
semantics at convergence, plus the reference's own sum~1 invariant
(pagerank/Test/Data/Graph/TestPageRank.hs:18-33).
"""

import numpy as np
import pytest

from haskellpagerank_spark import fixtures, oracle
from haskellpagerank_spark.operators import graph as G
from haskellpagerank_spark.operators.pagerank import (
    PageRankConfig, reference_config, run_pagerank, top_k,
)


def rank_vector(result, n):
    v = np.zeros(n)
    for row in result.ranks.collect():
        v[row["id"]] = row["rank"]
    return v


def oracle_reflect(name, **kw):
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
    asrc, adst = oracle.amend_sinks(src, dst, n)
    return oracle.pagerank_jacobi(asrc, adst, n, **kw), n


@pytest.mark.parametrize("name", fixtures.PAGERANK_FIXTURES)
def test_reference_jacobi_convergence(spark, name):
    want, n = oracle_reflect(name, damping=0.15, eps=1e-4, init=1.0)
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])
    res = run_pagerank(g, reference_config())
    got = rank_vector(res, n)
    assert np.allclose(got, want, atol=1e-6), (name, got, want)
    # reference invariant: sum ~ 1 (TestPageRank.hs:30-33)
    assert 0.99 <= float(got.sum()) <= 1.01


def test_reference_fixed_iterations(spark):
    # numIters=k returns exactly the k-th sweep (PageRankStep.hs:66)
    want, n = oracle_reflect("doubleSquare", damping=0.15, eps=1e-6,
                             init=1.0, num_iters=5)
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["doubleSquare"])
    res = run_pagerank(g, reference_config(num_iters=5, tol=1e-6))
    assert res.iterations == 5
    assert np.allclose(rank_vector(res, n), want, atol=1e-9)


def test_isolated_vertex_rank_zero(spark):
    # PageRank.hs:35 pins outdeg==0 (post-amend: isolated) vertices to 0
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["simpleGraphOneNodeMissing"])
    res = run_pagerank(g, reference_config())
    ranks = {r["id"]: r["rank"] for r in res.ranks.collect()}
    assert ranks[0] == 0.0
    assert ranks[1] > 0 and ranks[2] > 0


def test_redistribute_mode_sums_to_one(spark):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["doubleSquare"])
    cfg = PageRankConfig(damping=0.85, tol=1e-10, tol_norm="l1")
    res = run_pagerank(g, cfg)
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES["doubleSquare"])
    want = oracle.pagerank_redistribute(src, dst, n, damping=0.85, eps=1e-10)
    got = rank_vector(res, n)
    assert abs(got.sum() - 1.0) < 1e-9
    assert np.allclose(got, want, atol=1e-8)


def test_redistribute_fixed_iters_matches_oracle(spark):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["myFavorite"])
    res = run_pagerank(g, PageRankConfig(damping=0.85, num_iters=7))
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES["myFavorite"])
    want = oracle.pagerank_redistribute(src, dst, n, damping=0.85, num_iters=7)
    assert np.allclose(rank_vector(res, n), want, atol=1e-12)


def test_metrics_recorded(spark):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["square"])
    res = run_pagerank(g, reference_config(num_iters=3))
    assert len(res.metrics) == 3
    m = res.metrics[-1]
    assert m.iteration == 3 and m.wall_s > 0 and m.rows_shuffled > 0
    # residuals shrink
    assert res.metrics[-1].l1_residual <= res.metrics[0].l1_residual


def test_top_k(spark):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["doubleSquare"])
    res = run_pagerank(g, reference_config())
    rows = top_k(res.ranks, 3).collect()
    assert len(rows) == 3
    assert rows[0]["rank"] >= rows[1]["rank"] >= rows[2]["rank"]
    # vertex 7 (the sink every path feeds) has the top rank
    assert rows[0]["id"] == 7


def test_gauss_seidel_oracle_close_to_jacobi():
    # async variant (PageRank.hs) converges to the same fixed point
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES["doubleSquare"])
    asrc, adst = oracle.amend_sinks(src, dst, n)
    gs = oracle.pagerank_gauss_seidel(asrc, adst, n, damping=0.15, eps=1e-10,
                                      init=1.0)
    jc = oracle.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-10,
                                init=1.0)
    assert np.allclose(gs, jc, atol=1e-7)

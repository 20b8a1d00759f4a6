"""HITS / personalized PageRank / BFS / k-core vs the NumPy oracle on the
reference fixture graphs (FIXTURES.md). These are engine extensions (no
reference analogue) — textbook semantics, deterministic, exact-matchable."""

from __future__ import annotations

import numpy as np
import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.centrality import (
    bfs_distances, hits, k_core, personalized_pagerank,
)
from haskellpagerank_spark.operators.graph import from_pairs

# skip the empty/trivial fixtures where centralities are degenerate
FIXTURES = sorted(n for n, e in FIXTURE_EDGES.items() if len(e) >= 4)


def _arrays(name):
    return oracle.parse_edges(FIXTURE_EDGES[name])


@pytest.mark.parametrize("name", FIXTURES)
def test_hits_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = hits(g, num_iters=10)
    rows = {r["id"]: (r["hub"], r["authority"]) for r in res.df.collect()}
    hub, auth = oracle.hits(src, dst, n, num_iters=10)
    assert set(rows) == set(range(n))
    got_hub = np.array([rows[i][0] for i in range(n)])
    got_auth = np.array([rows[i][1] for i in range(n)])
    np.testing.assert_allclose(got_hub, hub, atol=1e-9)
    np.testing.assert_allclose(got_auth, auth, atol=1e-9)


@pytest.mark.parametrize("name", FIXTURES)
def test_personalized_pagerank_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    seeds = [0, n // 2]
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = personalized_pagerank(g, seeds, damping=0.85, num_iters=15)
    rows = {r["id"]: r["rank"] for r in res.df.collect()}
    want = oracle.personalized_pagerank(src, dst, n, seeds,
                                        damping=0.85, num_iters=15)
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_personalized_pagerank_mass_conserved(spark):
    """With teleport+dangling returning to seeds, total mass stays 1."""
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    res = personalized_pagerank(g, [0], num_iters=10)
    total = res.df.agg({"rank": "sum"}).first()[0]
    assert abs(total - 1.0) < 1e-9


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("directed", [True, False])
def test_bfs_matches_oracle(spark, name, directed):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = bfs_distances(g, [0], directed=directed)
    got = {r["id"]: r["dist"] for r in res.df.collect()}
    want = oracle.bfs_distances(src, dst, n, [0], directed=directed)
    # engine returns reached-only; oracle marks unreachable as -1
    assert got == {i: d for i, d in enumerate(want) if d >= 0}


def test_bfs_multi_source(spark):
    src, dst, n = _arrays("doubleSquare")
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    sources = [0, n - 1]
    res = bfs_distances(g, sources, directed=True)
    got = {r["id"]: r["dist"] for r in res.df.collect()}
    want = oracle.bfs_distances(src, dst, n, sources, directed=True)
    assert got == {i: d for i, d in enumerate(want) if d >= 0}


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("k", [2, 3])
def test_k_core_matches_oracle(spark, name, k):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = k_core(g, k)
    got = {r["id"]: r["deg"] for r in res.df.collect()}
    assert got == oracle.k_core(src, dst, n, k)


def test_k_core_empty_when_k_too_large(spark):
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    res = k_core(g, 100)
    assert res.df.count() == 0


@pytest.mark.parametrize("name", FIXTURES)
def test_trust_rank_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.centrality import trust_rank
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    weights = {v: 1.0 + v % 3 for v in range(0, n, 2)}
    wdf = g.spark.createDataFrame(
        [(v, w) for v, w in weights.items()], "id long, weight double")
    res = trust_rank(g, wdf, damping=0.85, num_iters=15)
    got = {r["id"]: r["rank"] for r in res.df.collect()}
    want = oracle.trust_rank(src, dst, n, weights, num_iters=15)
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), want, atol=1e-12)


def test_trust_rank_uniform_seeds_equals_ppr(spark):
    from haskellpagerank_spark.operators.centrality import (
        personalized_pagerank, trust_rank)
    name = FIXTURES[0]
    g = from_pairs(spark, FIXTURE_EDGES[name])
    src, dst, n = _arrays(name)
    seeds = [0, n // 2]
    wdf = g.spark.createDataFrame(
        [(s, 1.0) for s in seeds], "id long, weight double")
    tr = {r["id"]: r["rank"]
          for r in trust_rank(g, wdf, num_iters=10).df.collect()}
    pr = {r["id"]: r["rank"]
          for r in personalized_pagerank(g, seeds, num_iters=10)
          .df.collect()}
    for v in range(n):
        assert tr[v] == pytest.approx(pr[v], abs=1e-12)


@pytest.mark.parametrize("name", FIXTURES)
def test_salsa_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.centrality import salsa
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = salsa(g, num_iters=8)
    rows = {r["id"]: (r["hub"], r["authority"]) for r in res.df.collect()}
    hub, auth = oracle.salsa(src, dst, n, num_iters=8)
    np.testing.assert_allclose(
        np.array([rows[v][0] for v in range(n)]), hub, atol=1e-12)
    np.testing.assert_allclose(
        np.array([rows[v][1] for v in range(n)]), auth, atol=1e-12)


def test_salsa_mass_conservation(spark):
    from haskellpagerank_spark.operators.centrality import salsa
    # the walk is stochastic: authority mass stays 1 every sweep
    name = FIXTURES[0]
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = salsa(g, num_iters=5)
    total = res.df.agg({"authority": "sum"}).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


@pytest.mark.parametrize("name", FIXTURES)
def test_katz_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.centrality import katz
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = katz(g, alpha=0.02, beta=1.0, num_iters=10)
    rows = {r["id"]: r["katz"] for r in res.df.collect()}
    want = oracle.katz(src, dst, n, alpha=0.02, beta=1.0, num_iters=10)
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("name", FIXTURES)
def test_eigenvector_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.centrality import (
        eigenvector_centrality)
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = eigenvector_centrality(g, num_iters=20)
    rows = {r["id"]: r["eigenvector"] for r in res.df.collect()}
    want = oracle.eigenvector_centrality(src, dst, n, num_iters=20)
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_allclose(got, want, atol=1e-9)

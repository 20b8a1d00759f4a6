"""Betweenness (Brandes, operators/betweenness.py) vs the NumPy oracle on
the reference fixtures, a hand-checked path graph, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.betweenness import (
    betweenness, betweenness_sql,
)
from haskellpagerank_spark.operators.graph import from_pairs

FIXTURES = sorted(n for n, e in FIXTURE_EDGES.items() if len(e) >= 4)


@pytest.mark.parametrize("name", FIXTURES)
def test_betweenness_matches_oracle(spark, name):
    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = betweenness(g, list(range(n)))
    got = {r["id"]: r["bc"] for r in res.df.collect()}
    want = oracle.betweenness(src, dst, n)
    assert set(got) == set(range(n))
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), np.array(want), atol=1e-9)


def test_betweenness_path_graph(spark):
    # directed path 0->1->2->3: bc(1) = |{0->2, 0->3}|... Brandes counts
    # each (s, t) pair's through-traffic: bc(1) = 2 (0->2, 0->3),
    # bc(2) = 2 (0->3, 1->3), endpoints 0 and 3 get 0.
    g = from_pairs(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["bc"] for r in betweenness(g, [0, 1, 2, 3]).df.collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_betweenness_split_paths(spark):
    # 0 -> {1, 2} -> 3: two equal shortest paths, each middle gets 0.5
    g = from_pairs(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = {r["id"]: r["bc"] for r in betweenness(g, [0, 1, 2, 3]).df.collect()}
    assert got == {0: 0.0, 1: 0.5, 2: 0.5, 3: 0.0}


def test_betweenness_sql_twin_matches_oracle():
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (4, 0), (3, 4)]
    src, dst, n = oracle.parse_edges(pairs)
    edges_sql = " UNION ALL ".join(
        f"SELECT {s} AS src, {d} AS dst" for s, d in pairs)
    verts_sql = " UNION ALL ".join(f"SELECT {v} AS id" for v in range(n))
    q = betweenness_sql(f"({edges_sql})", f"({verts_sql})", max_depth=6)
    got = {i: b for i, b in duckdb.sql(q).fetchall()}
    want = oracle.betweenness(src, dst, n)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-6)


# ------------------------------------ Brandes-Pich sampled pivots (r5)

@pytest.mark.parametrize("name", FIXTURES)
def test_betweenness_sampled_matches_scaled_oracle(spark, name):
    """Sampled estimate == oracle restricted to the same deterministic
    pivot set, scaled n/k with the identical operand order."""
    from haskellpagerank_spark.operators.betweenness import (
        betweenness_sampled, sampled_pivots)

    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    pivots = sampled_pivots(n, 2, 5)
    if not pivots:
        pytest.skip("no pivots at this n")
    res = betweenness_sampled(g, keep_num=2, keep_den=5)
    got = {r["id"]: r["bc"] for r in res.df.collect()}
    base = oracle.betweenness(src, dst, n, sources=pivots)
    want = [b * float(n) / float(len(pivots)) for b in base]
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), np.array(want), atol=1e-9)


def test_betweenness_sampled_p1_is_exact(spark):
    """keep_num == keep_den samples every vertex: the estimate IS the
    exact bc (scale = 1)."""
    from haskellpagerank_spark.operators.betweenness import (
        betweenness_sampled)

    pairs = FIXTURE_EDGES["myFavorite"]
    src, dst, n = oracle.parse_edges(pairs)
    g = from_pairs(spark, pairs)
    got = {r["id"]: r["bc"]
           for r in betweenness_sampled(g, 3, 3).df.collect()}
    want = oracle.betweenness(src, dst, n)
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), np.array(want), atol=1e-9)


def test_betweenness_sampled_sql_twin_matches_oracle():
    """The sources-filtered + scaled twin equals the scaled oracle on a
    hand graph — pure DuckDB, no Spark."""
    from haskellpagerank_spark.operators.betweenness import (
        betweenness_sql, sampled_pivots)

    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (4, 0), (3, 4),
             (1, 4), (3, 0)]
    src, dst, n = oracle.parse_edges(pairs)
    pivots = sampled_pivots(n, 2, 5)
    edges_sql = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS src, CAST({d} AS BIGINT) AS dst"
        for s, d in pairs)
    verts_sql = " UNION ALL ".join(
        f"SELECT CAST({v} AS BIGINT) AS id" for v in range(n))
    q = betweenness_sql(
        f"({edges_sql})", f"({verts_sql})", max_depth=6,
        sources_sql=(f"SELECT id FROM ({verts_sql}) WHERE "
                     "((id * 1103515245 + 12345) % 2147483648) % 5 < 2"),
        scale_num=float(n), scale_den=float(len(pivots)))
    got = {i: b for i, b in duckdb.sql(q).fetchall()}
    base = oracle.betweenness(src, dst, n, sources=pivots)
    for v in range(n):
        assert got[v] == pytest.approx(
            base[v] * float(n) / float(len(pivots)), abs=1e-6)


def test_betweenness_sampled_empty_pivots_raises(spark):
    from haskellpagerank_spark.operators.betweenness import (
        betweenness_sampled)

    g = from_pairs(spark, [(0, 1)])
    with pytest.raises(ValueError):
        # n = 2: ids 0 and 1 — LCG%97 < 1 keeps neither
        betweenness_sampled(g, keep_num=1, keep_den=97)

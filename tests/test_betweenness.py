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

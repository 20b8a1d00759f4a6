"""Incremental triangle counting: delta enumeration from new edges only,
exact vs the one-shot count and the NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.graph import from_edge_df, from_pairs
from haskellpagerank_spark.operators.triangles import (
    triangle_count, triangle_count_incremental)


def _count(df) -> int:
    return df.first()["n_triangles"]


def _graph(spark, pairs, n=None):
    g = from_edge_df(
        spark.createDataFrame([(int(a), int(b)) for a, b in pairs],
                              "src long, dst long"),
        num_vertices=n)
    return g


@pytest.mark.parametrize("name", ["complete", "doubleSquare", "myFavorite"])
def test_incremental_matches_full_on_fixture_split(spark, name):
    """Deterministic 2/3-vs-1/3 edge split of a fixture; incremental over
    the delta equals the one-shot count on the full graph and the oracle."""
    pairs = FIXTURE_EDGES[name]
    base = [e for i, e in enumerate(pairs) if i % 3 != 0]
    delta = [e for i, e in enumerate(pairs) if i % 3 == 0]
    if not base or not delta:
        pytest.skip("fixture too small to split")
    n = max(max(a, b) for a, b in pairs) + 1
    g_old = _graph(spark, base, n)
    prev = _count(triangle_count(g_old))
    delta_df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in delta], "src long, dst long")
    got = _count(triangle_count_incremental(g_old, delta_df, prev))

    g_full = from_pairs(spark, pairs)
    assert got == _count(triangle_count(g_full))
    src = np.array([a for a, _ in pairs])
    dst = np.array([b for _, b in pairs])
    assert got == oracle.triangle_count(src, dst, n)


def test_incremental_all_new_triangle(spark):
    """A triangle formed entirely by new edges is counted once, not three
    times (one per contributing new edge)."""
    g_old = _graph(spark, [(0, 1)], 5)
    delta = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 2)], "src long, dst long")
    assert _count(triangle_count_incremental(g_old, delta, 0)) == 1


def test_incremental_ignores_duplicate_and_selfloop_edges(spark):
    """Re-delivered old edges and self-loops contribute nothing."""
    tri = [(0, 1), (1, 2), (2, 0)]
    g_old = _graph(spark, tri, 3)
    delta = spark.createDataFrame(
        [(1, 0), (2, 2), (0, 2)], "src long, dst long")
    assert _count(triangle_count_incremental(g_old, delta, 1)) == 1


def test_incremental_hub_closure(spark):
    """New edge touching a hub: delta triangles = hub's neighbors adjacent
    to the other endpoint."""
    # hub 0 adjacent to 1..6; 7 adjacent to 1, 2; new edge (0, 7) closes
    # exactly two triangles (0-1-7, 0-2-7)
    base = [(0, i) for i in range(1, 7)] + [(7, 1), (7, 2)]
    g_old = _graph(spark, base, 8)
    prev = _count(triangle_count(g_old))
    assert prev == 0
    delta = spark.createDataFrame([(0, 7)], "src long, dst long")
    assert _count(triangle_count_incremental(g_old, delta, prev)) == 2


# --------------------------------------- DOULION sampled count (round 5)

def _lcg_keep(u, v, den, num, seed=12345):
    lo, hi = min(u, v), max(u, v)
    return ((lo * 1103515245 + hi * 12345 + seed) % 2147483648) % den < num


def _brute_sampled_count(pairs, den, num):
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    kept = [(u, v) for u, v in canon if _lcg_keep(u, v, den, num)]
    adj = {}
    for u, v in kept:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cnt = 0
    for u, v in kept:
        cnt += len(adj[u] & adj[v])
    return cnt // 3


@pytest.mark.parametrize("name", ["complete", "doubleSquare", "myFavorite",
                                  "princeton"])
def test_sampled_count_matches_brute_force(spark, name):
    """The deterministic LCG sample is bit-reproducible: the raw sampled
    count equals a pure-Python recount of the same kept-edge subgraph, and
    the estimator is exactly raw / p^3."""
    from haskellpagerank_spark.operators.triangles import (
        sampled_triangle_count)

    pairs = FIXTURE_EDGES[name]
    g = from_pairs(spark, pairs)
    row = sampled_triangle_count(g, keep_num=2, keep_den=5).first()
    want = _brute_sampled_count(pairs, 5, 2)
    assert row["n_sampled"] == want
    assert row["n_triangles_est"] == pytest.approx(want / (0.4 ** 3))


def test_sampled_count_p1_is_exact(spark):
    """keep_num == keep_den keeps every edge: the 'estimate' is the exact
    count (DOULION with p=1 degenerates to the exact kernel)."""
    from haskellpagerank_spark.operators.triangles import (
        sampled_triangle_count)

    pairs = FIXTURE_EDGES["complete"]
    g = from_pairs(spark, pairs)
    exact = _count(triangle_count(g))
    row = sampled_triangle_count(g, keep_num=7, keep_den=7).first()
    assert row["n_sampled"] == exact
    assert row["n_triangles_est"] == pytest.approx(float(exact))


def test_sampled_count_rejects_bad_rate(spark):
    from haskellpagerank_spark.operators.triangles import (
        sampled_triangle_count)

    g = from_pairs(spark, FIXTURE_EDGES["complete"])
    with pytest.raises(ValueError):
        sampled_triangle_count(g, keep_num=0, keep_den=5)
    with pytest.raises(ValueError):
        sampled_triangle_count(g, keep_num=6, keep_den=5)

"""CC / label propagation / triangles vs the NumPy oracle on the reference
fixture graphs (FIXTURES.md). North-rule requirement: 'component/label/
triangle results match exactly at convergence'."""

from __future__ import annotations

import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.components import (
    connected_components, label_propagation,
)
from haskellpagerank_spark.operators.graph import from_pairs
from haskellpagerank_spark.operators.triangles import (
    triangle_count, triangles_per_vertex,
)

ALL_FIXTURES = sorted(FIXTURE_EDGES)


def _oracle_arrays(name):
    return oracle.parse_edges(FIXTURE_EDGES[name])


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_connected_components_exact(spark, name):
    src, dst, n = _oracle_arrays(name)
    if n == 0:
        return
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = connected_components(g)
    got = {r["id"]: r["component"] for r in res.df.collect()}
    want = dict(enumerate(oracle.connected_components(src, dst, n)))
    assert got == want


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_label_propagation_exact(spark, name):
    src, dst, n = _oracle_arrays(name)
    if n == 0:
        return
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = label_propagation(g, num_iters=5)
    got = {r["id"]: r["label"] for r in res.df.collect()}
    want = dict(enumerate(oracle.label_propagation(src, dst, n, num_iters=5)))
    assert got == want


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_triangle_count_exact(spark, name):
    src, dst, n = _oracle_arrays(name)
    if n == 0:
        return
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = triangle_count(g).first()["n_triangles"]
    assert got == oracle.triangle_count(src, dst, n)


def test_triangles_per_vertex(spark):
    # complete graph K5: every vertex is in C(4,2)=6 triangles
    g = from_pairs(spark, FIXTURE_EDGES["complete"])
    rows = {r["id"]: r["n_triangles"] for r in triangles_per_vertex(g).collect()}
    assert rows == {i: 6 for i in range(5)}
    # doubleSquare (two 4-cycles glued): triangle-free
    g2 = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    rows2 = {r["id"]: r["n_triangles"] for r in triangles_per_vertex(g2).collect()}
    assert rows2 == {i: 0 for i in range(8)}


def test_cc_component_is_min_id_invariant(spark):
    g = from_pairs(spark, FIXTURE_EDGES["simpleGraphOneNodeMissing"])
    res = connected_components(g)
    got = {r["id"]: r["component"] for r in res.df.collect()}
    # vertex 0 isolated; 1-2 connected
    assert got == {0: 0, 1: 1, 2: 1}
    assert res.metrics, "metrics recorded per iteration"


def test_cc_checkpoint_resume(spark, tmp_path):
    """Kill-and-resume determinism: resumed run lands on identical labels."""
    pairs = FIXTURE_EDGES["doubleSquare"] + [(8, 9), (9, 10)]
    g = from_pairs(spark, pairs)
    full = connected_components(g)
    want = {r["id"]: r["component"] for r in full.df.collect()}

    ckdir = str(tmp_path / "cc")
    # snapshot every iteration, then resume from the manifest
    first = connected_components(g, checkpoint_dir=ckdir, checkpoint_interval=1)
    resumed = connected_components(g, checkpoint_dir=ckdir, checkpoint_interval=1)
    assert {r["id"]: r["component"] for r in first.df.collect()} == want
    assert {r["id"]: r["component"] for r in resumed.df.collect()} == want
    # resume skipped already-completed iterations
    assert resumed.iterations >= first.iterations


def test_lp_checkpoint_resume(spark, tmp_path):
    """Regression: label_propagation checkpoints (id, label) rows, and its
    resume guard must require exactly those columns — an (id, component)
    guard made the operator unable to resume its own checkpoints (it
    raised the cross-strategy ValueError on every restart)."""
    pairs = FIXTURE_EDGES["doubleSquare"] + [(8, 9), (9, 10)]
    g = from_pairs(spark, pairs)
    want = {r["id"]: r["label"]
            for r in label_propagation(g, num_iters=4).df.collect()}

    ckdir = str(tmp_path / "lp")
    first = label_propagation(g, num_iters=4, checkpoint_dir=ckdir,
                              checkpoint_interval=1)
    resumed = label_propagation(g, num_iters=4, checkpoint_dir=ckdir,
                                checkpoint_interval=1)
    assert {r["id"]: r["label"] for r in first.df.collect()} == want
    assert {r["id"]: r["label"] for r in resumed.df.collect()} == want

"""Driver-local CC/LP tier: identical output to the distributed paths."""

import numpy as np
import pytest

from haskellpagerank_spark import fixtures, oracle
from haskellpagerank_spark.operators import graph as G
from haskellpagerank_spark.operators.components import (
    connected_components, connected_components_auto, label_propagation,
    label_propagation_auto)
from haskellpagerank_spark.operators.components_local import (
    connected_components_local, label_propagation_local)


def as_map(df, col):
    return {r["id"]: r[col] for r in df.collect()}


@pytest.mark.parametrize("name", ["doubleSquare", "myFavorite", "princeton",
                                  "sinkAndSource", "edgeToSelf", "hub"])
def test_cc_local_matches_distributed_and_oracle(spark, name):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])
    local = as_map(connected_components_local(g).df, "component")
    dist = as_map(connected_components(g).df, "component")
    assert local == dist, name
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
    want = oracle.connected_components(src, dst, n)
    assert [local[i] for i in range(n)] == want, name


@pytest.mark.parametrize("name", ["doubleSquare", "myFavorite", "princeton"])
def test_lp_local_matches_distributed_and_oracle(spark, name):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])
    local = as_map(label_propagation_local(g, num_iters=5).df, "label")
    dist = as_map(label_propagation(g, num_iters=5).df, "label")
    assert local == dist, name
    src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
    want = oracle.label_propagation(src, dst, n, num_iters=5)
    assert [local[i] for i in range(n)] == want, name


def test_cc_local_high_diameter_path(spark):
    # a 300-vertex path: pointer jumping must collapse it in O(log) rounds,
    # not O(diameter)
    edges = [(i, i + 1) for i in range(299)]
    g = G.from_pairs(spark, edges)
    res = connected_components_local(g)
    comp = as_map(res.df, "component")
    assert set(comp.values()) == {0}
    assert res.iterations <= 12


def test_auto_dispatch_picks_local_tier(spark):
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["doubleSquare"])
    cc = connected_components_auto(g)
    assert cc.metrics and cc.metrics[0].extra.get("strategy") == "local"
    lp = label_propagation_auto(g, num_iters=3)
    assert lp.metrics and lp.metrics[0].extra.get("strategy") == "local"


def test_cc_local_isolated_vertices(spark):
    # dense id space with isolated vertex 0 (simpleGraphOneNodeMissing)
    g = G.from_pairs(spark, fixtures.FIXTURE_EDGES["simpleGraphOneNodeMissing"])
    comp = as_map(connected_components_local(g).df, "component")
    assert comp[0] == 0 and comp[1] == 1 and comp[2] == 1

"""Coloring kernels vs the reference's exact golden vectors
(TestGraphColoring.hs, TestGraphColoring2Dist.hs, TestGraphColoringNonDet.hs)
and validity invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haskellpagerank_spark.fixtures import (
    DIST2_GOLDEN, FIXTURE_EDGES, GREEDY_COLORING_GOLDEN, JP_GOLDEN,
)
from haskellpagerank_spark.operators.coloring import (
    color_buckets, color_counts, distance2_coloring, greedy_coloring,
    jones_plassmann, num_colors, speculative_coloring, validate_coloring,
)
from haskellpagerank_spark.operators.graph import from_pairs


def _vector(df, n):
    got = {r["id"]: r["color"] for r in df.collect()}
    return [got[i] for i in range(n)]


@pytest.mark.parametrize("name,want", sorted(GREEDY_COLORING_GOLDEN.items()))
def test_greedy_golden(spark, name, want):
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = greedy_coloring(g)
    assert _vector(res.df, g.num_vertices) == want


@pytest.mark.parametrize("name,pri,want", JP_GOLDEN)
def test_jones_plassmann_golden(spark, name, pri, want):
    g = from_pairs(spark, FIXTURE_EDGES[name])
    pri_df = spark.createDataFrame(
        list(enumerate(pri)), schema="id LONG, priority LONG"
    )
    res = jones_plassmann(g, priorities=pri_df)
    assert _vector(res.df, g.num_vertices) == want


@pytest.mark.parametrize("name,want", sorted(DIST2_GOLDEN.items()))
def test_distance2_golden(spark, name, want):
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = distance2_coloring(g)
    assert _vector(res.df, g.num_vertices) == want


@pytest.mark.parametrize(
    "name", ["singleEdge", "square", "doubleSquare", "hub", "complete",
             "myFavorite", "princeton"]
)
def test_speculative_valid(spark, name):
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = speculative_coloring(g)
    assert validate_coloring(g, res.df) == 0
    # palette no worse than max-degree+1
    colors = res.df
    assert num_colors(colors) <= g.num_vertices


def test_jp_hashed_priorities_valid(spark):
    g = from_pairs(spark, FIXTURE_EDGES["complete"])
    res = jones_plassmann(g, seed=7)
    assert validate_coloring(g, res.df) == 0
    assert num_colors(res.df) == 5  # K5 needs exactly 5


def test_buckets_and_counts(spark):
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    res = greedy_coloring(g)
    buckets = {r["color"]: r["vertex_ids"] for r in color_buckets(res.df).collect()}
    assert buckets == {1: [0, 3, 5, 6], 2: [1, 2, 4, 7]}
    counts = {r["color"]: r["n"] for r in color_counts(res.df).collect()}
    assert counts == {1: 4, 2: 4}


def test_jp_valid_on_cs_graph(spark):
    """JP on a non-fixture graph (sf0.001 cs, ~160 vertices): proper
    coloring (no monochromatic edge) and every vertex colored >= 1."""
    from haskellpagerank_spark.operators.coloring import (jones_plassmann,
                                                          validate_coloring)
    from haskellpagerank_spark.sources.tpch_graph import cs_graph
    g = cs_graph(spark, "/root/testdata/sf0.001")
    res = jones_plassmann(g, seed=42)
    assert validate_coloring(g, res.df) == 0
    from pyspark.sql import functions as F
    assert res.df.where(F.col("color") < 1).count() == 0
    assert res.df.count() == g.num_vertices

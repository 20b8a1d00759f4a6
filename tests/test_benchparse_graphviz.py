"""benchmarkparser parity (Main.hs:120-183) + Graphviz DOT sink."""

import math

import pytest

from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.functions import benchparse as B
from haskellpagerank_spark.operators.coloring import greedy_coloring
from haskellpagerank_spark.operators.graph import from_pairs
from haskellpagerank_spark.sources.graphviz import to_dot


@pytest.fixture(scope="module")
def bench(spark):
    rows = [
        ("small/double_square/pagerank", 2.0),
        ("small/double_square/pagerank", 4.0),   # repeated run -> averaged
        ("small/double_square/prism", 1.0),
        ("small/rmat_test/pagerank", 10.0),
        ("small/rmat_test/prism", 30.0),
    ]
    return B.parse_bench_names(
        spark.createDataFrame(rows, B.BENCH_SCHEMA))


def test_parse_and_average(bench):
    avg = B.average_results(bench).toPandas()
    assert set(avg.graph) == {"double-square", "rmat-test"}  # latexified
    row = avg[(avg.graph == "double-square") & (avg.method == "pagerank")]
    assert row.iloc[0]["mean"] == 3.0


def test_feature_scale(bench):
    out = B.feature_scale(B.average_results(bench)).toPandas()
    ds = out[out.graph == "double-square"].set_index("method")["scaled"]
    assert ds["prism"] == 0.0 and ds["pagerank"] == 1.0


def test_normalize_l2(bench):
    out = B.normalize_l2(B.average_results(bench)).toPandas()
    rm = out[out.graph == "rmat-test"].set_index("method")["normalized"]
    norm = math.sqrt(10.0**2 + 30.0**2)
    assert rm["pagerank"] == pytest.approx(10.0 / norm)
    assert rm["prism"] == pytest.approx(30.0 / norm)


def test_pivot(bench):
    wide = B.pivot_methods(B.average_results(bench)).toPandas()
    assert {"graph", "pagerank", "prism"} <= set(wide.columns)
    assert len(wide) == 2


def test_dot_sink(spark):
    g = from_pairs(spark, FIXTURE_EDGES["square"])
    colors = greedy_coloring(g).df
    dot = to_dot(g.edges, colors)
    assert dot.startswith("digraph g {")
    assert "0 -> 1;" in dot
    assert 'fillcolor' in dot and '0:1' in dot

def test_dot_sink_refuses_large(spark):
    big = spark.range(20000).selectExpr("id as src", "id + 1 as dst")
    with pytest.raises(ValueError):
        to_dot(big)

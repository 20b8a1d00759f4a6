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


def test_png_render_sink(spark, tmp_path):
    """makeImage.sh parity (dot -Tpng) without graphviz: rasterize the
    colored doubleSquare graph and verify pixels through the engine's own
    PNG decoder — node centers carry the exact palette RGB of their color,
    edges leave non-background pixels, the background stays white."""
    import numpy as np
    from haskellpagerank_spark.functions.png import decode_png
    from haskellpagerank_spark.sources.graphviz import (
        _PALETTE, _PALETTE_RGB, _layout_circle, render_png, write_png)

    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    colors = greedy_coloring(g).df
    data = render_png(g.edges, colors, size=320, node_radius=8)
    img = decode_png(data)
    assert img.shape == (320, 320, 3)
    assert tuple(img[2, 2]) == (255, 255, 255)          # background

    color_of = {r["id"]: r["color"] for r in colors.collect()}
    pos = _layout_circle(sorted(color_of), 320, 8)
    for v, (x, y) in pos.items():
        want = _PALETTE_RGB[_PALETTE[color_of[v] % len(_PALETTE)]]
        assert tuple(img[y, x]) == want, f"vertex {v}"

    # an edge midpoint between two nodes is painted (gray body or black
    # direction head), not background
    (x0, y0), (x1, y1) = pos[0], pos[1]
    mid = img[(y0 + y1) // 2, (x0 + x1) // 2]
    assert tuple(mid) in {(96, 96, 96), (0, 0, 0)}

    out = tmp_path / "graph.png"
    write_png(str(out), g.edges, colors)
    assert decode_png(out.read_bytes()).shape == (480, 480, 3)


def test_png_render_refuses_large(spark):
    from haskellpagerank_spark.sources import graphviz as GV
    big = spark.range(GV.MAX_RENDER_VERTICES + 1).selectExpr(
        "id as src", "id + 1 as dst")
    with pytest.raises(ValueError, match="refusing"):
        GV.render_png(big)

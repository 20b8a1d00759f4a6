"""Weighted-table PageRank (run_pagerank_weighted_table) vs an inline
reference implementation — arbitrary vertex keys (strings), weighted
transitions, dangling redistribution."""

import pytest

from haskellpagerank_spark.operators.pagerank import (
    run_pagerank_weighted_table,
)


def _ref_wpr(edges, iters, d=0.85):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    ow = {}
    for (s, _), w in edges.items():
        ow[s] = ow.get(s, 0.0) + w
    r = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        msg = {v: 0.0 for v in verts}
        for (s, t), w in edges.items():
            msg[t] += (w / ow[s]) * r[s]
        dang = sum(r[v] for v in verts if v not in ow)
        r = {v: (1.0 - d) / n + d * (msg[v] + dang / n) for v in verts}
    return r


@pytest.mark.parametrize("iters", [1, 5, 10])
def test_weighted_table_pagerank_matches_reference(spark, iters):
    edges = {("a.com", "b.com"): 3.0, ("a.com", "c.com"): 1.0,
             ("b.com", "c.com"): 2.0, ("c.com", "a.com"): 5.0,
             ("b.com", "d.com"): 1.0}  # d.com dangles
    df = spark.createDataFrame(
        [(s, t, w) for (s, t), w in edges.items()],
        "src string, dst string, weight double")
    got = {r["vertex"]: r["rank"]
           for r in run_pagerank_weighted_table(
               df, num_iters=iters).collect()}
    want = _ref_wpr(edges, iters)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

"""Incremental connected components: warm start from previous converged
labels, frontier seeded by the disagreement scan, exact vs cold recompute
and the NumPy oracle."""

from __future__ import annotations

import numpy as np

from haskellpagerank_spark import oracle
from haskellpagerank_spark.operators.components import (
    connected_components, connected_components_incremental)
from haskellpagerank_spark.operators.graph import from_edge_df


def _cc_dict(res):
    return {r["id"]: r["component"] for r in res.df.collect()}


def _graph(spark, pairs, n):
    return from_edge_df(
        spark.createDataFrame(pairs, "src long, dst long"), num_vertices=n)


def test_incremental_matches_cold_after_merge(spark):
    # two chains 0-1-2 and 3-4-5, plus isolated 6..9
    base = [(0, 1), (1, 2), (3, 4), (4, 5)]
    n = 10
    prev = connected_components(_graph(spark, base, n))
    assert _cc_dict(prev) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3,
                              6: 6, 7: 7, 8: 8, 9: 9}

    # batch 2 bridges the chains and attaches an isolated vertex
    new = base + [(2, 3), (9, 5)]
    g2 = _graph(spark, new, n)
    inc = connected_components_incremental(g2, prev.df)
    cold = connected_components(g2)
    assert _cc_dict(inc) == _cc_dict(cold)
    src = np.array([e[0] for e in new])
    dst = np.array([e[1] for e in new])
    assert _cc_dict(inc) == dict(
        enumerate(oracle.connected_components(src, dst, n)))
    # the disagreement scan seeded only the disturbed endpoints, not |V|
    assert 0 < inc.metrics[0].extra["frontier_init"] < n


def test_incremental_noop_on_converged_graph(spark):
    base = [(0, 1), (1, 2), (3, 4)]
    g = _graph(spark, base, 5)
    prev = connected_components(g)
    inc = connected_components_incremental(g, prev.df)
    assert inc.iterations == 0
    assert inc.metrics[0].extra["frontier_init"] == 0
    assert _cc_dict(inc) == _cc_dict(prev)


def test_incremental_new_vertices_default_to_own_id(spark):
    # prev labels cover only vertices 0..2; the new graph adds 3 and 4,
    # 4 joins component 0 via a new edge, 3 stays isolated
    prev = connected_components(_graph(spark, [(0, 1), (1, 2)], 3))
    g2 = _graph(spark, [(0, 1), (1, 2), (4, 0)], 5)
    inc = connected_components_incremental(g2, prev.df)
    assert _cc_dict(inc) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 0}


def test_maintain_components_over_streamed_batches(spark, tmp_path):
    """Stream two edge-list batches; warm maintenance after batch 2 equals
    a cold auto recompute, with a sub-|V| frontier seed."""
    import os

    from haskellpagerank_spark.streaming.ingest import (maintain_components,
                                                        stream_edge_lists)
    src_dir, sink, ck = (str(tmp_path / d) for d in ("in", "edges", "ck"))
    os.makedirs(src_dir)

    def ingest():
        q = (stream_edge_lists(spark, src_dir)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    n = 30
    with open(f"{src_dir}/b1.txt", "w") as f:
        f.write("".join(f"{i} {i + 1}\n" for i in range(0, 14)))   # 0..14
        f.write("".join(f"{i} {i + 1}\n" for i in range(15, 29)))  # 15..29
    ingest()
    r1 = maintain_components(spark, sink, num_vertices=n)
    with open(f"{src_dir}/b2.txt", "w") as f:
        f.write("14 15\n")  # bridge the halves
    ingest()
    warm = maintain_components(spark, sink, num_vertices=n,
                               prev_labels=r1.df)
    assert all(c == 0 for c in _cc_dict(warm).values())
    assert warm.metrics[0].extra["frontier_init"] == 2

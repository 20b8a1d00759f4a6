"""Parser / transpose / amendSinks contracts.

Goldens from /root/reference/internalutil/Test/Data/Graph/TestGraphParser.hs
(see FIXTURES.md §3.6).
"""

import numpy as np

from haskellpagerank_spark import fixtures, oracle
from haskellpagerank_spark.operators import graph as G


def adjacency(g: G.Graph) -> dict[int, list[int]]:
    """Collect the edge DF into {src: sorted [dst, ...]} (multiset)."""
    adj: dict[int, list[int]] = {v: [] for v in range(g.num_vertices)}
    for row in g.edges.collect():
        adj[row["src"]].append(row["dst"])
    return {k: sorted(v) for k, v in adj.items()}


def fixture_graph(spark, name: str) -> G.Graph:
    return G.from_pairs(spark, fixtures.FIXTURE_EDGES[name])


def test_square_adjacency_and_invert(spark):
    g = fixture_graph(spark, "square")
    assert g.num_vertices == 4
    assert adjacency(g) == {0: [1, 3], 1: [2], 2: [3], 3: []}
    inv = g.with_edges(G.invert(g.edges))
    assert adjacency(inv) == {0: [], 1: [0], 2: [1], 3: [0, 2]}


def test_self_loop_dropped_dense_ids(spark):
    g = fixture_graph(spark, "edgeToSelf")
    assert g.num_vertices == 3  # dense 0..2 even though 0's only edge dropped
    assert adjacency(g) == {0: [], 1: [2], 2: []}


def test_big_numbers_dense_contract(spark):
    g = fixture_graph(spark, "bigNumbers")
    assert g.num_vertices == 8  # ids 0..3 isolated but present
    deg = {r["id"]: r["deg"] for r in G.out_degrees(g).collect()}
    assert deg == {0: 0, 1: 0, 2: 0, 3: 0, 4: 2, 5: 1, 6: 1, 7: 0}


def test_amend_sinks_square(spark):
    g = G.amend_sinks(fixture_graph(spark, "square"))
    adj = adjacency(g)
    assert adj[3] == [0, 2]  # sink 3 reflected (TestGraphParser.hs:123-135)
    inv = adjacency(g.with_edges(G.invert(g.edges)))
    assert inv[0] == [3]
    assert inv[2] == [1, 3]


def test_amend_sinks_isolated_unchanged(spark):
    g = G.amend_sinks(fixture_graph(spark, "bigNumbers"))
    adj = adjacency(g)
    for v in range(4):
        assert adj[v] == []  # isolated vertices gain nothing
    assert adj[7] == [4, 6]  # sink 7 had in-edges from 6 and 4


def test_amend_sinks_matches_oracle_all_fixtures(spark):
    for name, pairs in fixtures.FIXTURE_EDGES.items():
        src, dst, n = oracle.parse_edges(pairs)
        asrc, adst = oracle.amend_sinks(src, dst, n)
        want = sorted(zip(asrc.tolist(), adst.tolist()))
        g = G.amend_sinks(G.from_pairs(spark, pairs))
        got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
        assert got == want, name


def test_sinks_and_histogram(spark):
    g = fixture_graph(spark, "hub")
    assert sorted(r["id"] for r in G.sinks(g).collect()) == [1, 2, 3]
    hist = {r["deg"]: r["n_vertices"] for r in G.degree_histogram(g).collect()}
    assert hist == {0: 3, 3: 1}


def test_read_edge_list_space_and_tab(spark, tmp_path):
    for sep in (" ", "\t"):
        p = tmp_path / f"g_{ord(sep)}.txt"
        p.write_text(fixtures.fixture_text("doubleSquare", sep=sep))
        g = G.read_edge_list(spark, str(p))
        assert g.num_vertices == 8
        src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES["doubleSquare"])
        assert sorted((r["src"], r["dst"]) for r in g.edges.collect()) == sorted(
            zip(src.tolist(), dst.tolist())
        )


def test_duplicate_edges_kept(spark):
    g = G.from_pairs(spark, [(0, 1), (0, 1), (1, 2)])
    assert adjacency(g)[0] == [1, 1]
    deg = {r["id"]: r["deg"] for r in G.out_degrees(g).collect()}
    assert deg[0] == 2


def test_merge_undirected(spark):
    g = G.merge_undirected(fixture_graph(spark, "singleEdge"))
    assert sorted((r["src"], r["dst"]) for r in g.edges.collect()) == [
        (0, 1), (1, 0)]
    canon = G.undirected_simple_edges(fixture_graph(spark, "singleEdge"),
                                      canonical=True)
    assert [(r["src"], r["dst"]) for r in canon.collect()] == [(0, 1)]


def test_oracle_pagerank_sums_to_one():
    # sanity-check the oracle itself against the reference invariant
    for name in fixtures.PAGERANK_FIXTURES:
        src, dst, n = oracle.parse_edges(fixtures.FIXTURE_EDGES[name])
        asrc, adst = oracle.amend_sinks(src, dst, n)
        pr = oracle.pagerank_jacobi(asrc, adst, n, damping=0.15, eps=1e-4,
                                    init=1.0)
        assert 0.99 <= float(np.sum(pr)) <= 1.01, name


def test_src_frequencies_square(spark):
    """frequency (EdgeArray.hs:66-67): per-source occurrence counts; the
    reference's output is the count list in ascending-src order."""
    g = fixture_graph(spark, "square")
    rows = G.src_frequencies(g.edges).orderBy("src").collect()
    assert [(r["src"], r["n"]) for r in rows] == [(0, 2), (1, 1), (2, 1)]
    assert [r["n"] for r in rows] == [2, 1, 1]  # the Haskell [Int] view


def test_src_frequencies_counts_duplicates(spark):
    df = spark.createDataFrame(
        [(4, 5), (4, 5), (4, 6), (7, 4)], schema="src LONG, dst LONG")
    rows = G.src_frequencies(df).orderBy("src").collect()
    assert [(r["src"], r["n"]) for r in rows] == [(4, 3), (7, 1)]


def test_degree_ccdf_matches_histogram(spark):
    """CCDF(deg) = sum of histogram counts for degrees >= deg; CCDF at the
    minimum observed degree equals |V|."""
    from haskellpagerank_spark.operators.graph import (
        degree_ccdf, degree_histogram, from_pairs)

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (4, 0)]
    g = from_pairs(spark, pairs)
    hist = {r["deg"]: r["n_vertices"]
            for r in degree_histogram(g).collect()}
    got = {r["deg"]: r["n_ge"] for r in degree_ccdf(g).collect()}
    assert set(got) == set(hist)
    for d in hist:
        assert got[d] == sum(v for k, v in hist.items() if k >= d)
    assert got[min(hist)] == sum(hist.values()) == g.num_vertices

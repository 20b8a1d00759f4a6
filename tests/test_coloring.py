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


@pytest.mark.parametrize("name,want", sorted(GREEDY_COLORING_GOLDEN.items()))
def test_bounded_equals_greedy_at_tight_palette(spark, name, want):
    """graphColoring (bounded palette, GraphColoring.hs:319-336) with
    palette == chromatic number of the greedy run reproduces greedy
    exactly — the bound is tight but never binds."""
    from haskellpagerank_spark.operators.coloring import bounded_coloring
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = bounded_coloring(g, num_colors=max(want))
    assert _vector(res.df, g.num_vertices) == want


@pytest.mark.parametrize("name,palette", [("complete", 4), ("square", 1)])
def test_bounded_palette_exhaustion_raises(spark, name, palette):
    from haskellpagerank_spark.operators.coloring import bounded_coloring
    g = from_pairs(spark, FIXTURE_EDGES[name])
    with pytest.raises(RuntimeError, match="palette"):
        bounded_coloring(g, num_colors=palette)


def test_color_layout_1d_double_square(spark):
    """getGraphColoring1D' layout on doubleSquare: greedy colors
    [1,2,2,1,2,1,1,2] -> bucket 1 = ids {0,3,5,6} at pos 0..3, bucket 2 =
    ids {1,2,4,7} at pos 4..7 (ascending id inside a bucket)."""
    from haskellpagerank_spark.operators.coloring import color_layout_1d
    g = from_pairs(spark, FIXTURE_EDGES["doubleSquare"])
    out = color_layout_1d(greedy_coloring(g).df)
    rows = {r["id"]: (r["color"], r["pos"], r["start"], r["length"])
            for r in out.collect()}
    assert rows == {
        0: (1, 0, 0, 4), 3: (1, 1, 0, 4), 5: (1, 2, 0, 4), 6: (1, 3, 0, 4),
        1: (2, 4, 4, 4), 2: (2, 5, 4, 4), 4: (2, 6, 4, 4), 7: (2, 7, 4, 4),
    }


def test_color_layout_1d_is_contiguous_permutation(spark):
    from haskellpagerank_spark.operators.coloring import color_layout_1d
    g = from_pairs(spark, FIXTURE_EDGES["myFavorite"])
    out = color_layout_1d(greedy_coloring(g).df).collect()
    assert sorted(r["pos"] for r in out) == list(range(g.num_vertices))
    by_color = {}
    for r in out:
        by_color.setdefault(r["color"], []).append(r)
    for c, rs in by_color.items():
        poss = sorted(r["pos"] for r in rs)
        start, length = rs[0]["start"], rs[0]["length"]
        assert poss == list(range(start, start + length))
        assert len(rs) == length


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_every_strategy_proper_on_random_graphs(spark, seed):
    """Randomized invariant across ALL four strategies on G(n,p) graphs:
    every vertex gets a color >= 1, no edge is monochromatic, and for
    distance-2 coloring additionally no two vertices sharing a neighbor
    get the same color — the properties the golden vectors can't probe
    beyond their fixed topologies."""
    import random
    rng = random.Random(seed)
    n = rng.randint(12, 24)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.18]
    # keep every vertex present so the colored-count check is exact
    pairs += [(i, (i + 1) % n) for i in range(n)]
    g = from_pairs(spark, pairs)

    for strat in (greedy_coloring, speculative_coloring,
                  lambda gg: jones_plassmann(gg, seed=seed)):
        res = strat(g)
        assert validate_coloring(g, res.df) == 0
        assert res.df.where(F.col("color") < 1).count() == 0
        assert res.df.count() == g.num_vertices

    res2 = distance2_coloring(g)
    assert validate_coloring(g, res2.df) == 0
    # distance-2 property checked independently of the operator's own
    # machinery: undirected 2-hop pairs must be bichromatic
    und = g.edges.selectExpr("src", "dst").union(
        g.edges.selectExpr("dst as src", "src as dst")).distinct()
    two_hop = (und.alias("a").join(und.alias("b"),
                                   F.col("a.dst") == F.col("b.src"))
               .where(F.col("a.src") != F.col("b.dst"))
               .select(F.col("a.src").alias("u"),
                       F.col("b.dst").alias("v")))
    c = res2.df
    conflicts = (two_hop
                 .join(c.selectExpr("id as u", "color as cu"), "u")
                 .join(c.selectExpr("id as v", "color as cv"), "v")
                 .where(F.col("cu") == F.col("cv")).count())
    assert conflicts == 0


# ------------------------------------------------------- Luby MIS (round 5)

def _mis_vector(df, n):
    got = {r["id"]: r["in_mis"] for r in df.collect()}
    return [got[i] for i in range(n)]


@pytest.mark.parametrize(
    "name", ["singleEdge", "square", "doubleSquare", "hub", "complete",
             "myFavorite", "princeton"]
)
def test_mis_matches_sequential_greedy_on_fixtures(spark, name):
    """Deterministic Luby fixpoint == sequential greedy in priority order
    (the NumPy oracle), on every bundled fixture, under hashed priorities
    re-used identically in both."""
    from haskellpagerank_spark import oracle
    from haskellpagerank_spark.operators.coloring import (
        maximal_independent_set)

    g = from_pairs(spark, FIXTURE_EDGES[name])
    pri_rows = (
        g.vertices()
        .select("id", F.xxhash64(F.col("id"), F.lit(7)).alias("priority"))
        .collect())
    pri = [0] * g.num_vertices
    for r in pri_rows:
        pri[r["id"]] = r["priority"]
    pri_df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pri)], schema="id LONG, priority LONG")
    res = maximal_independent_set(g, priorities=pri_df)
    src = [a for a, _ in FIXTURE_EDGES[name]]
    dst = [b for _, b in FIXTURE_EDGES[name]]
    want = oracle.greedy_mis(src, dst, g.num_vertices, pri)
    assert _mis_vector(res.df, g.num_vertices) == want


@pytest.mark.parametrize("seed", [5, 17, 41])
def test_mis_invariants_and_jp_color1_on_random_graphs(spark, seed):
    """Randomized G(n,p): (a) the MIS is independent (no edge inside),
    (b) maximal (every outside vertex has a MIS neighbor), (c) equals the
    sequential greedy oracle, and (d) equals the color-1 class of
    Jones-Plassmann under the same priorities — the theorem the DuckDB
    gate twin (sql_twins.mis_sql) relies on."""
    import random

    from haskellpagerank_spark import oracle
    from haskellpagerank_spark.operators.coloring import (
        maximal_independent_set)

    rng = random.Random(seed)
    n = rng.randint(12, 26)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.15]
    pairs += [(i, (i + 1) % n) for i in range(n)]
    g = from_pairs(spark, pairs)
    pri = [rng.randrange(1 << 20) for _ in range(n)]
    pri_df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pri)], schema="id LONG, priority LONG")

    res = maximal_independent_set(g, priorities=pri_df)
    vec = _mis_vector(res.df, n)
    # (a) independence + (b) maximality against the undirected adjacency
    adj = [set() for _ in range(n)]
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    for v in range(n):
        if vec[v]:
            assert not any(vec[u] for u in adj[v]), f"edge inside MIS at {v}"
        else:
            assert any(vec[u] for u in adj[v]), f"{v} addable -> not maximal"
    # (c) oracle parity
    src = [a for a, b in pairs]
    dst = [b for a, b in pairs]
    assert vec == oracle.greedy_mis(src, dst, n, pri)
    # (d) JP color-1 class
    jp = jones_plassmann(g, priorities=pri_df)
    jp_vec = _vector(jp.df, n)
    assert vec == [1 if c == 1 else 0 for c in jp_vec]


# ------------------------------------------- greedy maximal matching (r5)

def _matched_pairs(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


def _lcg_edge_pri(u, v):
    return (u * 1103515245 + v * 12345 + 12345) % 2147483648


@pytest.mark.parametrize(
    "name", ["singleEdge", "square", "doubleSquare", "hub", "complete",
             "myFavorite", "princeton"]
)
def test_matching_matches_sequential_greedy_on_fixtures(spark, name):
    """Local-min-rounds fixpoint == sequential greedy over canonical edges
    in (priority, src, dst) order (the NumPy oracle), on every bundled
    fixture, under the gate's LCG edge priority."""
    from haskellpagerank_spark import oracle
    from haskellpagerank_spark.operators.coloring import maximal_matching

    g = from_pairs(spark, FIXTURE_EDGES[name])
    pri_col = ((F.col("src") * F.lit(1103515245) + F.col("dst") * F.lit(12345)
                + F.lit(12345)) % F.lit(2147483648))
    res = maximal_matching(g, priority_col=pri_col)
    src = [a for a, _ in FIXTURE_EDGES[name]]
    dst = [b for _, b in FIXTURE_EDGES[name]]
    canon = sorted({(min(a, b), max(a, b))
                    for a, b in zip(src, dst) if a != b})
    pri = {(u, v): _lcg_edge_pri(u, v) for u, v in canon}
    assert _matched_pairs(res.df) == oracle.greedy_matching(src, dst, pri)


@pytest.mark.parametrize("seed", [5, 17, 41])
def test_matching_invariants_on_random_graphs(spark, seed):
    """Randomized G(n,p): (a) matched edges are vertex-disjoint, (b) the
    matching is maximal (every unmatched canonical edge touches a matched
    vertex), (c) equals the sequential greedy oracle under the same
    priorities."""
    import random

    from haskellpagerank_spark import oracle
    from haskellpagerank_spark.operators.coloring import maximal_matching

    rng = random.Random(seed)
    n = rng.randint(12, 26)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.15]
    pairs += [(i, (i + 1) % n) for i in range(n)]
    g = from_pairs(spark, pairs)
    pri_col = ((F.col("src") * F.lit(1103515245) + F.col("dst") * F.lit(12345)
                + F.lit(12345)) % F.lit(2147483648))
    res = maximal_matching(g, priority_col=pri_col)
    matched = _matched_pairs(res.df)
    # (a) vertex-disjoint
    used = [v for e in matched for v in e]
    assert len(used) == len(set(used)), "matched edges share a vertex"
    # (b) maximality over the canonical undirected simple graph
    canon = sorted({(min(a, b), max(a, b))
                    for a, b in pairs if a != b})
    used_set = set(used)
    for u, v in canon:
        if u not in used_set and v not in used_set:
            raise AssertionError(f"edge ({u},{v}) addable -> not maximal")
    # (c) oracle parity
    src = [a for a, b in pairs]
    dst = [b for a, b in pairs]
    pri = {(u, v): _lcg_edge_pri(u, v) for u, v in canon}
    assert matched == oracle.greedy_matching(src, dst, pri)


def test_matching_self_loops_only_is_empty(spark):
    """A graph whose only edges are self-loops has no canonical (u < v)
    edge: zero rounds, empty matching, stable (src, dst) schema."""
    from haskellpagerank_spark.operators.coloring import maximal_matching

    g = from_pairs(spark, [(0, 0), (1, 1), (2, 2)])
    res = maximal_matching(g)
    assert res.iterations == 0
    assert res.df.columns == ["src", "dst"]
    assert res.df.count() == 0


def test_matching_star_is_single_edge(spark):
    """On a star every edge shares the hub, so exactly one edge (the
    minimum-priority one) survives, in one round."""
    from haskellpagerank_spark.operators.coloring import maximal_matching

    g = from_pairs(spark, [(0, i) for i in range(1, 8)])
    res = maximal_matching(g)
    assert res.iterations == 1
    rows = res.df.collect()
    assert len(rows) == 1 and rows[0]["src"] == 0

"""Structure analytics (clustering coefficient, co-citation, SCC, bow-tie,
SSSP, harmonic centrality) vs the NumPy oracle on the reference fixture
graphs (FIXTURES.md). Engine extensions — textbook semantics, deterministic,
exact-matchable."""

from __future__ import annotations

import numpy as np
import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.graph import from_pairs
from haskellpagerank_spark.operators.structure import (
    bibliographic_coupling, bowtie, clustering_coefficient, cocitation,
    harmonic_centrality, sssp, strongly_connected_components,
)

FIXTURES = sorted(n for n, e in FIXTURE_EDGES.items() if len(e) >= 4)


def _arrays(name):
    return oracle.parse_edges(FIXTURE_EDGES[name])


@pytest.mark.parametrize("name", FIXTURES)
def test_clustering_coefficient_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {r["id"]: (r["deg"], r["n_triangles"], r["cc"])
           for r in clustering_coefficient(g).collect()}
    deg, tri, cc = oracle.clustering_coefficient(src, dst, n)
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v][0] == deg[v]
        assert got[v][1] == tri[v]
        assert got[v][2] == pytest.approx(cc[v], abs=1e-12)


@pytest.mark.parametrize("name", FIXTURES)
def test_cocitation_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["a"], r["b"]): r["common"]
           for r in cocitation(g).collect()}
    assert got == oracle.cocitation(src, dst, n)


def test_cocitation_hub_guard(spark):
    # star source 0 -> 1..5 exceeds max_fanout=3 and is dropped; source 6
    # cites {1, 2} and survives
    pairs = [(0, i) for i in range(1, 6)] + [(6, 1), (6, 2)]
    g = from_pairs(spark, pairs)
    got = {(r["a"], r["b"]): r["common"]
           for r in cocitation(g, max_fanout=3).collect()}
    assert got == {(1, 2): 1}


def test_bibliographic_coupling(spark):
    # 1 and 2 both cite {3, 4}; 5 cites only 3
    pairs = [(1, 3), (1, 4), (2, 3), (2, 4), (5, 3)]
    g = from_pairs(spark, pairs)
    got = {(r["a"], r["b"]): r["common"]
           for r in bibliographic_coupling(g).collect()}
    assert got == {(1, 2): 2, (1, 5): 1, (2, 5): 1}


@pytest.mark.parametrize("name", FIXTURES)
def test_scc_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = strongly_connected_components(g)
    got = {r["id"]: r["scc"] for r in res.df.collect()}
    want = oracle.strongly_connected_components(src, dst, n)
    assert got == {v: want[v] for v in range(n)}


def test_scc_two_cycles_and_bridge(spark):
    # cycle {0,1,2} -> bridge -> cycle {3,4}; 5 isolated-ish tail
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5)]
    g = from_pairs(spark, pairs)
    got = {r["id"]: r["scc"]
           for r in strongly_connected_components(g).df.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


@pytest.mark.parametrize("name", FIXTURES)
def test_bowtie_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {r["id"]: r["component"] for r in bowtie(g).df.collect()}
    want = oracle.bowtie(src, dst, n)
    assert got == {v: want[v] for v in range(n)}


def test_bowtie_classic_shape(spark):
    # IN(0) -> CORE{1,2,3} -> OUT(4); 5 disconnected
    pairs = [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    g = from_pairs(spark, pairs)
    got = {r["id"]: r["component"] for r in bowtie(g).df.collect()}
    assert got[0] == "IN" and got[4] == "OUT"
    assert got[1] == got[2] == got[3] == "CORE"
    assert got[5] == "OTHER" and got[6] == "OTHER"


def _weights(src, dst):
    return [1.0 + (int(s) * 31 + int(d)) % 7 for s, d in zip(src, dst)]


@pytest.mark.parametrize("name", FIXTURES)
def test_sssp_matches_oracle(spark, name):
    src, dst, n = _arrays(name)
    w = _weights(src, dst)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    we = g.spark.createDataFrame(
        [(int(s), int(d), float(x)) for s, d, x in zip(src, dst, w)],
        "src long, dst long, w double")
    res = sssp(g, we, [0])
    got = {r["id"]: r["dist"] for r in res.df.collect()}
    want = oracle.sssp(src, dst, w, n, [0])
    assert got == {v: pytest.approx(want[v], abs=1e-9)
                   for v in range(n) if want[v] != float("inf")}


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("directed", [True, False])
def test_harmonic_matches_oracle(spark, name, directed):
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = harmonic_centrality(g, list(range(n)), directed=directed)
    got = {r["id"]: r["harmonic"] for r in res.df.collect()}
    want = oracle.harmonic_centrality(src, dst, n, list(range(n)),
                                      directed=directed)
    assert set(got) == set(range(n))
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), np.array(want), atol=1e-9)


@pytest.mark.parametrize("name", FIXTURES)
def test_adamic_adar_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import adamic_adar
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["a"], r["b"]): (r["common"], r["score"])
           for r in adamic_adar(g).collect()}
    want = oracle.adamic_adar(src, dst, n)
    assert set(got) == set(want)
    for k, (c, s) in want.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(s, abs=1e-9)


def test_adamic_adar_hub_guard(spark):
    from haskellpagerank_spark.operators.structure import adamic_adar
    # hub 0 adjacent to 1..6 (deg 6 > max_fanout=5, excluded as middle);
    # 1-2-3 triangle provides guarded middles
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2), (2, 3), (1, 3)]
    g = from_pairs(spark, pairs)
    got = {(r["a"], r["b"]): r["common"]
           for r in adamic_adar(g, max_fanout=5).collect()}
    src, dst, n = oracle.parse_edges(pairs)
    want = {k: v[0] for k, v in
            oracle.adamic_adar(src, dst, n, max_fanout=5).items()}
    assert got == want
    # the hub never appears as a middle: pairs among 4..6 are absent
    assert (4, 5) not in got and (5, 6) not in got


@pytest.mark.parametrize("name", FIXTURES)
def test_graph_summary_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import graph_summary
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    row = graph_summary(g).first()
    want = oracle.graph_summary(src, dst, n)
    got = (row["n_vertices"], row["n_edges"], row["n_sinks"],
           row["max_out_deg"], row["avg_out_deg"], row["reciprocity"])
    assert got == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("name", FIXTURES)
def test_scc_local_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import (
        strongly_connected_components_local)
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {r["id"]: r["scc"]
           for r in strongly_connected_components_local(g).df.collect()}
    want = oracle.strongly_connected_components(src, dst, n)
    assert got == {v: want[v] for v in range(n)}


def test_scc_auto_picks_local_and_matches(spark):
    from haskellpagerank_spark.operators.structure import (
        strongly_connected_components, strongly_connected_components_auto)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5)]
    g = from_pairs(spark, pairs)
    res = strongly_connected_components_auto(g)
    assert res.metrics[0].extra.get("strategy") == "local"
    got = {r["id"]: r["scc"] for r in res.df.collect()}
    dist = {r["id"]: r["scc"]
            for r in strongly_connected_components(g).df.collect()}
    assert got == dist


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("k", [3, 4])
def test_k_truss_matches_oracle(spark, name, k):
    from haskellpagerank_spark.operators.structure import k_truss
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["src"], r["dst"]): r["support"]
           for r in k_truss(g, k=k).df.collect()}
    assert got == oracle.k_truss(src, dst, n, k)


def test_k_truss_peels_pendant_triangle(spark):
    from haskellpagerank_spark.operators.structure import k_truss
    # K4 on {0,1,2,3} plus a pendant triangle (3,4,5): 4-truss keeps only
    # the K4 (every K4 edge has support 2; pendant edges have support 1)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = from_pairs(spark, k4 + [(3, 4), (4, 5), (3, 5)])
    got = {(r["src"], r["dst"]) for r in k_truss(g, k=4).df.collect()}
    assert got == set(k4)


@pytest.mark.parametrize("name", FIXTURES)
def test_modularity_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.components import label_propagation
    from haskellpagerank_spark.operators.structure import modularity
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    lp = label_propagation(g, num_iters=3).df
    labels = {r["id"]: r["label"] for r in lp.collect()}
    got = {r["label"]: (r["internal_edges"], r["degree_sum"], r["contrib"])
           for r in modularity(g, lp).collect()}
    assert got == oracle.modularity(src, dst, n, labels)


def test_modularity_two_cliques(spark):
    from haskellpagerank_spark.operators.structure import modularity
    # two K3s joined by one bridge; perfect 2-community split
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = from_pairs(spark, pairs)
    lab = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "id long, label long")
    rows = {r["label"]: r["contrib"] for r in modularity(g, lab).collect()}
    # m=7: each community: internal 3, degree_sum 7 -> 3/7 - (7/14)^2
    expect = round(3 / 7 - 0.25, 8)
    assert rows == {0: pytest.approx(expect), 1: pytest.approx(expect)}


@pytest.mark.parametrize("name", FIXTURES)
def test_assortativity_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import assortativity
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    row = assortativity(g).first()
    want_r, want_n = oracle.assortativity(src, dst, n)
    assert (row["r"], row["n_stubs"]) == (pytest.approx(want_r), want_n)


def test_assortativity_star_is_negative(spark):
    from haskellpagerank_spark.operators.structure import assortativity
    g = from_pairs(spark, [(0, i) for i in range(1, 8)])
    assert assortativity(g).first()["r"] == pytest.approx(-1.0)


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("directed", [True, False])
def test_closeness_matches_oracle(spark, name, directed):
    from haskellpagerank_spark.operators.structure import (
        closeness_centrality)
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = closeness_centrality(g, list(range(n)), directed=directed)
    got = {r["id"]: r["closeness"] for r in res.df.collect()}
    want = oracle.closeness_centrality(src, dst, n, list(range(n)),
                                       directed=directed)
    assert set(got) == set(range(n))
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), np.array(want), atol=1e-9)


@pytest.mark.parametrize("name", FIXTURES)
def test_jaccard_neighbors_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import jaccard_neighbors
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["a"], r["b"]): (r["common"], r["jac"])
           for r in jaccard_neighbors(g).collect()}
    assert got == oracle.jaccard_neighbors(src, dst, n)


@pytest.mark.parametrize("name", FIXTURES)
def test_wl_refinement_matches_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import wl_refinement
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {r["id"]: r["wl_label"]
           for r in wl_refinement(g, rounds=3).collect()}
    assert got == oracle.wl_refinement(src, dst, n, rounds=3)


def test_wl_distinguishes_structure(spark):
    from haskellpagerank_spark.operators.structure import wl_refinement
    # path 0-1-2-3: endpoints {0,3} and middles {1,2} are 1-WL equivalent;
    # endpoints differ from middles after refinement
    g = from_pairs(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["wl_label"]
           for r in wl_refinement(g, rounds=3).collect()}
    assert got[0] == got[3] and got[1] == got[2]
    assert got[0] != got[1]


@pytest.mark.parametrize("name", FIXTURES)
def test_coreness_matches_peel_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import coreness
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = coreness(g)
    rows = {r["id"]: r["coreness"] for r in res.df.collect()}
    want = oracle.coreness(src, dst, n)
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", FIXTURES)
def test_coreness_local_matches_peel_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import coreness_local
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    rows = {r["id"]: r["coreness"]
            for r in coreness_local(g).df.collect()}
    want = oracle.coreness(src, dst, n)
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_array_equal(got, want)


def test_coreness_local_kernel_random_parity():
    # bucket-peel kernel vs the argmin-peel oracle on random COO graphs
    from haskellpagerank_spark.operators.structure import (
        _coreness_local_arrays)
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(2, 60))
        m = int(rng.integers(0, n * 3 + 1))
        s = rng.integers(0, n, m).astype(np.int64)
        d = rng.integers(0, n, m).astype(np.int64)
        np.testing.assert_array_equal(
            _coreness_local_arrays(s, d, n), oracle.coreness(s, d, n))


def test_coreness_auto_picks_local_and_matches(spark):
    from haskellpagerank_spark.operators.structure import coreness_auto
    name = FIXTURES[0]
    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = coreness_auto(g)
    assert res.metrics[0].extra.get("strategy") == "local"
    rows = {r["id"]: r["coreness"] for r in res.df.collect()}
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_array_equal(got, oracle.coreness(src, dst, n))


# ------------------------------------------------ power-law exponent MLE

@pytest.mark.parametrize("name", sorted(
    n for n, e in FIXTURE_EDGES.items() if len(e) >= 4))
def test_powerlaw_alpha_matches_oracle(spark, name):
    import duckdb

    from haskellpagerank_spark.operators.structure import (
        powerlaw_alpha, powerlaw_sql)

    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    row = powerlaw_alpha(g).first()
    n_tail, alpha = oracle.powerlaw_alpha(src, dst, n)
    assert row["n_tail"] == n_tail
    assert row["alpha"] == alpha
    # DuckDB twin identity
    edges_sql = " UNION ALL ".join(
        f"SELECT {s} AS src, {d} AS dst" for s, d in FIXTURE_EDGES[name])
    got = duckdb.sql(powerlaw_sql(f"({edges_sql})")).fetchone()
    assert got == (n_tail, alpha)


def test_powerlaw_alpha_exact_hand_case(spark):
    import math

    from haskellpagerank_spark.operators.structure import powerlaw_alpha

    # out-degrees 1, 2, 4 -> alpha = 1 + 3 / ln(8)
    pairs = [(0, 10), (1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (2, 13)]
    row = powerlaw_alpha(from_pairs(spark, pairs)).first()
    assert row["n_tail"] == 3
    assert row["alpha"] == round(1.0 + 3 / math.log(8.0), 8)


def test_powerlaw_alpha_degenerate_tail_is_null(spark):
    from haskellpagerank_spark.operators.structure import powerlaw_alpha

    # every out-degree == xmin == 1 -> MLE diverges -> NULL
    row = powerlaw_alpha(from_pairs(spark, [(0, 1), (1, 2), (2, 0)])).first()
    assert row["n_tail"] == 3
    assert row["alpha"] is None


def test_powerlaw_alpha_in_degree_is_out_of_reversed(spark):
    from haskellpagerank_spark.operators.structure import powerlaw_alpha

    pairs = [(0, 10), (1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (2, 13),
             (5, 10), (6, 13)]
    rev = [(d, s) for s, d in pairs]
    got_in = powerlaw_alpha(from_pairs(spark, pairs), direction="in").first()
    got_out_rev = powerlaw_alpha(from_pairs(spark, rev)).first()
    assert (got_in["n_tail"], got_in["alpha"]) == \
        (got_out_rev["n_tail"], got_out_rev["alpha"])


def test_scc_sweep_budget_raises_on_high_diameter_core(spark):
    """The distributed tier's sweep budget (VERDICT r4 #3): a directed
    cycle is one SCC whose diameter equals its length, trim cannot peel
    it, and a budget below the diameter must raise the descriptive
    RuntimeError instead of running O(diameter) sweeps."""
    from haskellpagerank_spark.operators.structure import (
        strongly_connected_components,
        strongly_connected_components_local,
    )
    cyc = [(i, (i + 1) % 48) for i in range(48)]
    g = from_pairs(spark, cyc)
    with pytest.raises(RuntimeError, match="sweep budget"):
        strongly_connected_components(g, max_sweeps=4)
    # the COST tier handles the same graph regardless of diameter
    # (the distributed success path on small diameters is covered by the
    # fixture-parity tests above)
    loc = strongly_connected_components_local(g)
    assert {r["scc"] for r in loc.df.collect()} == {0}


def test_scc_local_kernel_diameter_independent():
    """The local kernel's min-label fast path is O(diameter) sweeps; its
    sweep budget must reroute deep cores to the linear-time Kosaraju
    fallback, and both kernels must agree with the Tarjan oracle on a
    structure that exercises trim + deep cycles + cross-links."""
    import numpy as np
    from haskellpagerank_spark import oracle
    from haskellpagerank_spark.operators.structure import (
        _scc_kosaraju_arrays, _scc_local_arrays)
    # two 400-cycles, a bridge between them, and a trimmable tail
    n = 810
    a = np.arange(400, dtype=np.int64)
    s = np.concatenate([a, 400 + a,
                        np.array([5, 803, 805], dtype=np.int64),
                        np.array([807], dtype=np.int64)])
    d = np.concatenate([(a + 1) % 400, 400 + (a + 1) % 400,
                        np.array([803, 805, 807], dtype=np.int64),
                        np.array([809], dtype=np.int64)])
    want = np.array(oracle.strongly_connected_components(s, d, n))
    np.testing.assert_array_equal(_scc_kosaraju_arrays(s, d, n), want)
    # budget forces the fallback (each 400-cycle needs ~400 sweeps)
    np.testing.assert_array_equal(
        _scc_local_arrays(s, d, n, sweep_budget=32), want)
    # and the unbudgeted fast path agrees on a shallow graph
    s2 = np.array([0, 1, 2, 2], dtype=np.int64)
    d2 = np.array([1, 0, 0, 3], dtype=np.int64)
    want2 = np.array(oracle.strongly_connected_components(s2, d2, 4))
    np.testing.assert_array_equal(_scc_local_arrays(s2, d2, 4), want2)


@pytest.mark.parametrize("seed", [9, 31])
def test_cross_operator_invariants_random_digraphs(spark, seed):
    """Randomized cross-operator invariants the per-operator oracles can't
    see: (a) SCC labels REFINE undirected-CC labels (strong connectivity
    implies weak), (b) bowtie assigns every vertex exactly one class and
    its CORE is exactly the largest SCC, (c) every class present is from
    the closed vocabulary."""
    import random
    from collections import Counter
    from haskellpagerank_spark.operators.components import (
        connected_components)
    from haskellpagerank_spark.operators.graph import from_pairs
    rng = random.Random(seed)
    n = rng.randint(18, 32)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.08]
    pairs += [(i, (i + 1) % 6) for i in range(6)]      # guarantee a cycle
    g = from_pairs(spark, pairs)

    scc = {r["id"]: r["scc"]
           for r in strongly_connected_components(g).df.collect()}
    cc = {r["id"]: r["component"]
          for r in connected_components(g).df.collect()}
    assert set(scc) == set(cc) == set(range(g.num_vertices))
    # (a) same SCC -> same CC
    scc_to_cc = {}
    for v in scc:
        prev = scc_to_cc.setdefault(scc[v], cc[v])
        assert prev == cc[v], f"SCC {scc[v]} spans two weak components"

    bt = {r["id"]: r["component"] for r in bowtie(g).df.collect()}
    assert set(bt) == set(range(g.num_vertices))          # (b) total map
    assert set(bt.values()) <= {"CORE", "IN", "OUT", "TENDRIL",
                                "TUBE", "OTHER"}           # (c)
    core = {v for v, c in bt.items() if c == "CORE"}
    largest_scc = max(Counter(scc.values()).items(), key=lambda kv: kv[1])
    assert core == {v for v in scc if scc[v] == largest_scc[0]}


# ----------------------------------------------------------------- SimRank

def _simrank_numpy(src, dst, n, iters, c):
    """Matrix-form SimRank oracle: S_{k+1} = c * W^T S_k W with the
    diagonal re-pinned to 1, where W[i, a] = 1/|I(a)| for i in I(a)
    (Jeh & Widom 2002, eq. 2 in matrix form)."""
    W = np.zeros((n, n))
    for i, a in {(int(s), int(d)) for s, d in zip(src, dst) if s != d}:
        W[i, a] = 1.0
    col = W.sum(axis=0)
    col[col == 0] = 1.0
    W = W / col
    S = np.eye(n)
    for _ in range(iters):
        S = c * (W.T @ S @ W)
        np.fill_diagonal(S, 1.0)
    return S


@pytest.mark.parametrize("name", ["doubleSquare", "princeton", "complete",
                                  "sinkAndSource"])
def test_simrank_matches_numpy_oracle(spark, name):
    from haskellpagerank_spark.operators.structure import simrank
    src, dst, n = _arrays(name)
    want = _simrank_numpy(src, dst, n, iters=3, c=0.8)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["a"], r["b"]): r["score"]
           for r in simrank(g, iters=3, c=0.8).collect()}
    for a in range(n):
        for b in range(a + 1, n):
            if want[a, b] > 0:
                assert abs(got[(a, b)] - want[a, b]) < 1e-12, (a, b)
            else:
                assert (a, b) not in got
    assert all(0.0 < v <= 1.0 + 1e-12 for v in got.values())


@pytest.mark.parametrize("seed", [3, 41])
def test_simrank_random_digraphs(spark, seed):
    import random
    from haskellpagerank_spark.operators.structure import simrank
    rng = random.Random(seed)
    n = rng.randint(8, 14)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.2]
    pairs += rng.sample(pairs, k=max(1, len(pairs) // 5))  # duplicates
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    want = _simrank_numpy(src, dst, n, iters=4, c=0.6)
    g = from_pairs(spark, pairs)
    got = {(r["a"], r["b"]): r["score"]
           for r in simrank(g, iters=4, c=0.6).collect()}
    for (a, b), v in got.items():
        assert abs(v - want[a, b]) < 1e-12


def test_simrank_pair_budget_raises(spark):
    from haskellpagerank_spark.operators.structure import simrank
    g = from_pairs(spark, FIXTURE_EDGES["complete"])
    with pytest.raises(RuntimeError, match="max_pairs"):
        simrank(g, iters=1, max_pairs=3)


# ------------------------------------- full truss decomposition (round 5)

@pytest.mark.parametrize("name", ["complete", "doubleSquare", "myFavorite",
                                  "princeton"])
def test_trussness_matches_peel_oracle_on_fixtures(spark, name):
    """Edge h-index fixpoint == sequential min-support peel on fixtures."""
    from haskellpagerank_spark.operators.structure import trussness

    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["src"], r["dst"]): r["trussness"]
           for r in trussness(g).df.collect()}
    assert got == oracle.trussness(src, dst)


def test_trussness_refines_k_truss_and_pendant(spark):
    """trussness >= k is exactly the k-truss edge set; triangle-free
    (pendant) edges report 2. K4 + pendant triangle + dangling edge."""
    from haskellpagerank_spark.operators.structure import k_truss, trussness

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pairs = k4 + [(3, 4), (4, 5), (3, 5), (5, 6)]
    g = from_pairs(spark, pairs)
    tau = {(r["src"], r["dst"]): r["trussness"]
           for r in trussness(g).df.collect()}
    assert tau[(5, 6)] == 2  # dangling edge: no triangle
    for e in k4:
        assert tau[e] == 4
    for e in [(3, 4), (4, 5), (3, 5)]:
        assert tau[e] == 3
    for k in (3, 4):
        in_truss = {(r["src"], r["dst"])
                    for r in k_truss(g, k=k).df.collect()}
        assert in_truss == {e for e, t in tau.items() if t >= k}


@pytest.mark.parametrize("seed", [3, 23])
def test_trussness_random_graphs(spark, seed):
    """Randomized G(n,p): fixpoint == peel oracle, and the k-truss
    consistency holds for every realized k."""
    import random

    from haskellpagerank_spark.operators.structure import k_truss, trussness

    rng = random.Random(seed)
    n = rng.randint(8, 16)
    pairs = [(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < 0.4]
    if not pairs:
        pytest.skip("empty graph")
    g = from_pairs(spark, pairs)
    tau = {(r["src"], r["dst"]): r["trussness"]
           for r in trussness(g).df.collect()}
    src = [a for a, _ in pairs]
    dst = [b for _, b in pairs]
    assert tau == oracle.trussness(src, dst)
    kmax = max(tau.values())
    in_truss = {(r["src"], r["dst"])
                for r in k_truss(g, k=kmax).df.collect()}
    assert in_truss == {e for e, t in tau.items() if t >= kmax}


@pytest.mark.parametrize("name", ["complete", "myFavorite", "princeton"])
def test_trussness_local_and_auto_match_distributed(spark, name):
    """COST tiers: local peel == auto dispatch == distributed fixpoint."""
    from haskellpagerank_spark.operators.structure import (
        trussness, trussness_auto, trussness_local)

    g = from_pairs(spark, FIXTURE_EDGES[name])
    want = {(r["src"], r["dst"]): r["trussness"]
            for r in trussness(g).df.collect()}
    loc = {(r["src"], r["dst"]): r["trussness"]
           for r in trussness_local(g).df.collect()}
    auto = trussness_auto(g)
    got_auto = {(r["src"], r["dst"]): r["trussness"]
                for r in auto.df.collect()}
    assert loc == want
    assert got_auto == want
    assert auto.metrics[0].extra.get("strategy") == "local"


# ------------------------------- Eppstein-Wang sampled harmonic (round 5)

@pytest.mark.parametrize("name", ["complete", "myFavorite", "princeton"])
def test_harmonic_sampled_matches_scaled_oracle(spark, name):
    """Sampled estimate == oracle restricted to the deterministic pivot
    set, scaled n/k with the identical operand order."""
    from haskellpagerank_spark.operators.betweenness import sampled_pivots
    from haskellpagerank_spark.operators.structure import harmonic_sampled

    src, dst, n = _arrays(name)
    g = from_pairs(spark, FIXTURE_EDGES[name])
    pivots = sampled_pivots(n, 2, 5)
    if not pivots:
        pytest.skip("no pivots at this n")
    got = {r["id"]: r["harmonic"]
           for r in harmonic_sampled(g, 2, 5).df.collect()}
    base = oracle.harmonic_centrality(src, dst, n, pivots)
    want = [h * float(n) / float(len(pivots)) for h in base]
    np.testing.assert_allclose(
        np.array([got[v] for v in range(n)]), np.array(want), atol=1e-9)


def test_harmonic_sampled_p1_is_exact(spark):
    from haskellpagerank_spark.operators.structure import (
        harmonic_centrality as hc_op, harmonic_sampled)

    pairs = FIXTURE_EDGES["myFavorite"]
    g = from_pairs(spark, pairs)
    n = g.num_vertices
    got = {r["id"]: r["harmonic"]
           for r in harmonic_sampled(g, 4, 4).df.collect()}
    want = {r["id"]: r["harmonic"]
            for r in hc_op(g, list(range(n))).df.collect()}
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_harmonic_sampled_empty_pivots_raises(spark):
    from haskellpagerank_spark.operators.structure import harmonic_sampled

    g = from_pairs(spark, [(0, 1)])
    with pytest.raises(ValueError):
        harmonic_sampled(g, keep_num=1, keep_den=97)


# ---------------------------------------------------------------- round 5:
# global transitivity + rich-club curve

def _und_brute(pairs):
    """Undirected simple edge set (a < b), self-loops dropped."""
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _transitivity_brute(pairs):
    from collections import Counter
    und = _und_brute(pairs)
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = sum(1 for a, b in und for c in deg
              if c > b and (a, c) in und and (b, c) in und)
    return wedges, tri, round(3.0 * tri / max(wedges, 1), 8)


def _rich_club_brute(pairs, scale=1_000_000):
    from collections import Counter
    und = _und_brute(pairs)
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    out = {}
    for k in sorted(set(deg.values())):
        nodes = {v for v, d in deg.items() if d > k}
        if len(nodes) < 2:
            continue
        ek = sum(1 for a, b in und if a in nodes and b in nodes)
        out[k] = (len(nodes), ek,
                  (2 * ek * scale) // (len(nodes) * (len(nodes) - 1)))
    return out


def test_transitivity_known_graphs(spark):
    from haskellpagerank_spark.operators.structure import transitivity

    # K4: every wedge closed -> C = 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    r = transitivity(from_pairs(spark, k4)).first()
    assert (r["n_wedges"], r["n_triangles"], r["transitivity"]) == (12, 4, 1.0)
    # star: wedges but no triangle -> C = 0
    r = transitivity(from_pairs(spark, [(0, i) for i in range(1, 5)])).first()
    assert (r["n_wedges"], r["n_triangles"], r["transitivity"]) == (6, 0, 0.0)


@pytest.mark.parametrize("name", FIXTURES)
def test_transitivity_matches_brute(spark, name):
    from haskellpagerank_spark.operators.structure import transitivity

    r = transitivity(from_pairs(spark, FIXTURE_EDGES[name])).first()
    w, t, c = _transitivity_brute(FIXTURE_EDGES[name])
    assert (r["n_wedges"], r["n_triangles"], r["transitivity"]) == (w, t, c)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rich_club_matches_brute_random(spark, seed):
    """Histogram-window curve == per-threshold brute force on G(n,p)."""
    import random

    from haskellpagerank_spark.operators.structure import rich_club

    rng = random.Random(seed)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    got = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi_ppm"])
           for r in rich_club(from_pairs(spark, pairs)).collect()}
    assert got == _rich_club_brute(pairs)


def test_rich_club_hub_clique(spark):
    """Clique of hubs + pendant leaves: the top threshold is fully
    connected (phi = 1.0 in ppm)."""
    from haskellpagerank_spark.operators.structure import rich_club

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    leaves = [(v, 10 + 3 * v + i) for v in range(4) for i in range(3)]
    got = {r["k"]: r for r in
           rich_club(from_pairs(spark, clique + leaves)).collect()}
    # leaves have degree 1; hubs degree 6 -> k=1 selects the 4 hubs
    assert got[1]["n_nodes"] == 4 and got[1]["n_edges"] == 6
    assert got[1]["phi_ppm"] == 1_000_000


def test_condensation_two_cycles_bridge(spark):
    """Two 3-cycles joined by two parallel bridge edges condense to one
    DAG edge with multiplicity 2."""
    from haskellpagerank_spark.operators.structure import condensation

    cyc_a = [(0, 1), (1, 2), (2, 0)]
    cyc_b = [(10, 11), (11, 12), (12, 10)]
    bridge = [(0, 10), (2, 11)]
    got = condensation(from_pairs(spark, cyc_a + cyc_b + bridge)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["cnt"] == 2 and r["comp_src"] != r["comp_dst"]


@pytest.mark.parametrize("name", FIXTURES)
def test_condensation_is_acyclic_and_complete(spark, name):
    """On every fixture: the condensation has no intra-component edges,
    its edge multiplicities sum to the number of inter-component edges,
    and it is a DAG (re-running SCC on it yields all-singleton
    components)."""
    from haskellpagerank_spark.operators.structure import (
        condensation, strongly_connected_components_auto)

    g = from_pairs(spark, FIXTURE_EDGES[name])
    labels = strongly_connected_components_auto(g).df
    lab = {r["id"]: r["scc"] for r in labels.collect()}
    got = {(r["comp_src"], r["comp_dst"]): r["cnt"]
           for r in condensation(g, labels).collect()}
    want = {}
    for s, d in FIXTURE_EDGES[name]:
        cs, cd = lab[s], lab[d]
        if cs != cd:
            want[(cs, cd)] = want.get((cs, cd), 0) + 1
    assert got == want
    if got:
        dag = from_pairs(spark, sorted(got))
        relabel = strongly_connected_components_auto(dag).df.collect()
        comps = {}
        for r in relabel:
            comps.setdefault(r["scc"], []).append(r["id"])
        assert all(len(v) == 1 for v in comps.values())

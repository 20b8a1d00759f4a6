"""ANF (Flajolet-Martin neighborhood sketches, operators/anf.py) vs the
hashlib/int oracle on the reference fixtures + a DuckDB-twin identity test
+ a sanity check that the estimate tracks the TRUE ball sizes."""

from __future__ import annotations

import duckdb
import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.anf import anf, anf_sql
from haskellpagerank_spark.operators.graph import from_pairs

FIXTURES = sorted(n for n, e in FIXTURE_EDGES.items() if len(e) >= 4)


@pytest.mark.parametrize("name", FIXTURES)
def test_anf_matches_oracle(spark, name):
    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = anf(g, radius=3)
    got = {r["id"]: r["ball_est"] for r in res.df.collect()}
    assert got == oracle.anf(src, dst, n, radius=3)
    assert res.iterations == 3
    assert len(res.metrics) == 3
    # N(t) is monotone non-decreasing in t
    nf = [m.extra["nf_sum"] for m in res.metrics]
    assert all(b >= a - 1e-9 for a, b in zip(nf, nf[1:]))


def test_anf_sql_twin_matches_oracle():
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (4, 0)]
    src, dst, n = oracle.parse_edges(pairs)
    edges_sql = " UNION ALL ".join(
        f"SELECT {s} AS src, {d} AS dst" for s, d in pairs)
    verts_sql = " UNION ALL ".join(f"SELECT {v} AS id" for v in range(n))
    q = anf_sql(f"({edges_sql})", f"({verts_sql})", radius=3)
    got = {i: e for i, e in duckdb.sql(q).fetchall()}
    assert got == oracle.anf(src, dst, n, radius=3)


def test_anf_tracks_true_ball_sizes(spark):
    # star-out: 0 -> 1..20; ball(0, 1) = 21, ball(i>0, 1) = 1.
    # FM is biased HIGH on tiny sets (E[est | singleton] ~ 2^0.5/phi ~ 1.8,
    # Flajolet-Martin 1985 — the phi correction is asymptotic), so assert
    # the big ball within 35% and the singleton within the known bias band.
    pairs = [(0, i) for i in range(1, 21)]
    g = from_pairs(spark, pairs)
    res = anf(g, radius=1, n_sketches=64)
    got = {r["id"]: r["ball_est"] for r in res.df.collect()}
    assert got[0] == pytest.approx(21, rel=0.35)
    assert 1.0 <= got[5] <= 2.6
    assert got[0] > 4 * got[5]


def test_effective_diameter_curve_matches_oracle_sums(spark):
    # determinism: the estimated neighborhood function at each sweep equals
    # the sum of the hashlib-oracle per-vertex estimates (same sketches)
    from haskellpagerank_spark.operators.anf import effective_diameter

    name = "doubleSquare"
    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    res = effective_diameter(g, q=0.9, n_sketches=8)
    for t, got in enumerate(res.nf):
        want = sum(oracle.anf(src, dst, n, radius=t).values())
        assert got == pytest.approx(want, rel=1e-9)
    assert res.saturated
    # rerun -> identical result (deterministic seeding, no RNG anywhere)
    res2 = effective_diameter(g, q=0.9, n_sketches=8)
    assert res2.effective_diameter == res.effective_diameter
    assert res2.nf == res.nf


def test_effective_diameter_path_tracks_exact(spark):
    # directed 31-vertex path: nf is nearly linear in t, so sketch error
    # (~1/sqrt(64)) translates into a bounded shift of the interpolated d
    from haskellpagerank_spark.operators.anf import effective_diameter

    n = 31
    pairs = [(i, i + 1) for i in range(n - 1)]
    src, dst, _ = oracle.parse_edges(pairs)
    exact = oracle.effective_diameter_exact(src, dst, n, q=0.9)
    g = from_pairs(spark, pairs)
    res = effective_diameter(g, q=0.9, n_sketches=64)
    assert res.saturated
    assert res.iterations >= n // 2  # must actually walk the path
    assert res.effective_diameter == pytest.approx(exact, rel=0.25)


def test_effective_diameter_star_saturates_fast(spark):
    from haskellpagerank_spark.operators.anf import effective_diameter

    g = from_pairs(spark, [(0, i) for i in range(1, 21)])
    res = effective_diameter(g, q=0.9, n_sketches=64)
    assert res.saturated
    assert res.iterations <= 3
    assert 0.0 <= res.effective_diameter <= 1.5


def test_effective_diameter_no_edges(spark):
    from haskellpagerank_spark.operators.anf import effective_diameter

    g = from_pairs(spark, [(0, 0), (1, 1), (2, 2)])  # self-loops dropped
    res = effective_diameter(g, q=0.9, n_sketches=16)
    assert res.saturated
    assert res.effective_diameter == 0.0


def test_neighborhood_function_oracle_exact_values():
    # path 0->1->2->3: N(0)=4, N(1)=7, N(2)=9, N(3)=10
    src, dst, n = oracle.parse_edges([(0, 1), (1, 2), (2, 3)])
    assert oracle.neighborhood_function(src, dst, n) == [4, 7, 9, 10]
    # q=1.0 -> full (finite) diameter
    assert oracle.effective_diameter_exact(src, dst, n, q=1.0) == 3.0


def test_anf_with_effdiam_matches_duckdb_twin(spark):
    # full gate-surface identity on a fixture: ball rows == anf, nf rows ==
    # rounded oracle sums, d90 row == the twin's interpolation, bit-for-bit
    from haskellpagerank_spark.operators.anf import (
        anf_effdiam_sql, anf_with_effdiam)

    name = "doubleSquare"
    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["kind"], r["id"]): r["val"]
           for r in anf_with_effdiam(g, radius=3).collect()}
    edges_sql = " UNION ALL ".join(
        f"SELECT {s} AS src, {d} AS dst" for s, d in FIXTURE_EDGES[name])
    verts_sql = " UNION ALL ".join(f"SELECT {v} AS id" for v in range(n))
    q = anf_effdiam_sql(f"({edges_sql})", f"({verts_sql})", radius=3)
    want = {(k, i): v for k, i, v in duckdb.sql(q).fetchall()}
    assert got == want
    # ball rows are exactly the plain anf output
    for v, est in oracle.anf(src, dst, n, radius=3).items():
        assert got[("ball", v)] == est
    # the d90 row is a sane hop count within the swept radius
    assert 0.0 <= got[("d90", -1)] <= 3.0


def test_round_half_up_modes():
    """Driver-side gate scalars must round HALF_UP (Spark F.round / DuckDB
    ROUND), never Python banker's (ADVICE r4): exactly-on-5 boundaries."""
    from haskellpagerank_spark.operators.anf import _round_half_up
    # 0.125 and 2.5 are exactly representable midpoints: banker's rounds
    # them to even, HALF_UP rounds away from zero
    assert _round_half_up(0.125, 2) == 0.13
    assert round(0.125, 2) == 0.12                # the banker's divergence
    assert _round_half_up(2.5, 0) == 3.0
    assert round(2.5) == 2
    assert _round_half_up(1.23456, 4) == 1.2346
    assert _round_half_up(1.23454, 4) == 1.2345


def test_effective_diameter_consecutive_saturation(spark):
    """stop_consecutive requires k flat sweeps in a row before declaring
    saturation (plateau-then-growth guard, ADVICE r4); k sweeps of margin
    never change the interpolated d on an already-saturated graph."""
    from haskellpagerank_spark.operators.anf import effective_diameter
    pairs = [(i, j) for i in range(8) for j in range(8) if i != j]  # K8
    g = from_pairs(spark, pairs)
    r1 = effective_diameter(g, q=0.9, n_sketches=16, stop_consecutive=1)
    r2 = effective_diameter(g, q=0.9, n_sketches=16, stop_consecutive=2)
    assert r1.saturated and r2.saturated
    assert r2.iterations == r1.iterations + 1  # one extra confirming sweep
    assert r2.effective_diameter == r1.effective_diameter
    with pytest.raises(ValueError, match="stop_consecutive"):
        effective_diameter(g, stop_consecutive=0)

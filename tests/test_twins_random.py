"""Randomized DuckDB-twin validation for the round-5 gate folds: the
matching and trussness SQL twins must reproduce the Python oracles on
random graphs INDEPENDENTLY of Spark — the same cross-engine program the
Gauss-Seidel twin got (test_pagerank_async), applied to the two newest
unrolled fixpoints. No Spark fixture: pure duckdb vs oracle."""

from __future__ import annotations

import random

import duckdb
import pytest

from haskellpagerank_spark import oracle
from haskellpagerank_spark import sql_twins as SQ


def _random_pairs(seed, n_lo=8, n_hi=20, p=0.3):
    rng = random.Random(seed)
    n = rng.randint(n_lo, n_hi)
    pairs = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < p]
    if not pairs:
        pairs = [(0, 1)]
    return n, pairs


def _values_sql(pairs):
    # BIGINT like the gate's parquet columns — bare VALUES literals are
    # INT32 in DuckDB and would overflow the LCG multiply
    return ("SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst "
            "FROM (VALUES "
            + ", ".join(f"({s}, {d})" for s, d in pairs) + ") _e(src, dst)")


@pytest.mark.parametrize("seed", range(8))
def test_matching_sql_twin_matches_greedy_oracle(seed):
    n, pairs = _random_pairs(seed)
    edges_sql = _values_sql(pairs)
    verts_sql = f"SELECT UNNEST(range(0, {n})) AS id"
    got = sorted(duckdb.sql(
        SQ.matching_sql(edges_sql, verts_sql, rounds=n)).fetchall())

    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    pri = {(u, v): (u * 1103515245 + v * 12345 + 12345) % 2147483648
           for u, v in canon}
    want = oracle.greedy_matching([a for a, _ in pairs],
                                  [b for _, b in pairs], pri)
    assert got == want


@pytest.mark.parametrize("seed", range(8))
def test_trussness_sql_twin_matches_peel_oracle(seed):
    n, pairs = _random_pairs(seed, p=0.35)
    edges_sql = _values_sql(pairs)
    # rounds = max support bound: n is always enough on these sizes
    got = {(r[0], r[1]): r[2] for r in duckdb.sql(
        SQ.trussness_sql(edges_sql, rounds=n)).fetchall()}
    want = oracle.trussness([a for a, _ in pairs], [b for _, b in pairs])
    assert got == want

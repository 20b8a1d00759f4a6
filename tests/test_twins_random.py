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


@pytest.mark.parametrize("seed", range(8, 14))
def test_mis_sql_twin_matches_greedy_oracle(seed):
    """mis_sql's JP-color-1 derivation equals the sequential greedy MIS
    under the same LCG vertex priorities, on random graphs."""
    n, pairs = _random_pairs(seed)
    edges_sql = _values_sql(pairs)
    verts_sql = f"SELECT CAST(UNNEST(range(0, {n})) AS BIGINT) AS id"
    got = [r[1] for r in sorted(duckdb.sql(
        SQ.mis_sql(edges_sql, verts_sql, rounds=n + 1)).fetchall())]
    pri = [(v * 1103515245 + 12345) % 2147483648 for v in range(n)]
    want = oracle.greedy_mis([a for a, _ in pairs],
                             [b for _, b in pairs], n, pri)
    assert got == want


@pytest.mark.parametrize("seed", range(14, 20))
def test_sampled_triangle_twin_shape_matches_brute(seed):
    """The DOULION twin's LCG keep-predicate + id-oriented triangle join
    (the shape queries.TRIANGLES_SAMPLED_NATION_SQL instantiates) equals a
    brute-force recount of the same kept subgraph, on random graphs."""
    n, pairs = _random_pairs(seed, p=0.4)
    edges_sql = _values_sql(pairs)
    sql = f"""
    WITH e0 AS ({edges_sql}),
    und AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
    canon AS (SELECT src, dst FROM und WHERE src < dst
              AND ((src * 1103515245 + dst * 12345 + 12345) % 2147483648)
                  % 5 < 2)
    SELECT COUNT(*) AS n FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
    JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """
    got = duckdb.sql(sql).fetchone()[0]
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    kept = [(u, v) for u, v in canon
            if ((u * 1103515245 + v * 12345 + 12345) % 2147483648) % 5 < 2]
    adj: dict[int, set[int]] = {}
    for u, v in kept:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = sum(len(adj[u] & adj[v]) for u, v in kept) // 3
    assert got == want


@pytest.mark.parametrize("seed", range(20, 30))
def test_truss_core_inequality_random(seed):
    """Cross-operator invariant (pure oracles, no engines): an edge of
    trussness k lies in the k-truss, whose vertices all have degree >=
    k-1 within it — so both endpoints have coreness >= k-1. Ties the two
    independent decompositions together on random graphs."""
    n, pairs = _random_pairs(seed, p=0.35)
    import numpy as np

    src = np.array([a for a, _ in pairs])
    dst = np.array([b for _, b in pairs])
    tau = oracle.trussness(src, dst)
    core = oracle.coreness(src, dst, n)
    for (u, v), k in tau.items():
        assert core[u] >= k - 1 and core[v] >= k - 1, (u, v, k)


# -------------------------------------------------------------- round-5
# text-family folds: the DuckDB twins vs pure-Python oracles on RANDOM
# corpora (documents view registered ad hoc; includes 0/1/2-token docs to
# pin the n-gram totality fix on the SQL side too)

_VOCAB = ("the spark query table row scan join agg sort key value fast "
          "slow big small data line batch stream").split()


def _random_corpus(seed, n_docs_hi=30):
    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(10, n_docs_hi)):
        n_words = rng.choice([0, 1, 2, 3, 5, 8, 13, 21, 34])
        rows.append((i, " ".join(rng.choice(_VOCAB)
                                 for _ in range(n_words))))
    return rows


def _register_documents(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("seed", range(30, 36))
def test_tfidf_twin_matches_python_oracle_random(seed):
    import test_functions as TF

    rows = _random_corpus(seed)
    con = _register_documents(rows)
    got = sorted(map(tuple, con.execute(
        SQ.tfidf_top_terms_sql(3)).fetchall()))
    assert got == TF._tfidf_oracle(rows, 3)


@pytest.mark.parametrize("seed", range(36, 42))
def test_top_bigram_twin_matches_python_oracle_random(seed):
    rows = _random_corpus(seed)
    con = _register_documents(rows)
    got = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(
        SQ.top_bigram_share_sql()).fetchall()}
    from collections import Counter
    want = {}
    for i, t in rows:
        toks = t.split()
        if len(toks) < 2:
            continue
        c = Counter(" ".join(toks[j:j + 2]).lower()
                    for j in range(len(toks) - 1))
        gram, cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[i] = (gram, cnt, len(toks),
                   (2 * cnt * 1_000_000) // len(toks))
    assert got == want


@pytest.mark.parametrize("seed", range(42, 48))
def test_pack_shards_twin_matches_python_oracle_random(seed):
    import test_functions as TF
    from haskellpagerank_spark.queries import _SQL

    rows = _random_corpus(seed)
    con = _register_documents(rows)
    got = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(
        _SQL["pack_shards"]).fetchall()}
    want = {i: v for i, v in TF._pack_oracle(rows, 512).items()}
    assert got == want


@pytest.mark.parametrize("seed", range(48, 54))
def test_sorted_neighborhood_twin_matches_python_oracle_random(seed):
    import test_functions as TF
    from haskellpagerank_spark.queries import _SQL

    rows = _random_corpus(seed)
    con = _register_documents(rows)
    got = {(r[0], r[1]): r[2] for r in con.execute(
        _SQL["neardup_sorted"]).fetchall()}
    assert got == TF._snm_oracle(rows, n=3, threshold=0.5, window=4,
                                 key_chars=32)


@pytest.mark.parametrize("seed", range(54, 58))
def test_bloom_contamination_twin_matches_python_oracle_random(seed):
    import test_functions as TF

    rows = _random_corpus(seed)
    con = _register_documents(rows)
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SQ.bloom_contamination_sql(3, 7)).fetchall()}
    probe_ngrams = set()
    for i, t in rows:
        toks = t.split()
        if i % 7 == 0 and t.strip() and len(toks) >= 3:
            probe_ngrams.update(" ".join(toks[j:j + 3])
                                for j in range(len(toks) - 2))
    train = [(i, t) for i, t in rows if i % 7 != 0]
    want = TF._bloom_oracle(train, probe_ngrams, n=3)
    assert got == want

"""Deterministic random-walk corpus (operators/walks.py) vs the
hashlib-md5 NumPy oracle on the reference fixture graphs, plus chooser
cross-engine identity (Spark conv(md5) == DuckDB CAST('0x'||md5) ==
python hashlib)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from haskellpagerank_spark import oracle
from haskellpagerank_spark.fixtures import FIXTURE_EDGES
from haskellpagerank_spark.operators.graph import from_pairs
from haskellpagerank_spark.operators.walks import (
    indexed_adjacency, random_walks, walks_sql,
)

FIXTURES = sorted(n for n, e in FIXTURE_EDGES.items() if len(e) >= 4)


def test_chooser_cross_engine_identity(spark):
    probe = "42|17|3"
    want = int(hashlib.md5(probe.encode()).hexdigest()[:15], 16)
    got_spark = spark.range(1).select(
        F.conv(F.substring(F.md5(F.lit(probe)), 1, 15), 16, 10)
        .cast("long").alias("h")).first()["h"]
    got_duck = duckdb.sql(
        f"SELECT CAST('0x' || substr(md5('{probe}'), 1, 15) AS BIGINT)"
    ).fetchone()[0]
    assert got_spark == want == got_duck


@pytest.mark.parametrize("name", FIXTURES)
def test_walks_match_oracle(spark, name):
    src, dst, n = oracle.parse_edges(FIXTURE_EDGES[name])
    g = from_pairs(spark, FIXTURE_EDGES[name])
    got = {(r["walk_id"], r["step"]): r["vertex"]
           for r in random_walks(g, walk_length=4,
                                 walks_per_vertex=2).collect()}
    want = oracle.random_walks(src, dst, n, walk_length=4,
                               walks_per_vertex=2)
    assert got == want


def test_walks_stop_at_sinks(spark):
    # 0 -> 1 -> 2 (sink): every walk from 0 has <= 3 rows, from 2 exactly 1
    g = from_pairs(spark, [(0, 1), (1, 2)])
    rows = random_walks(g, walk_length=5).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["vertex"]))
    assert sorted(by_walk[0]) == [(0, 0), (1, 1), (2, 2)]
    assert sorted(by_walk[2]) == [(0, 2)]


def test_indexed_adjacency_dense_and_sorted(spark):
    g = from_pairs(spark, [(0, 5), (0, 3), (0, 9), (1, 2), (0, 3)])
    rows = {(r["src"], r["idx"]): (r["dst"], r["outdeg"])
            for r in indexed_adjacency(g).collect()}
    assert rows == {(0, 0): (3, 3), (0, 1): (5, 3), (0, 2): (9, 3),
                    (1, 0): (2, 1)}


def test_walks_sql_twin_matches_oracle():
    # twin vs oracle directly in DuckDB over an inline edge table
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3)]
    src, dst, n = oracle.parse_edges(pairs)
    edges_sql = " UNION ALL ".join(
        f"SELECT {s} AS src, {d} AS dst" for s, d in pairs)
    verts_sql = " UNION ALL ".join(
        f"SELECT {v} AS id" for v in range(n))
    q = walks_sql(f"({edges_sql})", f"({verts_sql})", walk_length=4,
                  walks_per_vertex=2)
    got = {(wid, step): v for wid, step, v in duckdb.sql(q).fetchall()}
    assert got == oracle.random_walks(src, dst, n, walk_length=4,
                                      walks_per_vertex=2)


# ----------------------------------------------- node2vec second-order walks

def _biased_walks_py(pairs, n, walk_length, walks_per_vertex, seed=42,
                     w_return=1, w_common=4, w_far=2):
    """Pure-Python brute force of the deterministic node2vec chooser."""
    import hashlib
    adj = {}
    eset = set()
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            eset.add((s, d))
    adj = {v: sorted(ds) for v, ds in adj.items()}

    def h(walk_id, step):
        m = hashlib.md5(f"{seed}|{walk_id}|{step}".encode()).hexdigest()
        return int(m[:15], 16)

    out = {}
    for v in range(n):
        for k in range(walks_per_vertex):
            wid = v * walks_per_vertex + k
            out[(wid, 0)] = v
            cur, prev = v, None
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if prev is None:
                    nxt = nbrs[h(wid, step) % len(nbrs)]
                else:
                    ws = [w_return if x == prev
                          else (w_common if (prev, x) in eset else w_far)
                          for x in nbrs]
                    r = h(wid, step) % sum(ws)
                    acc = 0
                    for x, w in zip(nbrs, ws):
                        acc += w
                        if r < acc:
                            nxt = x
                            break
                out[(wid, step)] = nxt
                prev, cur = cur, nxt
    return out


@pytest.mark.parametrize("name", ["doubleSquare", "princeton", "complete"])
def test_biased_walks_match_python_bruteforce(spark, name):
    from haskellpagerank_spark.operators.walks import biased_walks
    pairs = FIXTURE_EDGES[name]
    src, dst, n = oracle.parse_edges(pairs)
    want = _biased_walks_py(pairs, n, walk_length=4, walks_per_vertex=2)
    g = from_pairs(spark, pairs)
    got = {(r["walk_id"], r["step"]): r["vertex"]
           for r in biased_walks(g, walk_length=4,
                                 walks_per_vertex=2).collect()}
    assert got == want


def test_biased_walks_sql_twin_matches_bruteforce():
    from haskellpagerank_spark.operators.walks import biased_walks_sql
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (3, 1), (1, 0)]
    src, dst, n = oracle.parse_edges(pairs)
    edges_sql = " UNION ALL ".join(
        f"SELECT {s} AS src, {d} AS dst" for s, d in pairs)
    verts_sql = " UNION ALL ".join(f"SELECT {v} AS id" for v in range(n))
    q = biased_walks_sql(f"({edges_sql})", f"({verts_sql})", walk_length=4,
                         walks_per_vertex=2)
    got = {(wid, step): v for wid, step, v in duckdb.sql(q).fetchall()}
    assert got == _biased_walks_py(pairs, n, walk_length=4,
                                   walks_per_vertex=2)


def test_biased_walks_every_hop_is_an_edge(spark):
    from haskellpagerank_spark.operators.walks import biased_walks
    pairs = FIXTURE_EDGES["princeton"]
    eset = {(s, d) for s, d in pairs if s != d}
    g = from_pairs(spark, pairs)
    rows = biased_walks(g, walk_length=5, walks_per_vertex=2).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    for steps in by_walk.values():
        for t in range(1, max(steps) + 1):
            assert t - 1 in steps, "steps contiguous"
            assert (steps[t - 1], steps[t]) in eset

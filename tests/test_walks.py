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

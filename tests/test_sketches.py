"""FM grouped distinct-count sketches (functions/sketches.py): algorithm
exactness vs a pure-Python register simulation, cross-engine determinism,
and sketch accuracy bounds."""

from __future__ import annotations

import hashlib

import pytest

from haskellpagerank_spark.functions.sketches import (
    FM_PHI, approx_distinct, approx_distinct_sql)


def _md5_63(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rho(h: int) -> int:
    return min((h & -h).bit_length() - 1, 50)


def _fm_oracle(pairs, n_sketches=8, seed=42):
    """Pure-Python register simulation, same md5 lanes as the engine."""
    regs: dict = {}
    for key, val in pairs:
        for k in range(n_sketches):
            h = _md5_63(f"{seed}|{k}|{val}")
            regs.setdefault(key, [0] * n_sketches)
            regs[key][k] |= 1 << _rho(h)
    out = {}
    for key, ss in regs.items():
        rs = [((~s) & (s + 1)).bit_length() - 1 for s in ss]
        out[key] = round(2.0 ** (sum(rs) / len(rs)) / FM_PHI, 6)
    return out


def test_approx_distinct_matches_register_oracle(spark):
    pairs = [("a", i % 7) for i in range(40)] + \
            [("b", i) for i in range(25)] + [("c", 999)]
    df = spark.createDataFrame(pairs, "key string, val long")
    got = {r["key"]: r["est_distinct"]
           for r in approx_distinct(df, ["key"], "val").collect()}
    assert got == _fm_oracle(pairs)


def test_approx_distinct_ignores_duplicates(spark):
    """Registers are idempotent: 1000 copies of one value == 1 copy."""
    one = spark.createDataFrame([("k", 5)], "key string, val long")
    many = spark.createDataFrame([("k", 5)] * 1000, "key string, val long")
    a = approx_distinct(one, ["key"], "val").first()["est_distinct"]
    b = approx_distinct(many, ["key"], "val").first()["est_distinct"]
    assert a == b


def test_approx_distinct_duckdb_twin(spark):
    import duckdb

    pairs = [(f"g{i % 3}", i % 50) for i in range(300)]
    df = spark.createDataFrame(pairs, "key string, val long")
    got = sorted(map(tuple, approx_distinct(df, ["key"], "val").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (key VARCHAR, val BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    want = sorted(map(tuple, con.execute(approx_distinct_sql(
        "SELECT key, val FROM t", ["key"], "val")).fetchall()))
    assert got == want


def test_approx_distinct_accuracy(spark):
    """With 32 lanes the FM estimate lands within a factor of 2 of truth
    across two orders of magnitude (loose bound; the estimator's stddev is
    ~0.78/sqrt(32) in log2 scale)."""
    rows = [(f"n{n}", v) for n in (10, 100, 1000) for v in range(n)]
    df = spark.createDataFrame(rows, "key string, val long")
    got = {r["key"]: r["est_distinct"]
           for r in approx_distinct(df, ["key"], "val",
                                    n_sketches=32).collect()}
    for n in (10, 100, 1000):
        assert n / 2 <= got[f"n{n}"] <= n * 2


def test_approx_distinct_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1)], "key string, val long")
    with pytest.raises(ValueError):
        approx_distinct(df, [], "val")
    with pytest.raises(ValueError):
        approx_distinct(df, ["key"], "val", n_sketches=0)


def test_approx_distinct_ignores_nulls(spark):
    """SQL COUNT(DISTINCT) convention: NULL values contribute nothing —
    and it is the only convention Spark's concat_ws (skips NULLs) and
    DuckDB's || (nulls the hash input) can share."""
    import duckdb

    with_null = spark.createDataFrame(
        [("k", 1), ("k", 2), ("k", None)], "key string, val long")
    without = spark.createDataFrame(
        [("k", 1), ("k", 2)], "key string, val long")
    a = approx_distinct(with_null, ["key"], "val").first()["est_distinct"]
    b = approx_distinct(without, ["key"], "val").first()["est_distinct"]
    assert a == b
    con = duckdb.connect()
    con.execute("CREATE TABLE t (key VARCHAR, val BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [("k", 1), ("k", 2), ("k", None)])
    want = con.execute(approx_distinct_sql(
        "SELECT key, val FROM t", ["key"], "val")).fetchall()
    assert want[0][1] == a

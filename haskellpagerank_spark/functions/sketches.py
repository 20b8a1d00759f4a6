"""Deterministic Flajolet-Martin distinct-count sketches for grouped data.

``approx_distinct`` is the tabular sibling of the ANF machinery
(operators/anf.py — Palmer/Gibbons/Faloutsos KDD 2002 registers, public
literature): estimate COUNT(DISTINCT val) per key group without shuffling
the (key, val) pairs. At web scale this is the difference between counting
distinct URLs per host by moving 10^12 distinct pairs through a shuffle and
moving |hosts| x n_sketches 8-byte registers: each row contributes one
register per sketch lane, the groupBy bit_or is map-side combined, and the
estimate is 2^mean(lowest-zero position) / phi.

Like every sketch on the gate surface the randomness is a seeded md5 hash,
so the computation is DETERMINISTIC and hash-exactly reproducible in DuckDB
(``approx_distinct_sql``) — approximate w.r.t. the true distinct count
(that's the sketch), exact w.r.t. the algorithm. All register ops are
codegen'd JVM intrinsics (md5 / conv / shiftleft / bit_or / bit_count); no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# FM bias correction (Flajolet-Martin 1985, phi) — same constant as anf.py
FM_PHI = 0.77351


def _md5_63(s):
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _trailing_zeros(col):
    low = col.bitwiseAND(-col)
    return F.bit_count(low - 1)


def _lowest_zero(col):
    return F.bit_count(F.bitwise_not(col).bitwiseAND(col + 1) - 1)


def approx_distinct(df: DataFrame, key_cols: list[str], val_col: str,
                    n_sketches: int = 8, seed: int = 42) -> DataFrame:
    """Per-key FM estimate of COUNT(DISTINCT val_col).

    Returns key_cols + (est_distinct double, rounded 6). Every input row
    expands to ``n_sketches`` register rows (a constant-factor map, no
    shuffle growth in distinct keys); the only shuffle is the map-side
    combined bit_or keyed (key..., k) — bounded by |keys| x n_sketches
    regardless of group skew, the whole point at 100 TB.

    NULL values are dropped first — the SQL COUNT(DISTINCT) convention,
    and the only convention both engines can share (Spark's concat_ws
    skips NULL args while DuckDB's || nulls the whole hash input, so an
    unfiltered NULL would silently diverge).
    """
    if not key_cols:
        raise ValueError("approx_distinct needs at least one key column")
    if n_sketches < 1:
        raise ValueError("n_sketches must be >= 1")
    df = df.where(F.col(val_col).isNotNull())
    ks = df.sparkSession.range(n_sketches).select(F.col("id").alias("_k"))
    h = _md5_63(F.concat_ws(
        "|", F.lit(seed).cast("string"), F.col("_k").cast("string"),
        F.col(val_col).cast("string")))
    rho = F.least(_trailing_zeros(h), F.lit(50))
    regs = (df.select(*key_cols, F.col(val_col)).crossJoin(F.broadcast(ks))
            .withColumn("_rho", rho)
            .selectExpr(*key_cols, "_k",
                        "shiftleft(CAST(1 AS BIGINT), CAST(_rho AS INT))"
                        " AS _s"))
    state = regs.groupBy(*key_cols, "_k").agg(F.bit_or("_s").alias("_s"))
    return (state.select(*key_cols, _lowest_zero(F.col("_s")).alias("_r"))
            .groupBy(*key_cols).agg(F.avg("_r").alias("_avg_r"))
            .select(*key_cols,
                    F.round(F.pow(F.lit(2.0), F.col("_avg_r")) / FM_PHI, 6)
                    .alias("est_distinct")))


def approx_distinct_sql(table_sql: str, key_cols: list[str], val_expr: str,
                        n_sketches: int = 8, seed: int = 42) -> str:
    """DuckDB twin of ``approx_distinct`` — same md5 seeding, same bit
    arithmetic, same rounding. ``val_expr`` is the value expression as SQL
    (cast to VARCHAR internally, matching Spark's string cast of the
    column)."""
    keys = ", ".join(key_cols)
    return f"""
        WITH base AS (SELECT * FROM ({table_sql})
                      WHERE {val_expr} IS NOT NULL),
        ks AS (SELECT UNNEST(range({n_sketches})) AS k),
        regs AS (
            SELECT {keys}, k,
                   CAST(1 AS BIGINT) << LEAST(bit_count((h & -h) - 1), 50)
                       AS s
            FROM (SELECT {keys}, ks.k AS k,
                         CAST('0x' || substr(md5(CAST({seed} AS VARCHAR)
                              || '|' || CAST(ks.k AS VARCHAR) || '|'
                              || CAST({val_expr} AS VARCHAR)), 1, 15)
                             AS BIGINT) AS h
                  FROM base, ks)),
        st AS (SELECT {keys}, k, bit_or(s) AS s FROM regs GROUP BY ALL)
        SELECT {keys},
               ROUND(pow(2.0, avg_r) / {FM_PHI!r}, 6) AS est_distinct
        FROM (SELECT {keys},
                     AVG(bit_count(((~s) & (s + 1)) - 1)) AS avg_r
              FROM st GROUP BY ALL)
    """

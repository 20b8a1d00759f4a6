"""Derive link graphs from the driver's TPC-H-ish parquet tables.

The driver's correctness harness (CORRECTNESS_r{N}.json) compares our Spark
queries against DuckDB SQL over the same tables, so the graphs used there
must be definable identically in both engines. Two graphs:

- **cs graph** (customer→supplier): one edge instance per lineitem, from the
  ordering customer to the supplying supplier. Vertex space is dense:
  customers keep their key, suppliers are offset by num_customers
  (keys are 0-based dense in the testdata). ~|lineitem| edge instances —
  a real multiset workload (duplicate edges count multiply, matching the
  reference parser's contract, EdgeArray.hs:78-89).

- **nation graph** (25 vertices): distinct nation→nation edges where a
  customer of nation A bought from a supplier of nation B (A != B). Small and
  dense — used for oracles that need full-fixpoint SQL (recursive-CTE CC,
  unrolled PageRank iterations, triangle counting).

Both loaders read only the columns they need (Catalyst prunes the parquet
scan down to the key columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import Graph, from_edge_df


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def num_customers(spark: SparkSession, sf_dir: str) -> int:
    row = _read(spark, sf_dir, "customer").agg(
        (F.max("c_custkey") + 1).alias("n")).first()
    return int(row["n"])


def cs_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) multiset: customer -> offset supplier, one per lineitem."""
    n_cust = num_customers(spark, sf_dir)
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + F.lit(n_cust)).cast("long").alias("dst"),
        )
    )


def cs_graph(spark: SparkSession, sf_dir: str) -> Graph:
    n_cust = num_customers(spark, sf_dir)
    n_supp = int(
        _read(spark, sf_dir, "supplier").agg(
            (F.max("s_suppkey") + 1).alias("n")).first()["n"]
    )
    return from_edge_df(cs_edges(spark, sf_dir), num_vertices=n_cust + n_supp)


# SQL fragment producing the same cs edge set in DuckDB (views pre-registered
# by the driver). Kept as a CTE body so oracle queries compose around it.
CS_EDGES_SQL = """
    SELECT CAST(o.o_custkey AS BIGINT) AS src,
           CAST(l.l_suppkey + (SELECT MAX(c_custkey) + 1 FROM customer) AS BIGINT) AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

CS_NUM_VERTICES_SQL = """
    (SELECT MAX(c_custkey) + 1 FROM customer) + (SELECT MAX(s_suppkey) + 1 FROM supplier)
"""


def nation_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed nation->nation edges (customer nation -> supplier
    nation over a shared lineitem), self-loops excluded."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def nation_graph(spark: SparkSession, sf_dir: str) -> Graph:
    n = int(
        _read(spark, sf_dir, "nation").agg(
            (F.max("n_nationkey") + 1).alias("n")).first()["n"]
    )
    return from_edge_df(nation_edges(spark, sf_dir), num_vertices=n)


NATION_EDGES_SQL = """
    SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                    CAST(s.s_nationkey AS BIGINT) AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
"""

NATION_NUM_VERTICES_SQL = "(SELECT MAX(n_nationkey) + 1 FROM nation)"

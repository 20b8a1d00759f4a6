"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query: full M0->M1 pipeline (deterministic
                 Common-Crawl-style pages -> vectorized href extraction ->
                 dictionary encoding -> distributed PageRank -> top pages),
                 plus the sf0.001 cs-link-graph ranks joined in.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-data-pipeline family); see
                 haskellpagerank_spark/queries.py.
oracle_sql()   — DuckDB twins for every SQL-expressible query; hash-exact
                 (identical aliases + identical rounding on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from haskellpagerank_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-20 over the sf0.001 customer->supplier link
    graph (dense-id contract, redistribute sink mode, damping 0.85)."""
    from haskellpagerank_spark.operators.pagerank import (
        PageRankConfig, top_k)
    from haskellpagerank_spark.operators.pagerank_csr import run_pagerank_auto
    from haskellpagerank_spark.sources.tpch_graph import cs_graph

    g = cs_graph(spark, "/root/testdata/sf0.001")
    res = run_pagerank_auto(g, PageRankConfig(
        damping=0.85, tol=1e-6, tol_norm="l1", sink_mode="redistribute",
        max_iters=100))
    return top_k(res.ranks, 20).select(
        "id", F.round("rank", 8).alias("rank"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

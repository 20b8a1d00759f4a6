"""Benchmark-result post-processing — the reference's benchmarkparser.

Re-expresses /root/reference/benchmarkparser/Main.hs as DataFrame
transformations (the reference reads criterion CSV, groups rows by graph,
pivots method columns, normalizes, and emits a LaTeX-friendly table —
Main.hs:212-222):

- ``parse_bench_names``  — split the criterion name column "group/graph/method"
  and latexify (splitOn "/" + replace "_" "-", Main.hs:61-62).
- ``average_results``    — mean over repeated (graph, method) runs
  (averageResults, Main.hs:172-183).
- ``feature_scale``      — per-graph min-max scaling of method times
  (featureScale, Main.hs:120-144).
- ``normalize_l2``       — per-graph L2 normalization (normalizeL2,
  Main.hs:146-167).
- ``pivot_methods``      — graph x method wide table for the LaTeX emitter.

All Catalyst-native (groupBy window aggs); each is a one-liner on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BENCH_SCHEMA = "name string, mean double"


def parse_bench_names(df: DataFrame, name_col: str = "name") -> DataFrame:
    """'group/graph/method' -> (grp, graph, method) with '_'->'-'
    latexification of the graph name."""
    parts = F.split(F.col(name_col), "/")
    return df.select(
        parts.getItem(0).alias("grp"),
        F.regexp_replace(parts.getItem(1), "_", "-").alias("graph"),
        parts.getItem(2).alias("method"),
        "*",
    ).drop(name_col)


def average_results(df: DataFrame) -> DataFrame:
    """Mean over repeated runs of the same (graph, method)."""
    return df.groupBy("graph", "method").agg(
        F.avg("mean").alias("mean"))


def feature_scale(df: DataFrame) -> DataFrame:
    """Min-max scale times within each graph: (x - min) / (max - min);
    degenerate groups (max == min) scale to 0.0."""
    w = Window.partitionBy("graph")
    lo, hi = F.min("mean").over(w), F.max("mean").over(w)
    return df.withColumn(
        "scaled",
        F.when(hi == lo, F.lit(0.0)).otherwise((F.col("mean") - lo) / (hi - lo)),
    )


def normalize_l2(df: DataFrame) -> DataFrame:
    """L2-normalize times within each graph: x / sqrt(sum x^2)."""
    w = Window.partitionBy("graph")
    norm = F.sqrt(F.sum(F.col("mean") * F.col("mean")).over(w))
    return df.withColumn(
        "normalized",
        F.when(norm == 0, F.lit(0.0)).otherwise(F.col("mean") / norm))


def pivot_methods(df: DataFrame, value_col: str = "mean") -> DataFrame:
    """graph x method wide table (the LaTeX .dat layout)."""
    return df.groupBy("graph").pivot("method").agg(
        F.first(value_col))

"""Seeded, Catalyst-native synthetic link-graph generator.

For scaling benchmarks we need graphs far larger than the sandbox page
generator comfortably produces (its per-page html build is Python). This
generator emits the *edge table directly* — entirely with built-in
expressions (range + explode + xxhash64), so it runs at cluster speed and
is deterministic for a given (num_vertices, avg_degree, seed) regardless of
partitioning: every edge is a pure hash of (vertex, slot, seed).

Skew realism: a ``hub_prob`` fraction of edges point into the first
``hub_count`` vertices — the power-law-ish in-degree concentration that
makes web-graph shuffles interesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import Graph, from_edge_df


def synth_edges(spark: SparkSession, num_vertices: int, avg_degree: int = 10,
                hub_fraction: float = 0.001, hub_prob_mod: int = 5,
                seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """(src, dst) edge table: per vertex, ``1 + xxhash % (2*avg_degree)``
    out-edges; 1/``hub_prob_mod`` of them land in the hub id range."""
    hub_count = max(1, int(num_vertices * hub_fraction))
    parts = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, num_vertices, numPartitions=parts)
    deg = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(0)),
                 F.lit(2 * avg_degree)) + 1
    e = base.select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(0), deg - 1)).alias("slot"),
    )
    h = F.xxhash64("src", "slot", F.lit(seed))
    is_hub = F.pmod(h, F.lit(hub_prob_mod)) == 0
    dst = F.when(is_hub, F.pmod(h, F.lit(hub_count))).otherwise(
        F.pmod(F.xxhash64(h), F.lit(num_vertices)))
    return e.select("src", dst.cast("long").alias("dst"))


def synth_graph(spark: SparkSession, num_vertices: int, avg_degree: int = 10,
                **kw) -> Graph:
    return from_edge_df(
        synth_edges(spark, num_vertices, avg_degree, **kw),
        num_vertices=num_vertices)

"""Deterministic random-walk corpus generation (DeepWalk / node2vec-style
first-order walks) over the edge DataFrame.

North-rule scope extension: random-walk corpora are the standard input for
graph-embedding training (DeepWalk, KDD 2014; node2vec, KDD 2016) — the
training-data-pipeline counterpart of the link-graph analytics the rest of
the engine provides. No reference analogue (the reference's only stochastic
piece is coloring priorities, graphcoloring/Data/Graph/GraphColoring.hs).

The walk is *deterministic*: at step t, walk w at vertex v moves to the
neighbor with index  H(seed, w, t) mod outdeg(v)  in v's dst-sorted distinct
adjacency. H is the md5-derived 63-bit integer of the string
``"{seed}|{walk_id}|{step}"`` — reproducible bit-for-bit in Spark
(``conv(substring(md5(s), 1, 15), 16, 10)``), DuckDB
(``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``) and Python
(``hashlib.md5``), so the whole corpus is hash-exactly oracle-able while
remaining uniform-ish over neighbors. Walks stop early at sinks.

Scale shape: one |E| window (row_number over (src, dst)) builds the indexed
adjacency once; each step is (1) a |frontier| join against the |V| degree
table to compute the pick, then (2) a composite-key equi-join
(src, idx) against the indexed adjacency — both plain shuffles on their
keys, map-side combined nowhere needed, no Python anywhere. Skewed hubs
cost nothing extra: each walk consumes exactly ONE adjacency row per step
regardless of degree (the join is on the picked index, not an expansion
over the neighbor list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph import Graph


def _pick_hash(seed: int, walk_col, step: int):
    """63-bit integer from md5("{seed}|{walk_id}|{step}") — first 15 hex
    digits, so always non-negative and identical across engines."""
    s = F.concat_ws("|", F.lit(seed).cast("string"),
                    walk_col.cast("string"), F.lit(step).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def indexed_adjacency(g: Graph) -> DataFrame:
    """(src, dst, idx, outdeg): dst-sorted distinct adjacency with a dense
    0-based per-src index — the walk's lookup table. Built once per corpus;
    the window and the degree count shuffle on src only."""
    e = g.edges.where(F.col("src") != F.col("dst")) \
        .dropDuplicates(["src", "dst"])
    w = Window.partitionBy("src").orderBy("dst")
    idx = e.select(
        "src", "dst", (F.row_number().over(w) - 1).alias("idx"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    return idx.join(deg, "src")


def random_walks(g: Graph, walk_length: int = 5,
                 walks_per_vertex: int = 1, seed: int = 42) -> DataFrame:
    """Generate ``walks_per_vertex`` deterministic walks of up to
    ``walk_length`` steps from every vertex. Returns
    (walk_id, step, vertex) rows — step 0 is the start vertex; walks
    reaching a sink stop early. walk_id = start * walks_per_vertex + k.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    spark = g.spark
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    adj = indexed_adjacency(g).repartition(shuffle_p, "src").persist()
    adj.count()
    deg = adj.select("src", "outdeg").dropDuplicates(["src"])

    starts = (
        g.vertices()
        .crossJoin(spark.range(walks_per_vertex).select(
            F.col("id").alias("k")))
        .select(
            (F.col("id") * walks_per_vertex + F.col("k")).alias("walk_id"),
            F.col("id").alias("vertex"))
    )
    out = starts.select("walk_id", F.lit(0).alias("step"), "vertex") \
        .localCheckpoint(eager=True)
    frontier = out
    for step in range(1, walk_length + 1):
        nxt = (
            frontier.select("walk_id", F.col("vertex").alias("src"))
            .join(deg, "src")
            .select(
                "walk_id", "src",
                (_pick_hash(seed, F.col("walk_id"), step)
                 % F.col("outdeg")).alias("idx"))
            .join(adj.select("src", "idx", "dst"), ["src", "idx"])
            .select("walk_id", F.lit(step).alias("step"),
                    F.col("dst").alias("vertex"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt
    adj.unpersist()
    return out


def walks_sql(edges_sql: str, verts_sql: str, walk_length: int,
              walks_per_vertex: int = 1, seed: int = 42) -> str:
    """DuckDB twin of ``random_walks`` — same md5 chooser, unrolled steps.
    Lives here (not sql_twins.py) to keep the chooser definition and its
    twin side by side."""
    ctes = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx "
        "FROM e)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg "
        "FROM e GROUP BY 1)",
        f"s0 AS MATERIALIZED (SELECT v.id * {walks_per_vertex} + k.k "
        "AS walk_id, v.id AS vertex "
        f"FROM ({verts_sql}) v CROSS JOIN "
        f"(SELECT UNNEST(range({walks_per_vertex})) AS k) k)",
    ]
    for step in range(1, walk_length + 1):
        p = step - 1
        h = (f"CAST('0x' || substr(md5(CAST({seed} AS VARCHAR) || '|' || "
             f"CAST(s{p}.walk_id AS VARCHAR) || '|' || "
             f"CAST({step} AS VARCHAR)), 1, 15) AS BIGINT)")
        ctes.append(
            f"s{step} AS MATERIALIZED ("
            f"SELECT s{p}.walk_id, adj.dst AS vertex "
            f"FROM s{p} JOIN deg ON deg.src = s{p}.vertex "
            f"JOIN adj ON adj.src = s{p}.vertex "
            f"AND adj.idx = {h} % deg.outdeg)")
    selects = [
        f"SELECT walk_id, {s} AS step, vertex FROM s{s}"
        for s in range(walk_length + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)

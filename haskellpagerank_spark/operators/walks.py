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


# ----------------------------------------------- node2vec second-order walks

def biased_walks(g: Graph, walk_length: int = 5,
                 walks_per_vertex: int = 1, seed: int = 42,
                 w_return: int = 1, w_common: int = 4,
                 w_far: int = 2) -> DataFrame:
    """Deterministic node2vec-style SECOND-order walks (Grover & Leskovec,
    KDD 2016): at vertex v having arrived from u, candidate x is weighted

    - ``w_return`` if x == u                     (node2vec's 1/p)
    - ``w_common`` if the edge u -> x exists     (distance 1 from u)
    - ``w_far``    otherwise                     (node2vec's 1/q)

    Weights are INTEGERS so the chooser is pure integer arithmetic and
    bit-exact across engines: the pick is ``H(seed, walk, step) mod
    total_weight`` landing in the cumulative-weight interval of the
    dst-sorted candidates (H = the same md5-derived 63-bit integer as
    :func:`random_walks`). Step 1 has no predecessor and uses the
    first-order uniform chooser.

    Scale shape: unlike the first-order walk (ONE adjacency row per walk
    per step), a second-order step must weigh all deg(v) candidates —
    inherent to node2vec (the alias-table trick precomputes O(sum deg^2)
    state, strictly worse at web scale). Per step: one deg(v)-expansion
    join + one broadcast-ish semi-classification join against the u
    out-adjacency + one cumulative window per (walk, step) — all Catalyst,
    no Python. Hubs re-enter the cost; cap degree via sampling upstream
    if walking a hubby graph.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    spark = g.spark
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    adj = indexed_adjacency(g).repartition(shuffle_p, "src").persist()
    adj.count()
    deg = adj.select("src", "outdeg").dropDuplicates(["src"])
    edge_set = adj.select(F.col("src").alias("u"),
                          F.col("dst").alias("x"),
                          F.lit(True).alias("u_knows_x"))

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

    # step 1: first-order uniform pick (no predecessor yet)
    frontier = (
        starts.select("walk_id", F.col("vertex").alias("src"))
        .join(deg, "src")
        .select("walk_id", "src",
                (_pick_hash(seed, F.col("walk_id"), 1)
                 % F.col("outdeg")).alias("idx"))
        .join(adj.select("src", "idx", "dst"), ["src", "idx"])
        .select("walk_id", F.col("src").alias("prev"),
                F.col("dst").alias("vertex"))
        .localCheckpoint(eager=True)
    )
    out = out.unionByName(frontier.select(
        "walk_id", F.lit(1).alias("step"), "vertex"))

    from pyspark.sql import Window
    for step in range(2, walk_length + 1):
        cand = (
            frontier.select("walk_id", "prev",
                            F.col("vertex").alias("src"))
            .join(adj.select("src", "idx", "dst"), "src")
        )
        weighted = (
            cand.join(edge_set,
                      (cand["prev"] == edge_set["u"])
                      & (cand["dst"] == edge_set["x"]), "left")
            .select(
                "walk_id", "src", "idx", "dst",
                F.when(F.col("dst") == F.col("prev"),
                       F.lit(w_return))
                .when(F.col("u_knows_x"), F.lit(w_common))
                .otherwise(F.lit(w_far)).alias("w"))
        )
        win = Window.partitionBy("walk_id").orderBy("idx")
        cum = weighted.select(
            "walk_id", "dst",
            (F.sum("w").over(win) - F.col("w")).alias("lo"),
            F.sum("w").over(win).alias("hi"),
            F.sum("w").over(Window.partitionBy("walk_id")).alias("tot"))
        nxt = (
            cum.withColumn(
                "r", _pick_hash(seed, F.col("walk_id"), step)
                % F.col("tot"))
            .where((F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi")))
            .join(frontier.select("walk_id",
                                  F.col("vertex").alias("prev")), "walk_id")
            .select("walk_id", "prev", F.col("dst").alias("vertex"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt.select(
            "walk_id", F.lit(step).alias("step"), "vertex"))
        frontier = nxt
    adj.unpersist()
    return out


def biased_walks_sql(edges_sql: str, verts_sql: str, walk_length: int,
                     walks_per_vertex: int = 1, seed: int = 42,
                     w_return: int = 1, w_common: int = 4,
                     w_far: int = 2) -> str:
    """DuckDB twin of ``biased_walks`` — identical md5 chooser and integer
    cumulative-weight pick, unrolled steps."""
    def h(step, walk_expr):
        return (f"CAST('0x' || substr(md5(CAST({seed} AS VARCHAR) || '|' || "
                f"CAST({walk_expr} AS VARCHAR) || '|' || "
                f"CAST({step} AS VARCHAR)), 1, 15) AS BIGINT)")

    ctes = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx "
        "FROM e)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg "
        "FROM e GROUP BY 1)",
        f"f0 AS MATERIALIZED (SELECT v.id * {walks_per_vertex} + k.k "
        "AS walk_id, v.id AS vertex "
        f"FROM ({verts_sql}) v CROSS JOIN "
        f"(SELECT UNNEST(range({walks_per_vertex})) AS k) k)",
        "f1 AS MATERIALIZED (SELECT f0.walk_id, f0.vertex AS prev, "
        "adj.dst AS vertex "
        "FROM f0 JOIN deg ON deg.src = f0.vertex "
        "JOIN adj ON adj.src = f0.vertex "
        f"AND adj.idx = {h(1, 'f0.walk_id')} % deg.outdeg)",
    ]
    for step in range(2, walk_length + 1):
        p = step - 1
        ctes.append(
            f"c{step} AS MATERIALIZED ("
            f"SELECT f.walk_id, f.prev, adj.idx, adj.dst, "
            f"CASE WHEN adj.dst = f.prev THEN {w_return} "
            f"WHEN k.src IS NOT NULL THEN {w_common} "
            f"ELSE {w_far} END AS w "
            f"FROM f{p} f JOIN adj ON adj.src = f.vertex "
            "LEFT JOIN e k ON k.src = f.prev AND k.dst = adj.dst)"
        )
        ctes.append(
            f"w{step} AS MATERIALIZED ("
            "SELECT walk_id, dst, "
            "SUM(w) OVER (PARTITION BY walk_id ORDER BY idx) - w AS lo, "
            "SUM(w) OVER (PARTITION BY walk_id ORDER BY idx) AS hi, "
            "SUM(w) OVER (PARTITION BY walk_id) AS tot "
            f"FROM c{step})"
        )
        ctes.append(
            f"f{step} AS MATERIALIZED ("
            f"SELECT w.walk_id, f.vertex AS prev, w.dst AS vertex "
            f"FROM w{step} w JOIN f{p} f ON f.walk_id = w.walk_id "
            f"WHERE {h(step, 'w.walk_id')} % w.tot >= w.lo "
            f"AND {h(step, 'w.walk_id')} % w.tot < w.hi)"
        )
    selects = ["SELECT walk_id, 0 AS step, vertex FROM f0"] + [
        f"SELECT walk_id, {s} AS step, vertex FROM f{s}"
        for s in range(1, walk_length + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)

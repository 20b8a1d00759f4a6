"""Triangle counting — one-shot 2-hop join + closure semi-join.

North-rule scope (no reference analogue; the reference's nearest relative is
the 2-distance neighborhood self-join, GraphColoring.hs:358-363 →
SURVEY.md §2.3). Standard distributed recipe:

1. canonicalize the undirected simple graph to src < dst (each unordered
   pair once);
2. orient every edge low-degree -> high-degree ("degree ordering") so the
   2-hop expansion fans out from the *smaller* adjacency side — this is the
   classic guard against quadratic blowup on hub vertices at web scale
   (a hub of degree 10^6 contributes pairs only through its lower-degree
   neighbors);
3. wedges = oriented ⋈ oriented on the middle vertex; triangles = wedges
   semi-joined against the oriented closure edge.

All joins are Catalyst equi-joins (sort-merge / shuffled-hash with AQE);
counting is a plain agg. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import Graph, undirected_simple_edges


def _degree_oriented(g: Graph) -> DataFrame:
    """Undirected simple edges oriented from lower (degree, id) to higher —
    a strict total order, so the oriented graph is acyclic."""
    und = undirected_simple_edges(g)  # both directions, deduped
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = (
        und.join(deg.withColumnRenamed("id", "src")
                 .withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("deg", "ddeg"), "dst")
    )
    return e.where(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def triangles(g: Graph) -> DataFrame:
    """All triangles as (a, b, c) vertex triples, each exactly once
    (a, b, c in degree-order orientation)."""
    e = _degree_oriented(g)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("a"),
        F.col("e1.dst").alias("b"),
        F.col("e2.dst").alias("c"),
    )
    return wedges.join(
        e3,
        (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")),
        "left_semi",
    )


def triangle_count(g: Graph) -> DataFrame:
    """Single-row (n_triangles long)."""
    return triangles(g).agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_count_incremental(g_old: Graph, new_edges: DataFrame,
                               prev_count: int) -> DataFrame:
    """Triangle count after adding ``new_edges`` to ``g_old``, without
    re-joining the whole graph: new total = ``prev_count`` + the number of
    distinct triangles containing at least one genuinely-new edge.

    Per-crawl-batch cost is O(|Δ| × degree of the smaller endpoint), not
    O(|E|^1.5): each new canonical edge expands its *lower-degree* endpoint's
    adjacency (the same hub guard as the one-shot count) and semi-joins the
    closure; triangles found via several new edges are deduped by their
    sorted vertex triple — a shuffle over delta triangles only. Edge
    additions only (the append sink never deletes). Returns a single-row
    (n_triangles long), identical to ``triangle_count`` on the union graph.
    """
    und_old = undirected_simple_edges(g_old)
    canon_old = und_old.where(F.col("src") < F.col("dst"))
    canon_new = (
        new_edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .join(canon_old, ["src", "dst"], "left_anti")
    )
    und_all = und_old.unionAll(
        canon_new.unionAll(
            canon_new.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    ).dropDuplicates(["src", "dst"])
    deg = und_all.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))

    # orient each new edge from its lower-(degree, id) endpoint, so the
    # adjacency expansion fans out on the smaller side even when the new
    # edge touches a mega-hub
    e = (
        canon_new
        .join(deg.withColumnRenamed("id", "src")
              .withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("deg", "ddeg"), "dst")
        .select(
            F.when((F.col("sdeg") < F.col("ddeg"))
                   | ((F.col("sdeg") == F.col("ddeg"))
                      & (F.col("src") < F.col("dst"))),
                   F.col("src")).otherwise(F.col("dst")).alias("lo"),
            F.when((F.col("sdeg") < F.col("ddeg"))
                   | ((F.col("sdeg") == F.col("ddeg"))
                      & (F.col("src") < F.col("dst"))),
                   F.col("dst")).otherwise(F.col("src")).alias("hi"),
        )
    )
    adj = und_all.select(F.col("src").alias("lo"), F.col("dst").alias("w"))
    cand = e.join(adj, "lo").where(F.col("w") != F.col("hi"))
    closed = cand.join(
        und_all,
        (F.col("w") == F.col("src")) & (F.col("hi") == F.col("dst")),
        "left_semi",
    )
    delta = (
        closed.select(F.array_sort(F.array("lo", "hi", "w")).alias("t"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return delta.select(
        (F.col("n") + F.lit(int(prev_count))).alias("n_triangles"))


def triangles_per_vertex(g: Graph) -> DataFrame:
    """(id, n_triangles) for every vertex in the dense space (0 for
    triangle-free vertices) — local clustering numerator."""
    t = triangles(g)
    stacked = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    per = stacked.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    return (
        g.vertices()
        .join(per, "id", "left")
        .select("id", F.coalesce("n", F.lit(0)).alias("n_triangles"))
    )


def sampled_triangle_count(
    g: Graph, keep_num: int = 2, keep_den: int = 5, seed: int = 12345
) -> DataFrame:
    """DOULION edge-sampled triangle estimate (Tsourakakis, Kang, Miller,
    Faloutsos — KDD'09): keep each canonical undirected edge independently
    with probability p = keep_num/keep_den, count triangles of the sampled
    subgraph with the exact degree-oriented kernel, scale by 1/p^3 (a
    triangle survives iff all three of its edges were kept). At web scale
    the wedge join runs over ~p*|E| edges — the 2-hop fan-out (the
    quadratic-in-degree term) shrinks by p^2.

    The sample is DETERMINISTIC: an LCG over the canonical (src, dst) pair
    — the same hash family as sql_twins.MATCHING_PRIORITY_SQL — decides
    membership, so the DuckDB gate twin reproduces the exact sampled
    count; ``seed`` is the LCG additive constant.

    Returns one row (n_sampled long, n_triangles_est double); n_sampled is
    the exact triangle count of the sampled subgraph (the gate-checked
    value), n_triangles_est = n_sampled / p^3 the unbiased estimator.
    """
    if not 0 < keep_num <= keep_den:
        raise ValueError(f"need 0 < keep_num <= keep_den, got "
                         f"{keep_num}/{keep_den}")
    canon = undirected_simple_edges(g).where(F.col("src") < F.col("dst"))
    lcg = (F.col("src") * F.lit(1103515245) + F.col("dst") * F.lit(12345)
           + F.lit(seed)) % F.lit(2147483648)
    kept = canon.where(lcg % F.lit(keep_den) < F.lit(keep_num))
    raw = triangle_count(g.with_edges(kept))
    p = keep_num / keep_den
    return raw.select(
        F.col("n_triangles").alias("n_sampled"),
        (F.col("n_triangles") / F.lit(p ** 3)).alias("n_triangles_est"),
    )

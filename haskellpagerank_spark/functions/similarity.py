"""Embedding similarity search: brute-force cosine + LSH-bucketed ANN.

Over `embeddings(vec_id: long, embedding: array<float>, label: int)`.

- brute-force top-k / threshold pairs: `zip_with` + `aggregate` dot products
  — Catalyst-native higher-order functions, fully codegen'd, no Python. The
  correctness baseline; O(|Q| * |D| * dim).
- random-hyperplane LSH ANN: 16-bit signatures from deterministic
  (seeded, hash-generated) hyperplanes; candidates = same bucket in any of
  ``tables`` signature tables, then exact cosine re-rank. The scale path:
  shuffles 2-byte bucket keys instead of the full O(n^2) pair space.

At 100 TB the embedding table is bucketed by signature once (write-time),
making repeated ANN queries a bucket-pruned scan + local top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, a: str, b: str,
                out: str = "cosine") -> DataFrame:
    """Adds round(cosine(a, b), 6) computed in double precision."""
    ad = F.transform(F.col(a), lambda x: x.cast("double"))
    bd = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, F.round(
        _dot(ad, bd) / (_norm(ad) * _norm(bd)), 6))


def cosine_pairs(emb: DataFrame, threshold: float,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — brute force.

    The exact baseline (and the DuckDB-oracle query). Quadratic; use
    ``ann_lsh_pairs`` at scale.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(joined, "va", "vb")
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ann_topk_bruteforce(emb: DataFrame, query_ids: list[int], k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    (query_id, neighbor_id, cosine) — k rows per query, deterministic
    tie-break on neighbor id. The query side is tiny -> broadcast it.
    """
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
    d = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("vd"))
    scored = with_cosine(
        F.broadcast(q).crossJoin(d)
        .where(F.col("query_id") != F.col("neighbor_id")),
        "vq", "vd",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random unit hyperplanes, shape (tables, bits, dim)."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((tables, bits, dim))
    return h / np.linalg.norm(h, axis=2, keepdims=True)


def lsh_signatures(emb: DataFrame, dim: int, bits: int = 16,
                   tables: int = 4, seed: int = 42,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket) — sign-random-projection signatures.

    Hyperplanes are plan literals (seeded numpy); signature bit = sign of
    the dot product, folded into an int bucket. All codegen'd arithmetic.
    """
    planes = _hyperplanes(dim, bits, tables, seed)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = []
    for t in range(tables):
        bucket = None
        for b in range(bits):
            plane = F.array(*[F.lit(float(v)) for v in planes[t, b]])
            bit = F.when(_dot(vd, plane) > 0, F.lit(1 << b)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        rows.append(F.struct(F.lit(t).alias("table"),
                             bucket.cast("long").alias("bucket")))
    return emb.select(
        F.col(id_col).alias("id"), F.explode(F.array(*rows)).alias("tb")
    ).select("id", "tb.table", "tb.bucket")


def fit_ivf_centroids(emb: DataFrame, n_cells: int = 16,
                      sample: int = 4096, iters: int = 5,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> np.ndarray:
    """Deterministic IVF coarse quantizer: spherical k-means (Lloyd) on a
    bounded, id-ordered sample, driver-side numpy. Sample size is fixed, so
    the fit cost is O(1) in corpus size — the 100 TB path trains on a
    sample and assigns distributively."""
    pdf = (emb.orderBy(id_col).limit(sample)
           .select(vec_col).toPandas())
    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = xn[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(xn @ c.T, axis=1)
        for j in range(n_cells):
            members = xn[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def ivf_assignments(emb: DataFrame, centroids: np.ndarray,
                    n_probe: int = 1, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, cell) — each vector's ``n_probe`` nearest coarse cells, via an
    Arrow-batched numpy matmul (centroids ride in the closure: tiny)."""
    import pandas as pd

    c = np.asarray(centroids, dtype=np.float64)

    def kernel(batches):
        for b in batches:
            if not len(b):
                continue
            v = np.array(b[vec_col].tolist(), dtype=np.float64)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                                1e-12)
            sims = vn @ c.T
            p = min(n_probe, sims.shape[1])
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            ids = np.repeat(b[id_col].to_numpy(np.int64), p)
            yield pd.DataFrame({"id": ids,
                                "cell": top.reshape(-1).astype(np.int32)})

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="id long, cell int")


def ann_ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                 n_cells: int = 16, n_probe: int = 4,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: coarse-quantize the corpus once (cell-bucketed scan at
    production scale), probe the queries' ``n_probe`` nearest cells, exact
    cosine re-rank inside the probed cells. Same output schema as
    ``ann_topk_bruteforce``; recall < 1 by construction (pytest measures
    it against brute force)."""
    cents = fit_ivf_centroids(emb, n_cells=n_cells,
                              id_col=id_col, vec_col=vec_col)
    cells = ivf_assignments(emb, cents, n_probe=1, id_col=id_col,
                            vec_col=vec_col)
    q = emb.where(F.col(id_col).isin(query_ids))
    qcells = ivf_assignments(q, cents, n_probe=n_probe, id_col=id_col,
                             vec_col=vec_col).withColumnRenamed(
                                 "id", "query_id")
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vd"))
    qv = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
    cand = (
        F.broadcast(qcells).join(cells, "cell")
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = with_cosine(
        cand.join(F.broadcast(qv), "query_id")
        .join(v.withColumnRenamed("id", "neighbor_id"), "neighbor_id"),
        "vq", "vd")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ann_lsh_pairs(emb: DataFrame, dim: int, threshold: float,
                  bits: int = 12, tables: int = 6, seed: int = 42,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Approximate near-neighbor pairs: LSH bucket candidates + exact
    cosine re-rank (>= threshold). Same output schema as ``cosine_pairs``;
    recall < 1 by construction — pytest measures it against brute force."""
    sig = lsh_signatures(emb, dim, bits, tables, seed, id_col, vec_col)
    cand = (
        sig.alias("x").join(sig.alias("y"), ["table", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    joined = (
        cand.join(v.select(F.col("id").alias("id_a"),
                           F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"),
                       F.col("v").alias("vb")), "id_b")
    )
    return (
        with_cosine(joined, "va", "vb")
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )

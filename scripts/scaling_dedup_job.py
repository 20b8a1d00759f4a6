"""One dedup/ANN scaling-measurement run at a given parallelism, fresh JVM.

The 2-vs-8-core scaling protocol (BENCH/BASELINE.md §2-3c) covers
pagerank/cc/lp/extract; this job extends it to the operators a 100 TB
corpus pipeline runs all day: MinHash-LSH near-dup pairs and LSH ANN
pairs, over a 10x-documents synthetic corpus (deterministic, generated
in-Spark — no external data).

Protocol matches the graph jobs: fresh JVM per (level, query), strictly
serialized by the caller, steady-state measurement (JIT warm-up runs
excluded — the 64-agg MinHash codegen class needs ~3 executions to reach
steady state; see bench.py._best_of).

Usage: python scripts/scaling_dedup_job.py --cores N
       [--docs 50000] [--vecs 20000] [--warmup 3] [--runs 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_documents(spark, n_docs: int, vocab: int = 4000,
                    tokens_per_doc: int = 40, dup_rate: int = 50):
    """Deterministic synthetic corpus: doc i's token j is
    w<xxhash64(i, j) % vocab> — hash-based, so unrelated docs share ~0
    shingles (an arithmetic-progression generator was measured to create
    ~1.2M accidental near-dup pairs at 20k docs — runs-of-shared-tokens —
    swamping the verify stage). Every ``dup_rate``-th doc is a
    boilerplate-shifted copy of its predecessor (same token stream, 2
    positions shifted) so the LSH path has genuine near-dup work at a
    realistic ~2% rate."""
    from pyspark.sql import functions as F
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(vocab))
            .cast("string")))
    base = ids.select("doc_id", F.array_join(tok, " ").alias("text"))
    # near-dup injection: doc_id % dup_rate == 1 copies doc_id-1 shifted
    prev_tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id") - 1, j + 2), F.lit(vocab))
            .cast("string")))
    return base.select(
        "doc_id",
        F.when((F.col("doc_id") % dup_rate == 1) & (F.col("doc_id") > 0),
               F.array_join(prev_tok, " ")).otherwise(F.col("text"))
        .alias("text"))


def synth_embeddings(spark, n_vecs: int, dim: int = 64,
                     n_clusters: int | None = None):
    """Deterministic synthetic embeddings with real neighborhood
    structure: vector i = cluster-centroid(i % n_clusters) + 20%
    per-vector hash perturbation, per-component in [-1, 1). Intra-cluster
    cosines land well above 0.6, so the LSH path has genuine candidate +
    re-rank work; pure codegen, same layout as the testdata table."""
    from pyspark.sql import functions as F
    if n_clusters is None:
        n_clusters = max(200, n_vecs // 40)  # ~40 vecs/cluster at any size
    ids = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    cl = F.col("vec_id") % n_clusters

    def unit(h):
        return (F.pmod(h, F.lit(2000000)) - 1000000) / 1000000.0

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda k: (unit(F.xxhash64(F.lit("c"), cl, k))
                   + 0.2 * unit(F.xxhash64(F.lit("v"), F.col("vec_id"), k)))
        .cast("float"))
    return ids.select("vec_id", emb.alias("embedding"))


def steady_state(fn, warmup: int, runs: int) -> tuple[float, float]:
    first = None
    best = None
    for i in range(warmup + runs):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        if first is None:
            first = dt
        if i >= warmup:
            best = dt if best is None else min(best, dt)
    return best, first


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--query", default="both",
                    choices=["both", "minhash", "ann_lsh", "url_dedup"])
    ap.add_argument("--pages", type=int, default=300_000)
    args = ap.parse_args()

    from haskellpagerank_spark.functions.dedup import minhash_lsh_pairs
    from haskellpagerank_spark.functions.similarity import ann_lsh_pairs
    from haskellpagerank_spark.functions.urls import (dedup_crawl,
                                                      synthetic_crawl)
    from haskellpagerank_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-dedup-{args.cores}",
                      cores=args.cores, shuffle_partitions=args.cores)
    out: dict = {"cores": args.cores, "n_docs": args.docs,
                 "n_vecs": args.vecs, "warmup": args.warmup,
                 "runs": args.runs}

    if args.query in ("both", "minhash"):
        docs = synth_documents(spark, args.docs).persist()
        docs.count()
        n_pairs = minhash_lsh_pairs(docs, threshold=0.5).count()
        best, first = steady_state(
            lambda: minhash_lsh_pairs(docs, threshold=0.5).count(),
            args.warmup - 1, args.runs)  # the count above is warm-up run 1
        out.update(minhash_s=round(best, 3),
                   minhash_cold_s=round(first, 3),
                   minhash_docs_per_sec=round(args.docs / best, 1),
                   minhash_pairs=n_pairs)
        docs.unpersist()

    if args.query in ("both", "ann_lsh"):
        emb = synth_embeddings(spark, args.vecs).persist()
        emb.count()
        n_pairs = ann_lsh_pairs(emb, dim=64, threshold=0.6).count()
        best, first = steady_state(
            lambda: ann_lsh_pairs(emb, dim=64, threshold=0.6).count(),
            args.warmup - 1, args.runs)
        out.update(ann_lsh_s=round(best, 3),
                   ann_lsh_cold_s=round(first, 3),
                   ann_lsh_vecs_per_sec=round(args.vecs / best, 1),
                   ann_lsh_pairs=n_pairs)
        emb.unpersist()

    if args.query == "url_dedup":
        # URL-canonical crawl dedup: the pure map+agg hygiene kernel —
        # unlike the LSH paths there is no candidate join, so this row
        # evidences scaling of the regex/codegen map stage itself.
        n_caps = args.pages * 3

        def _run():
            dedup_crawl(synthetic_crawl(
                spark, n_pages=args.pages, snapshots=3)).count()

        _run()  # warm-up run 1 (codegen + JIT)
        best, first = steady_state(_run, args.warmup - 1, args.runs)
        out.update(n_pages=args.pages,
                   url_dedup_s=round(best, 3),
                   url_dedup_cold_s=round(first, 3),
                   url_dedup_captures_per_sec=round(n_caps / best, 1))

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""CSR-block SpMV PageRank — the physical fast path for the superstep.

The DataFrame join path (operators/pagerank.py) shuffles |E| join rows per
sweep. This variant materializes the reference's CSR idea (EdgeArray.hs:50-52)
as a *per-partition physical layout*: edges are hash-partitioned by dst
block, each block stored ONCE as contiguous numpy buffers (sorted dst run
-> unique dst ids + reduceat offsets + src ids + weights). A sweep is then

    for each block (in parallel, Arrow-batched):  msg = w * x[srcs]
        per-dst sums via np.add.reduceat           # sparse gather-scatter
    new_x = f(msg)                                 # driver, dense numpy

with the current rank vector distributed as a broadcast (vertex-mirror
pattern, a la GraphX replicated vertex views): zero shuffle per iteration,
one Spark job, no per-row Python.

Scale envelope (explicit, by design):
- every sweep moves O(|V|) through the driver twice: the 8|V|-byte rank
  broadcast out, and the ~|V|-row Arrow collect of per-block partial sums
  back (bounded by |V| plus hub-salt duplicates). Both are fine to ~10^7
  vertices (~0.25 GB/sweep through one driver); beyond that the driver hop
  dominates, so use strategy="join" (operators/pagerank.py), whose
  shuffle-based gather has no single-machine O(|V|) state.
  ``run_pagerank_auto`` picks via SPMV_MAX_VERTICES.
- block build is one shuffle of the weighted edge set (same cost as a single
  join-path sweep) and amortizes over all iterations.
- per-block buffers are bounded by edges-per-block; ``num_blocks`` scales
  with the cluster (default = shuffle partitions) so blocks fit comfortably
  in executor memory (100 TB / 10k blocks ~ 10 GB raw -> use 10^5 blocks at
  that scale; it is a plain repartition knob).

Numerics match the reference formula exactly (same dconst/damping/sink
handling as operators/pagerank.py); summation order inside a block is the
sorted-dst run order, so per-vertex sums agree with the NumPy oracle to
<= 1e-15 relative (tests assert allclose 1e-12 vs the oracle and vs the
join path).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, IterationMetrics
from .graph import Graph, amend_sinks
from .pagerank import PageRankConfig, PageRankResult

BLOCK_SCHEMA = ("block int, dsts binary, offsets binary, usrcs binary, "
                "src_pos binary, w binary")


def build_csr_blocks(work: Graph, num_blocks: int,
                     hub_ids: "np.ndarray | None" = None,
                     salt_k: int = 8) -> DataFrame:
    """One-time physical build: ONE shuffle of the raw (src, dst) pairs,
    hash-partitioned by dst (no two partitions share a dst, so per-block
    partial sums ARE the final sums), then a whole-partition numpy kernel
    that run-length-dedups duplicate edges into float multiplicities.

    The 1/outdeg weighting is NOT stored: each sweep broadcasts x/outdeg
    (the dense degree vector already lives on the driver), which removes
    the groupBy(src,dst) exchange and the degree join a weighted-edge build
    would need — build cost drops from three |E| exchanges to one.

    Skew (explicit): web graphs have mega-hubs whose in-edges would land
    in a single block under plain dst-hash partitioning. ``hub_ids`` (dsts
    whose in-degree exceeds the caller's threshold) get a salt column
    ``xxhash64(src) % salt_k``, splitting each hub's rows across up to
    ``salt_k`` blocks; the driver combine sums per-dst partials with
    ``np.bincount``, so duplicate dsts across blocks are exact. The salted
    shuffle key is (dst, salt) — the range+hash hybrid of the design doc.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        srcs, dsts = [], []
        for p in batches:
            srcs.append(p["src"].to_numpy(np.int64))
            dsts.append(p["dst"].to_numpy(np.int64))
        total = sum(map(len, srcs))
        if total == 0:
            return
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        order = np.lexsort((src, dst))
        src, dst = src[order], dst[order]
        # run-length encode duplicate (dst, src) pairs -> multiplicity w
        head = np.empty(len(dst), dtype=bool)
        head[0] = True
        head[1:] = (dst[1:] != dst[:-1]) | (src[1:] != src[:-1])
        pidx = np.flatnonzero(head)
        cnt = np.diff(np.append(pidx, len(dst))).astype(np.float64)
        src_u, dst_u = src[pidx], dst[pidx]
        uniq, offsets = np.unique(dst_u, return_index=True)
        # localize the gather: store the block's distinct srcs once plus
        # int32 positions into them — each sweep then gathers |usrcs| values
        # from the broadcast vector and streams the (cache-resident) local
        # array, instead of random-accessing the full x per edge
        usrcs, src_pos = np.unique(src_u, return_inverse=True)
        yield pd.DataFrame({
            "block": [-1],
            "dsts": [uniq.tobytes()],
            "offsets": [offsets.astype(np.int64).tobytes()],
            "usrcs": [usrcs.tobytes()],
            "src_pos": [src_pos.astype(np.int32).tobytes()],
            "w": [cnt.tobytes()],
        })

    edges = work.edges.select("src", "dst")
    if hub_ids is not None and len(hub_ids):
        spark = edges.sparkSession
        hubs = spark.createDataFrame(
            pd.DataFrame({"dst": np.asarray(hub_ids, dtype=np.int64),
                          "_hub": np.ones(len(hub_ids), dtype=bool)}))
        edges = (
            edges.join(F.broadcast(hubs), "dst", "left")
            .withColumn("salt", F.when(
                F.col("_hub").isNotNull(),
                F.pmod(F.xxhash64("src"), F.lit(salt_k))).otherwise(F.lit(0)))
        )
        part = edges.repartition(num_blocks, "dst", "salt")
    else:
        part = edges.repartition(num_blocks, "dst")
    return part.select("src", "dst").mapInPandas(kernel, schema=BLOCK_SCHEMA)


def _spmv_job(blocks: DataFrame, x_bc) -> tuple[np.ndarray, np.ndarray]:
    """One distributed gather-scatter sweep -> (dst ids, partial sums)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = x_bc.value
        for pdf in batches:
            ids, msgs = [], []
            for row in pdf.itertuples(index=False):
                uniq = np.frombuffer(row.dsts, dtype=np.int64)
                offs = np.frombuffer(row.offsets, dtype=np.int64)
                usrcs = np.frombuffer(row.usrcs, dtype=np.int64)
                src_pos = np.frombuffer(row.src_pos, dtype=np.int32)
                w = np.frombuffer(row.w, dtype=np.float64)
                if len(uniq) == 0:
                    continue
                x_local = x[usrcs]          # one gather from the big vector
                vals = w * x_local[src_pos]  # cache-resident inner gather
                ids.append(uniq)
                msgs.append(np.add.reduceat(vals, offs))
            if not ids:
                yield pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                    "msg": pd.Series([], dtype="float64")})
                continue
            yield pd.DataFrame({"id": np.concatenate(ids),
                                "msg": np.concatenate(msgs)})

    out = blocks.mapInPandas(kernel, schema="id long, msg double").toPandas()
    return out["id"].to_numpy(np.int64), out["msg"].to_numpy(np.float64)


def run_pagerank_spmv(g: Graph, cfg: PageRankConfig | None = None,
                      num_blocks: int | None = None,
                      hub_threshold: int | None = None,
                      init_ranks: DataFrame | None = None,
                      known_hub_ids=None) -> PageRankResult:
    """PageRank with CSR-block SpMV supersteps (same semantics/flags as
    run_pagerank; see PageRankConfig). ``hub_threshold``: in-degree above
    which a dst is salted across blocks (None -> a quarter of the per-block
    edge budget, min 65536; 0 disables the skew probe).

    ``known_hub_ids``: pre-known mega-hub dst ids (e.g. from the streaming
    degree tracker, streaming/stateful.py) — skips the |E| in-degree probe
    entirely. Salting is a physical choice only, so any id list is
    semantically safe; results are identical either way."""
    cfg = cfg or PageRankConfig()
    spark = g.spark
    n = g.num_vertices
    if n == 0:
        return PageRankResult(ranks=g.vertices().select(
            "id", F.lit(0.0).alias("rank")), iterations=0)

    work = amend_sinks(g) if cfg.sink_mode == "reflect" else g
    num_blocks = num_blocks or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # out-degree vector first (needed every run) — its sum is |E|, which
    # also lets us SKIP the skew probe outright on graphs too small for any
    # dst to clear the salting threshold (the common gate-query case)
    deg_pdf = (
        work.edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg")).toPandas()
    )
    outdeg = np.zeros(n, dtype=np.int64)
    outdeg[deg_pdf["id"].to_numpy(np.int64)] = deg_pdf["deg"].to_numpy(np.int64)
    has_out = outdeg > 0
    n_nonsink = int(has_out.sum())
    n_edges = int(outdeg.sum())

    # skew probe: salt mega-hub dsts whose in-edges would swamp one block
    hub_ids = None
    if known_hub_ids is not None:
        hub_ids = np.asarray(known_hub_ids, dtype=np.int64)
        if hub_ids.size == 0:
            hub_ids = None
    elif hub_threshold != 0:
        if hub_threshold is None:
            hub_threshold = max(65536, n_edges // max(num_blocks, 1) // 4)
        if n_edges > hub_threshold:  # else no dst can possibly exceed it
            indeg_pdf = (
                work.edges.groupBy(F.col("dst").alias("id"))
                .agg(F.count(F.lit(1)).alias("deg")).toPandas()
            )
            hub_ids = indeg_pdf.loc[indeg_pdf["deg"] > hub_threshold,
                                    "id"].to_numpy(np.int64)

    blocks = build_csr_blocks(work, num_blocks, hub_ids=hub_ids).persist()
    blocks.count()  # materialize once

    d = cfg.damping
    init = cfg.init_value if cfg.init_value is not None else 1.0 / n
    dconst = (1.0 - d) / n_nonsink if n_nonsink else 0.0

    x = np.full(n, float(init))
    if init_ranks is not None:
        # warm start (previous converged state after an ingest batch)
        pdf0 = init_ranks.select("id", "rank").toPandas()
        x[pdf0["id"].to_numpy(np.int64)] = pdf0["rank"].to_numpy(np.float64)
    ckpt = CheckpointManager(cfg.checkpoint_dir, cfg.checkpoint_interval)
    start_iter = 0
    if cfg.checkpoint_dir:
        resumed = ckpt.resume(spark, required_columns=("id", "rank"))
        if resumed is not None:
            pdf = resumed[0].toPandas()
            x = np.zeros(n)
            x[pdf["id"].to_numpy(np.int64)] = pdf["rank"].to_numpy(np.float64)
            start_iter = resumed[1]

    def to_df(vec: np.ndarray) -> DataFrame:
        return spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype=np.int64), "rank": vec}))

    sc = spark.sparkContext
    metrics: list[IterationMetrics] = []
    total_iters = cfg.num_iters if cfg.num_iters > 0 else cfg.max_iters
    if cfg.num_iters == 0 and start_iter >= total_iters:
        # resumed at/past max_iters with a converged snapshot: run one
        # verification sweep instead of skipping the loop and raising
        total_iters = start_iter + 1
    it = start_iter
    prev = x
    while it < total_iters:
        it += 1
        t0 = time.monotonic()
        # fold the 1/outdeg weighting into the broadcast (blocks store raw
        # multiplicities): msg_v = sum w_uv * x_u / outdeg_u
        y = np.divide(x, outdeg, out=np.zeros(n), where=has_out)
        bc = sc.broadcast(y)
        ids, msgs = _spmv_job(blocks, bc)
        bc.destroy()
        # bincount sums per-dst partials — exact when salted hubs span blocks
        msg = (np.bincount(ids, weights=msgs, minlength=n)
               if len(ids) else np.zeros(n))
        if cfg.sink_mode == "redistribute":
            dangling = float(x[~has_out].sum())
            new = (1.0 - d) / n + d * (msg + dangling / n)
        else:
            new = dconst + d * msg
            new[~has_out] = 0.0
        diff = np.abs(new - x)
        l1, linf = float(diff.sum()), float(diff.max())
        m = IterationMetrics(
            iteration=it, l1_residual=l1, linf_residual=linf,
            rows_shuffled=0, wall_s=time.monotonic() - t0,
            extra={"edges_processed": n_edges, "strategy": "spmv"},
        )
        metrics.append(m)
        if cfg.checkpoint_dir:
            snap = ckpt.should_snapshot(it)
            ckpt.write(to_df(new) if snap else None, m, snapshot=snap)
        converged = (linf if cfg.tol_norm == "linf" else l1) <= cfg.tol
        prev, x = x, new
        if cfg.num_iters == 0 and converged:
            final = prev if cfg.return_previous_on_converge else x
            blocks.unpersist()
            return PageRankResult(ranks=to_df(final), iterations=it,
                                  metrics=metrics)

    blocks.unpersist()
    if cfg.num_iters == 0:
        raise RuntimeError(
            f"pagerank_spmv did not converge within max_iters={cfg.max_iters}")
    return PageRankResult(ranks=to_df(x), iterations=it, metrics=metrics)


# crossover guide: each sweep moves O(|V|) through the driver twice — the
# 8|V|-byte rank broadcast out and the ~|V|-row Arrow collect of per-block
# partial sums back (bounded by |V| + hub-salt duplicates). At 1e7 vertices
# that is ~80 MB+160 MB per sweep through one driver — comfortably inside a
# driver's NIC/second; at 1e8 it is the bottleneck. The shuffle-join path has
# no single-machine O(|V|) state, so it takes over beyond this crossover
# (measured handoff: BENCH/BASELINE.md §5).
SPMV_MAX_VERTICES = 10_000_000


def run_pagerank_auto(g: Graph, cfg: PageRankConfig | None = None,
                      init_ranks: DataFrame | None = None) -> PageRankResult:
    """Pick the physical strategy by data scale (documented crossovers):

    1. |E| <= LOCAL_MAX_EDGES  -> driver-local numpy (COST regime — a
       single thread beats any distributed plan below RAM scale; this is
       how the engine matches the reference's single-node throughput at
       the reference's own data sizes);
    2. |V| <= SPMV_MAX_VERTICES -> CSR-block SpMV (zero-shuffle sweeps,
       broadcast rank vector);
    3. beyond                   -> shuffle-join supersteps (no |V|-sized
       single-machine state anywhere).
    """
    from .pagerank import run_pagerank
    from .pagerank_local import LOCAL_MAX_EDGES, run_pagerank_local
    n_edges = g.edges.count()
    if n_edges <= LOCAL_MAX_EDGES:
        return run_pagerank_local(g, cfg, init_ranks=init_ranks)
    if g.num_vertices <= SPMV_MAX_VERTICES:
        return run_pagerank_spmv(g, cfg, init_ranks=init_ranks)
    return run_pagerank(g, cfg, init_ranks=init_ranks)

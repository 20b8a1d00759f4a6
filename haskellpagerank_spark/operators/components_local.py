"""Driver-local connected components / label propagation — the COST-aware
small-graph physical strategy (same dispatch reasoning as
operators/pagerank_local.py: below RAM scale a single-node vectorized
kernel beats any distributed plan, so matching single-node throughput at
small |E| means *choosing not to distribute* there).

Same semantics and output schema as the DataFrame paths
(operators/components.py), asserted identical in tests:

- connected components: component = min vertex id in the component,
  computed by vectorized min-label propagation with pointer jumping
  (NOT union-find — kept algorithmically independent from the test
  oracle's union-find so the parity tests stay meaningful).
- label propagation: synchronous, deduped-undirected-neighbor label mode,
  ties -> smallest label, isolated vertices keep their own, early stop on
  a fixed sweep — bit-identical to components.label_propagation.

``run_*_auto`` dispatchers live in operators/components.py.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from ..plans.checkpoint import IterationMetrics
from .components import IterativeResult
from .graph import Graph

# reuse the PageRank local tier's envelope: ~16 bytes/edge collected
from .pagerank_local import LOCAL_MAX_EDGES  # noqa: F401  (re-export)


def _collect_undirected(g: Graph) -> tuple[np.ndarray, np.ndarray]:
    """Deduped undirected edge set (both directions, self-loops dropped by
    the Graph contract) as numpy arrays."""
    pdf = g.edges.select("src", "dst").toPandas()
    s0 = pdf["src"].to_numpy(np.int64)
    d0 = pdf["dst"].to_numpy(np.int64)
    s = np.concatenate([s0, d0])
    d = np.concatenate([d0, s0])
    n = max(g.num_vertices, 1)
    if n * n < np.iinfo(np.int64).max:
        key = s * n + d
        _, idx = np.unique(key, return_index=True)
    else:  # pragma: no cover — beyond the local tier's envelope anyway
        _, idx = np.unique(np.stack([s, d], axis=1), axis=0,
                           return_index=True)
    return s[idx], d[idx]


def _result_df(g: Graph, labels: np.ndarray, col: str,
               iterations: int,
               metrics: list[IterationMetrics]) -> IterativeResult:
    df = g.spark.createDataFrame(pd.DataFrame({
        "id": np.arange(len(labels), dtype=np.int64), col: labels}))
    return IterativeResult(df=df, iterations=iterations, metrics=metrics)


def connected_components_local(g: Graph) -> IterativeResult:
    """Min-label propagation + pointer jumping, entirely on the driver."""
    n = g.num_vertices
    if n == 0:
        return _result_df(g, np.empty(0, np.int64), "component", 0, [])
    s, d = _collect_undirected(g)
    labels = np.arange(n, dtype=np.int64)
    metrics: list[IterationMetrics] = []
    if len(d):
        order = np.argsort(d, kind="stable")
        s_ord = s[order]
        d_sorted = d[order]
        head = np.empty(len(d_sorted), dtype=bool)
        head[0] = True
        head[1:] = d_sorted[1:] != d_sorted[:-1]
        starts = np.flatnonzero(head)
        uds = d_sorted[starts]
    it = 0
    while len(d):
        it += 1
        t0 = time.monotonic()
        mins = np.minimum.reduceat(labels[s_ord], starts)
        new = labels.copy()
        upd = mins < new[uds]
        new[uds[upd]] = mins[upd]
        # pointer jumping: collapse label chains in O(log depth) passes so
        # high-diameter graphs converge in few propagation rounds
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        changed = int((new != labels).sum())
        metrics.append(IterationMetrics(
            iteration=it, l1_residual=float(changed),
            linf_residual=float(1 if changed else 0), rows_shuffled=0,
            wall_s=time.monotonic() - t0,
            extra={"changed": changed, "strategy": "local"}))
        labels = new
        if changed == 0:
            break
    return _result_df(g, labels, "component", it, metrics)


def label_propagation_local(g: Graph, num_iters: int = 5) -> IterativeResult:
    """Synchronous LP, vectorized: per sweep, one lexsort groups (dst,
    label) runs; the winner per dst is the run maximizing (count, -label)."""
    n = g.num_vertices
    if n == 0:
        return _result_df(g, np.empty(0, np.int64), "label", 0, [])
    s, d = _collect_undirected(g)
    labels = np.arange(n, dtype=np.int64)
    metrics: list[IterationMetrics] = []
    it = 0
    while it < num_iters and len(d):
        it += 1
        t0 = time.monotonic()
        lab = labels[s]
        order = np.lexsort((lab, d))
        ds, ls = d[order], lab[order]
        run_head = np.empty(len(ds), dtype=bool)
        run_head[0] = True
        run_head[1:] = (ds[1:] != ds[:-1]) | (ls[1:] != ls[:-1])
        run_starts = np.flatnonzero(run_head)
        run_dst = ds[run_starts]
        run_lab = ls[run_starts]
        run_cnt = np.diff(np.append(run_starts, len(ds)))
        # winner per dst: max count, then min label — lexsort minor-to-major
        w_order = np.lexsort((run_lab, -run_cnt, run_dst))
        wd, wl = run_dst[w_order], run_lab[w_order]
        first = np.empty(len(wd), dtype=bool)
        first[0] = True
        first[1:] = wd[1:] != wd[:-1]
        new = labels.copy()
        new[wd[first]] = wl[first]
        changed = int((new != labels).sum())
        metrics.append(IterationMetrics(
            iteration=it, l1_residual=float(changed),
            linf_residual=float(1 if changed else 0), rows_shuffled=0,
            wall_s=time.monotonic() - t0,
            extra={"changed": changed, "strategy": "local"}))
        labels = new
        if changed == 0:
            break
    return _result_df(g, labels, "label", it, metrics)

"""Approximation-error characterization for the sampled/sketched operators.

The engine's betweenness (operators/betweenness.py) and ANF
(operators/anf.py) are EXACT w.r.t. their algorithms (hash-exact vs the
DuckDB twins) but approximate w.r.t. the true quantity when run in their
at-scale configurations: betweenness samples landmarks (Brandes-Pich
estimate scaled by |V|/k), ANF estimates ball sizes with Flajolet-Martin
registers. This script measures that *method* error on deterministic
synthetic graphs so a user can pick landmark counts / sketch widths with
eyes open. Pure NumPy (the estimator math is engine-independent; ANF
replicates the exact md5 hash family the Spark operator uses).

Usage: python scripts/accuracy_notes.py  -> one JSON blob on stdout
(recorded in BENCH/accuracy.json, summarized in BENCH/BASELINE.md §6).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    return _POP[x.astype(np.int64).view(np.uint8).reshape(*x.shape, 8)] \
        .sum(axis=-1)


def synth(n: int, avg_deg: int, seed: int):
    rng = np.random.default_rng(seed)
    m = n * avg_deg
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def csr(src, dst, n):
    order = np.argsort(src, kind="stable")
    s, d = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, d


def gather(indptr, dst, frontier):
    """Vectorized multi-row CSR gather: (repeated sources, their dsts)."""
    counts = indptr[frontier + 1] - indptr[frontier]
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    us = np.repeat(frontier, counts)
    starts = np.repeat(indptr[frontier], counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return us, dst[starts + offs]


# ----------------------------------------------------------- betweenness

def brandes_from(source: int, indptr, dst, n):
    """One Brandes source pass: returns this source's dependency vector
    (textbook directed, unweighted, endpoints excluded — the same
    semantics as operators/betweenness.py)."""
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.float64)
    dist[source] = 0
    sigma[source] = 1.0
    levels = [np.array([source])]
    frontier = levels[0]
    while frontier.size:
        us, vs = gather(indptr, dst, frontier)
        if us.size == 0:
            break
        lvl = dist[frontier[0]] + 1
        new_mask = dist[vs] == -1
        dist[vs[new_mask]] = lvl
        on_sp = dist[vs] == lvl
        np.add.at(sigma, vs[on_sp], sigma[us[on_sp]])
        frontier = np.unique(vs[new_mask])
        if frontier.size:
            levels.append(frontier)
    delta = np.zeros(n, dtype=np.float64)
    for frontier in reversed(levels[1:]):
        us, vs = gather(indptr, dst, frontier)
        if us.size:
            ok = dist[vs] == dist[us] + 1
            np.add.at(delta, us[ok],
                      sigma[us[ok]] / sigma[vs[ok]] * (1.0 + delta[vs[ok]]))
    delta[source] = 0.0
    return delta


def betweenness_error(n=3000, avg_deg=6, seed=7):
    src, dst = synth(n, avg_deg, seed)
    indptr, d = csr(src, dst, n)
    exact = np.zeros(n, dtype=np.float64)
    per_source = {}
    rng = np.random.default_rng(seed + 1)
    landmark_sets = {k: rng.choice(n, size=k, replace=False)
                     for k in (16, 64, 256, 1024) if k < n}
    needed = set()
    for lms in landmark_sets.values():
        needed.update(int(x) for x in lms)
    for s in range(n):
        dep = brandes_from(s, indptr, d, n)
        exact += dep
        if s in needed:
            per_source[s] = dep
    out = {"n": n, "n_edges": int(len(src)), "avg_deg": avg_deg,
           "exact_total_bc": round(float(exact.sum()), 3), "landmarks": {}}
    top20 = set(np.argsort(-exact)[:20].tolist())
    nz = exact > 0
    for k, lms in sorted(landmark_sets.items()):
        est = np.zeros(n)
        for s in lms:
            est += per_source[int(s)]
        est *= n / k
        est_top20 = set(np.argsort(-est)[:20].tolist())
        rel = np.abs(est[nz] - exact[nz]) / exact[nz]
        out["landmarks"][str(k)] = {
            "mean_rel_err_nonzero": round(float(rel.mean()), 4),
            "median_rel_err_nonzero": round(float(np.median(rel)), 4),
            "top20_overlap": len(top20 & est_top20),
            "spearman_top100": _rank_corr(exact, est, 100),
        }
    return out


def _rank_corr(exact, est, topn):
    idx = np.argsort(-exact)[:topn]
    a = np.argsort(np.argsort(-exact[idx]))
    b = np.argsort(np.argsort(-est[idx]))
    d = a - b
    rho = 1 - 6 * float((d * d).sum()) / (topn * (topn * topn - 1))
    return round(rho, 4)


# ------------------------------------------------------------------- ANF

FM_PHI = 0.77351


def md5_63(seed: int, k: int, vid: int) -> int:
    """Exactly operators/anf.py::_md5_63 over the same key format."""
    h = hashlib.md5(f"{seed}|{k}|{vid}".encode()).hexdigest()[:15]
    return int(h, 16)


def fm_estimate(src, dst, n, radius, n_sketches, seed=42):
    """NumPy twin of operators/anf.py (same hash family, same OR sweeps,
    same lowest-zero estimator)."""
    s = np.zeros((n, n_sketches), dtype=np.int64)
    for k in range(n_sketches):
        h = np.array([md5_63(seed, k, v) for v in range(n)],
                     dtype=np.int64)
        rho = np.minimum(popcount64((h & -h) - 1), 50)
        s[:, k] = np.int64(1) << rho
    for _ in range(radius):
        acc = s.copy()
        np.bitwise_or.at(acc, src, s[dst])
        s = acc
    r = popcount64((~s & (s + 1)) - 1)
    return np.power(2.0, r.mean(axis=1)) / FM_PHI


def exact_balls(indptr, dst, n, radius, sources):
    out = np.zeros(len(sources), dtype=np.int64)
    for i, s0 in enumerate(sources):
        seen = {int(s0)}
        frontier = [int(s0)]
        for _ in range(radius):
            nxt = []
            for u in frontier:
                for v in dst[indptr[u]:indptr[u + 1]]:
                    v = int(v)
                    if v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
            if not frontier:
                break
        out[i] = len(seen)
    return out


def anf_error(n=100_000, avg_deg=10, radius=3, n_sources=200, seed=11):
    src, dst = synth(n, avg_deg, seed)
    indptr, d = csr(src, dst, n)
    rng = np.random.default_rng(seed + 1)
    sources = rng.choice(n, size=n_sources, replace=False)
    exact = exact_balls(indptr, d, n, radius, sources)
    out = {"n": n, "n_edges": int(len(src)), "radius": radius,
           "n_sources": n_sources, "sketches": {}}
    for k in (4, 8, 16, 32, 64):
        est = fm_estimate(src, dst, n, radius, k, seed=42)[sources]
        rel = np.abs(est - exact) / np.maximum(exact, 1)
        out["sketches"][str(k)] = {
            "mean_rel_err": round(float(rel.mean()), 4),
            "p90_rel_err": round(float(np.quantile(rel, 0.9)), 4),
            "nf_sum_rel_err": round(
                abs(float(est.sum()) - float(exact.sum()))
                / float(exact.sum()), 4),
        }
    return out


if __name__ == "__main__":
    print(json.dumps({
        "betweenness": betweenness_error(),
        "anf": anf_error(),
    }, indent=1))

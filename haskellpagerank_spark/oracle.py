"""NumPy oracle reproducing the reference engine's exact semantics.

This is the test oracle for the Spark engine: a direct, sequential,
~vectorized reimplementation of the reference algorithms, used to produce
per-vertex golden values (allclose 1e-6) on the fixture graphs.

Reference citations (all under /root/reference):
- parse / dense ids / self-loop drop: internalutil/Data/Graph/EdgeArray.hs:69-89,145-152
- amendSinks (sink edge reflection):  internalutil/Data/Graph/EdgeArray.hs:103-116
- Jacobi PageRank ("pagerankS"):      pagerank/Data/Graph/PageRankStep.hs:22-110
- Gauss-Seidel PageRank ("pagerank"): pagerank/Data/Graph/PageRank.hs:23-107
- mex / findSmallestPossibleColor:    graphcoloring/Data/Graph/GraphColoring.hs:229-241
- greedy coloring:                    graphcoloring/Data/Graph/GraphColoring.hs:338-348
- Jones-Plassmann:                    graphcoloring/Data/Graph/GraphColoring.hs:277-317
- distance-2 coloring:                graphcoloring/Data/Graph/GraphColoring.hs:351-364

NOT copied code: the reference is Haskell over mutable unboxed vectors; this
is an independent NumPy/Python expression of the same math.
"""

from __future__ import annotations

import numpy as np

Edges = list[tuple[int, int]]


# ---------------------------------------------------------------- parsing

def parse_edges(pairs: Edges) -> tuple[np.ndarray, np.ndarray, int]:
    """Self-loop drop + dense 0..max(id) vertex space.

    Returns (src, dst, num_vertices). Duplicate edges are KEPT (they count
    multiply in degrees and rank sums — EdgeArray.hs:78-89 does not dedup).
    """
    if not pairs:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    arr = np.asarray(pairs, dtype=np.int64)
    n = int(arr.max()) + 1
    keep = arr[:, 0] != arr[:, 1]
    return arr[keep, 0], arr[keep, 1], n


def out_degrees(src: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(src, minlength=n).astype(np.int64)


def amend_sinks(src: np.ndarray, dst: np.ndarray, n: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """For every sink s (outdeg 0): add edge s->u for each in-edge u->s.

    Multiplicity preserved: each incoming edge instance reflects to one
    outgoing edge instance (EdgeArray.hs:108-116 copies the full in-list).
    Isolated vertices (no in-edges either) stay isolated.
    """
    deg = out_degrees(src, n)
    is_sink = deg == 0
    refl = is_sink[dst]  # edge u->s with s sink reflects to s->u
    return (np.concatenate([src, dst[refl]]),
            np.concatenate([dst, src[refl]]))


# ---------------------------------------------------------------- pagerank

def _jacobi_step(x, src, dst, outdeg, n, d, dconst):
    contrib = np.zeros(n)
    np.add.at(contrib, dst, x[src] / outdeg[src])
    new = dconst + d * contrib
    new[outdeg == 0] = 0.0  # isolated vertices pinned to 0 (PageRank.hs:35)
    return new


def pagerank_jacobi(src, dst, n, damping=0.15, eps=1e-4, init=1.0,
                    num_iters=0, max_iters=100000):
    """Reference Jacobi semantics (PageRankStep.hs).

    ``damping`` multiplies the link sum: new = (1-d)/n_nonsink + d * sum,
    with the reference's unusual default d=0.15 (InternalPageRank.hs:23-24).
    Convergence mode (num_iters=0) stops when no vertex moved by > eps and
    returns the PREVIOUS buffer (PageRankStep.hs:90) — the iterate before the
    last computed sweep. num_iters=k returns exactly the k-th sweep.
    """
    outdeg = out_degrees(src, n)
    n_nonsink = int((outdeg > 0).sum())
    dconst = (1.0 - damping) / n_nonsink if n_nonsink else 0.0
    x = np.full(n, float(init))
    if num_iters > 0:
        for _ in range(num_iters):
            x = _jacobi_step(x, src, dst, outdeg, n, damping, dconst)
        return x
    for _ in range(max_iters):
        new = _jacobi_step(x, src, dst, outdeg, n, damping, dconst)
        if np.max(np.abs(new - x)) <= eps:
            return x  # previous buffer (PageRankStep.hs:90)
        x = new
    raise RuntimeError("pagerank_jacobi did not converge")


def pagerank_gauss_seidel(src, dst, n, damping=0.15, eps=1e-4, init=1.0,
                          num_iters=0, max_iters=100000, schedule=None):
    """Reference async/sequential semantics (PageRank.hs, single-thread path).

    In-place sweep over the in-adjacency in ``schedule`` order (default:
    vertex-id order); returns the array AFTER the converging sweep (single
    buffer, PageRank.hs:105). ``schedule`` lets pagerank_pp below express
    the color-scheduled variant.
    """
    outdeg = out_degrees(src, n)
    n_nonsink = int((outdeg > 0).sum())
    dconst = (1.0 - damping) / n_nonsink if n_nonsink else 0.0
    # in-adjacency: for vertex v, the list of u with edge u->v
    order = np.argsort(dst, kind="stable")
    in_src, in_dst = src[order], dst[order]
    starts = np.searchsorted(in_dst, np.arange(n))
    ends = np.searchsorted(in_dst, np.arange(n), side="right")
    x = np.full(n, float(init))
    schedule = list(range(n)) if schedule is None else list(schedule)

    def sweep() -> bool:
        above = False
        for v in schedule:
            old = x[v]
            if outdeg[v] == 0:
                x[v] = 0.0
            else:
                nbrs = in_src[starts[v]:ends[v]]
                x[v] = dconst + damping * float(np.sum(x[nbrs] / outdeg[nbrs]))
            if abs(old - x[v]) > eps:
                above = True
        return above

    if num_iters > 0:
        for _ in range(num_iters):
            sweep()
        return x
    for _ in range(max_iters):
        if not sweep():
            return x
    raise RuntimeError("pagerank_gauss_seidel did not converge")


def pagerank_pp(src, dst, n, colors, damping=0.15, eps=1e-4, init=1.0,
                num_iters=0, max_iters=100000):
    """Color-scheduled Gauss–Seidel ("pagerankPP",
    PageRankWithPreprocessing.hs:170-294): sweeps visit color classes in
    ascending color order. Given a proper coloring, same-colored vertices
    are non-adjacent, so this sequential schedule is bit-equivalent to the
    reference's (and the engine's) simultaneous per-color update."""
    schedule = sorted(range(n), key=lambda v: (colors[v], v))
    return pagerank_gauss_seidel(src, dst, n, damping=damping, eps=eps,
                                 init=init, num_iters=num_iters,
                                 max_iters=max_iters, schedule=schedule)


def block_starts(n: int, num_blocks: int) -> list[int]:
    """repa even-chunk boundaries (``nstart``, ArrayUtils.hs:7-17): with
    n = q*B + r, the first r chunks get q+1 vertices and the rest get q.
    Returns B+1 boundary offsets; chunk c is [starts[c], starts[c+1])."""
    q, r = divmod(n, num_blocks)
    return [c * (q + 1) if c < r else c * q + r
            for c in range(num_blocks + 1)]


def pagerank_block_gs(src, dst, n, num_blocks, damping=0.15, eps=1e-4,
                      init=1.0, num_iters=0, max_iters=100000):
    """Deterministic BSP idealization of the reference's chunk-parallel
    Gauss–Seidel ("pagerank" above minimumParallelizableWorkload,
    PageRank.hs:75-82 + InternalPageRank.hs:26-27).

    The reference forks the repa thread gang over contiguous id chunks
    (``nstart`` boundaries) and each thread sweeps its chunk in-place in
    ascending id order over the SHARED rank array — cross-chunk reads see
    whatever mix of old/new values thread timing produces. This oracle
    fixes the one reproducible member of that schedule family: in-chunk
    reads are in-place (Gauss–Seidel), cross-chunk reads always see the
    sweep-start value (Jacobi across chunks). ``num_blocks=1`` is
    bit-identical to :func:`pagerank_gauss_seidel` (the reference's own
    sequential regime below 7000 vertices, and all of "pagerankND" whose
    threshold is hardcoded to 9e6 — PageRankNonDet.hs:66).

    Like every variant in the family it converges to the same unique
    fixpoint x* = dconst + d·Aᵀx*; the block schedule only changes the
    path (and, like the reference, intermediate iterates)."""
    outdeg = out_degrees(src, n)
    n_nonsink = int((outdeg > 0).sum())
    dconst = (1.0 - damping) / n_nonsink if n_nonsink else 0.0
    order = np.argsort(dst, kind="stable")
    in_src, in_dst = src[order], dst[order]
    starts = np.searchsorted(in_dst, np.arange(n))
    ends = np.searchsorted(in_dst, np.arange(n), side="right")
    bounds = block_starts(n, num_blocks)
    x = np.full(n, float(init))

    def sweep() -> bool:
        above = False
        x0 = x.copy()
        for b in range(num_blocks):
            lo, hi = bounds[b], bounds[b + 1]
            for v in range(lo, hi):
                old = x[v]
                if outdeg[v] == 0:
                    x[v] = 0.0
                else:
                    nbrs = in_src[starts[v]:ends[v]]
                    # in-chunk: current (possibly updated this sweep);
                    # cross-chunk: sweep-start snapshot
                    vals = np.where((nbrs >= lo) & (nbrs < hi),
                                    x[nbrs], x0[nbrs])
                    x[v] = dconst + damping * float(
                        np.sum(vals / outdeg[nbrs]))
                if abs(old - x[v]) > eps:
                    above = True
        return above

    if num_iters > 0:
        for _ in range(num_iters):
            sweep()
        return x
    for _ in range(max_iters):
        if not sweep():
            return x
    raise RuntimeError("pagerank_block_gs did not converge")


def pagerank_redistribute(src, dst, n, damping=0.85, eps=1e-6, init=None,
                          num_iters=0, max_iters=100000):
    """Web-scale-mode oracle: standard dangling-mass redistribution.

    new[v] = (1-d)/N + d * (sum_in contrib + dangling_mass/N) for ALL v.
    No reference analogue (the reference rewires edges instead); this is the
    BASELINE.json north-star formulation with damping 0.85.
    """
    outdeg = out_degrees(src, n)
    x = np.full(n, 1.0 / n if init is None else float(init))
    for it in range(max_iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, x[src] / np.maximum(outdeg[src], 1))
        dangling = float(x[outdeg == 0].sum())
        new = (1.0 - damping) / n + damping * (contrib + dangling / n)
        done = np.abs(new - x).sum() <= eps
        x = new
        if num_iters > 0:
            if it + 1 == num_iters:
                return x
        elif done:
            return x
    raise RuntimeError("pagerank_redistribute did not converge")


# ---------------------------------------------------------------- coloring

def mex(colors) -> int:
    """Smallest color >= 1 not present (GraphColoring.hs:229-241)."""
    s = set(int(c) for c in colors)
    c = 1
    while c in s:
        c += 1
    return c


def _both_dir_adj(src, dst, n) -> list[list[int]]:
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
        adj[d].append(s)
    return adj


def greedy_coloring(src, dst, n) -> list[int]:
    """graphColoringGreedyInputOrder: id order, mex over already-colored
    neighbors in BOTH directions (GraphColoring.hs:338-348)."""
    adj = _both_dir_adj(src, dst, n)
    colors = [0] * n
    for v in range(n):
        colors[v] = mex(colors[u] for u in adj[v] if u < v)
    return colors


def jones_plassmann(src, dst, n, priorities) -> list[int]:
    """JP fixed point: color v = mex over predecessors, where u precedes v
    iff (rand[u], u) < (rand[v], v) lexicographically (GraphColoring.hs:291-296).
    The schedule-independent fixed point of color5's DFS (unique on a DAG).
    """
    pri = list(priorities)
    adj = _both_dir_adj(src, dst, n)
    order = sorted(range(n), key=lambda v: (pri[v], v))
    colors = [0] * n
    for v in order:
        preds = [u for u in adj[v] if (pri[u], u) < (pri[v], v)]
        colors[v] = mex(colors[u] for u in preds)
    return colors


def greedy_mis(src, dst, n, priorities) -> list[int]:
    """Sequential greedy maximal independent set in (priority, id) order:
    v joins iff no already-chosen neighbor. Equals the fixpoint of the
    deterministic Luby rounds (operators.coloring.maximal_independent_set)
    and the color-1 class of :func:`jones_plassmann` under the same
    priorities. Returns per-vertex 1/0."""
    pri = list(priorities)
    adj = _both_dir_adj(np.asarray(src), np.asarray(dst), n)
    order = sorted(range(n), key=lambda v: (pri[v], v))
    in_mis = [0] * n
    for v in order:
        if not any(in_mis[u] for u in adj[v]):
            in_mis[v] = 1
    return in_mis


def greedy_matching(src, dst, priorities) -> list[tuple[int, int]]:
    """Sequential greedy maximal matching over canonical (u < v) edges in
    (priority, u, v) order: an edge is taken iff both endpoints are still
    free. Equals the fixpoint of the deterministic local-min rounds
    (operators.coloring.maximal_matching). ``priorities``: one value per
    canonical edge, aligned with the deduped sorted canonical edge list
    this function derives — pass a dict {(u, v): pri} for clarity."""
    canon = sorted({(min(a, b), max(a, b))
                    for a, b in zip(list(src), list(dst)) if a != b})
    pri = priorities
    order = sorted(canon, key=lambda e: (pri[e], e[0], e[1]))
    used: set[int] = set()
    out: list[tuple[int, int]] = []
    for u, v in order:
        if u not in used and v not in used:
            used.add(u)
            used.add(v)
            out.append((u, v))
    return sorted(out)


def distance2_coloring(src, dst, n) -> list[int]:
    """graphColoring2Distance over the merged (undirected, deduped) graph:
    id order, mex over colored vertices at distance 1 or 2
    (GraphColoring.hs:351-364; merged graph per TestGraphColoring2Dist.hs:20).
    """
    adj = [sorted(set(nbrs)) for nbrs in _both_dir_adj(src, dst, n)]
    colors = [0] * n
    for v in range(n):
        near = set(adj[v])
        for u in adj[v]:
            near.update(adj[u])
        near.discard(v)
        colors[v] = mex(colors[u] for u in near if u < v)
    return colors


# ------------------------------------------------ components / triangles / lp

def connected_components(src, dst, n) -> list[int]:
    """Undirected CC; component label = min vertex id in the component."""
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for s, d in zip(src.tolist(), dst.tolist()):
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(v) for v in range(n)]


def triangle_count(src, dst, n) -> int:
    """Global triangle count over the undirected simple graph."""
    nbrs = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    count = 0
    for v in range(n):
        higher = [u for u in nbrs[v] if u > v]
        for i, a in enumerate(higher):
            for b in higher[i + 1:]:
                if b in nbrs[a]:
                    count += 1
    return count


def trussness(src, dst) -> dict[tuple[int, int], int]:
    """Exact truss decomposition by the sequential min-support peel
    (Cohen 2008 / Wang & Cheng PVLDB'12): process edges in increasing
    current-support order, trussness = running-max support + 2; removing
    an edge decrements the support of the other two edges of each of its
    triangles. Ground truth for the distributed edge h-index fixpoint
    (operators.structure.trussness)."""
    import heapq

    canon = sorted({(min(a, b), max(a, b))
                    for a, b in zip(list(src), list(dst)) if a != b})
    adj: dict[int, set[int]] = {}
    for u, v in canon:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    sup = {(u, v): len(adj[u] & adj[v]) for u, v in canon}
    heap = [(s, e) for e, s in sup.items()]
    heapq.heapify(heap)
    alive = set(canon)
    out: dict[tuple[int, int], int] = {}
    kmax = 0
    while heap:
        s, e = heapq.heappop(heap)
        if e not in alive or s != sup[e]:
            continue  # stale heap entry
        kmax = max(kmax, s)
        out[e] = kmax + 2
        alive.discard(e)
        u, v = e
        for w in adj[u] & adj[v]:
            for f in ((min(u, w), max(u, w)), (min(v, w), max(v, w))):
                if f in alive:
                    sup[f] -= 1
                    heapq.heappush(heap, (sup[f], f))
        adj[u].discard(v)
        adj[v].discard(u)
    return out


def label_propagation(src, dst, n, num_iters=5) -> list[int]:
    """Synchronous LP over the undirected simple graph, deterministic:
    new label = most frequent neighbor label, ties -> smallest label;
    isolated vertices keep their own label. Labels init to vertex id."""
    nbrs = [sorted(set(u for u in a if u != v))
            for v, a in enumerate(_both_dir_adj(src, dst, n))]
    labels = list(range(n))
    for _ in range(num_iters):
        new = list(labels)
        for v in range(n):
            if not nbrs[v]:
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            new[v] = min(
                (lbl for lbl in counts),
                key=lambda l: (-counts[l], l),
            )
        if new == labels:
            break
        labels = new
    return labels


# ------------------------------------------------------------ centralities
# (engine extensions — no reference analogue; standard textbook definitions)

def hits(src, dst, n, num_iters=10):
    """Kleinberg HITS on the simple directed graph, L2-normalized after
    each half-step. Returns (hub, authority) arrays."""
    pairs = sorted(set(zip(src.tolist(), dst.tolist())))
    if pairs:
        s = np.array([p[0] for p in pairs], dtype=np.int64)
        d = np.array([p[1] for p in pairs], dtype=np.int64)
    else:
        s = d = np.empty(0, np.int64)
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(num_iters):
        auth = np.zeros(n)
        np.add.at(auth, d, hub[s])
        nrm = np.sqrt((auth * auth).sum())
        if nrm > 0:
            auth = auth / nrm
        hub = np.zeros(n)
        np.add.at(hub, s, auth[d])
        nrm = np.sqrt((hub * hub).sum())
        if nrm > 0:
            hub = hub / nrm
    return hub, auth


def personalized_pagerank(src, dst, n, seeds, damping=0.85, num_iters=20):
    """Seeded PageRank: teleport + dangling mass return uniformly to the
    seed set; duplicate edges weight w = multiplicity/outdeg."""
    p = np.zeros(n)
    p[np.asarray(sorted(set(seeds)), dtype=np.int64)] = 1.0 / len(set(seeds))
    deg = out_degrees(src, n)
    x = p.copy()
    for _ in range(num_iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, x[src] / deg[src])
        dang = x[deg == 0].sum()
        x = (1.0 - damping) * p + damping * (contrib + dang * p)
    return x


def bfs_distances(src, dst, n, sources, directed=True):
    """Multi-source BFS hop distances; -1 for unreachable."""
    adj = [[] for _ in range(n)]
    for s, d in set(zip(src.tolist(), dst.tolist())):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    dist = [-1] * n
    frontier = sorted(set(int(s) for s in sources))
    for s in frontier:
        dist[s] = 0
    depth = 0
    while frontier:
        depth += 1
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if dist[u] == -1:
                    dist[u] = depth
                    nxt.append(u)
        frontier = nxt
    return dist


def k_core(src, dst, n, k):
    """k-core of the undirected simple graph: returns {id: in-core degree}
    (empty dict when no k-core exists)."""
    nbrs = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    alive = {v for v in range(n) if nbrs[v]}
    while True:
        drop = {v for v in alive if len(nbrs[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(nbrs[v] & alive) for v in alive}


# ----------------------------------------------------- structure analytics
# (engine extensions — operators/structure.py; textbook definitions)

def clustering_coefficient(src, dst, n):
    """Per-vertex local clustering coefficient over the undirected simple
    graph. Returns (deg, tri, cc) arrays."""
    nbrs = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    deg = np.array([len(x) for x in nbrs], dtype=np.int64)
    tri = np.zeros(n, dtype=np.int64)
    for v in range(n):
        t = 0
        for u in nbrs[v]:
            t += len(nbrs[v] & nbrs[u])
        tri[v] = t // 2
    cc = np.where(deg >= 2, 2.0 * tri / np.maximum(deg * (deg - 1), 1), 0.0)
    return deg, tri, cc


def cocitation(src, dst, n, min_common=1, max_fanout=10_000):
    """{(a, b): common in-citers} with a < b, hub guard on citing fanout."""
    out = {}
    cites = {}
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            cites.setdefault(s, set()).add(d)
    for s, ds in cites.items():
        if len(ds) > max_fanout:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                key = (ds[i], ds[j])
                out[key] = out.get(key, 0) + 1
    return {k: v for k, v in out.items() if v >= min_common}


def strongly_connected_components(src, dst, n):
    """Iterative Tarjan; returns per-vertex scc label = min member id."""
    adj = [[] for _ in range(n)]
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            adj[s].append(d)
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack = []
    comp = [-1] * n
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp


def bowtie(src, dst, n):
    """Broder bow-tie classes around the largest SCC (ties: min scc id).
    Returns a list of 'CORE'/'IN'/'OUT'/'OTHER' per vertex."""
    comp = strongly_connected_components(src, dst, n)
    sizes = {}
    for c in comp:
        sizes[c] = sizes.get(c, 0) + 1
    core_id = min(sizes, key=lambda c: (-sizes[c], c))
    core = {v for v in range(n) if comp[v] == core_id}
    fwd_adj = [[] for _ in range(n)]
    bwd_adj = [[] for _ in range(n)]
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            fwd_adj[s].append(d)
            bwd_adj[d].append(s)

    def reach(seeds, adj):
        seen = set(seeds)
        frontier = list(seeds)
        while frontier:
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if u not in seen:
                        seen.add(u)
                        nxt.append(u)
            frontier = nxt
        return seen

    fwd = reach(core, fwd_adj)
    bwd = reach(core, bwd_adj)
    out = []
    for v in range(n):
        if v in core:
            out.append("CORE")
        elif v in bwd:
            out.append("IN")
        elif v in fwd:
            out.append("OUT")
        else:
            out.append("OTHER")
    return out


def sssp(src, dst, w, n, sources):
    """Bellman-Ford distances; inf for unreachable. Parallel edges: min."""
    edges = {}
    for s, d, ww in zip(src.tolist(), dst.tolist(), list(w)):
        if s != d:
            key = (s, d)
            edges[key] = min(edges.get(key, float("inf")), float(ww))
    dist = [float("inf")] * n
    for s in set(sources):
        dist[s] = 0.0
    for _ in range(n):
        changed = False
        for (s, d), ww in edges.items():
            if dist[s] + ww < dist[d]:
                dist[d] = dist[s] + ww
                changed = True
        if not changed:
            break
    return dist


def harmonic_centrality(src, dst, n, landmarks, directed=True):
    """h(v) = sum over landmarks u != v with u -> v reachable of 1/d(u,v)."""
    h = [0.0] * n
    for lm in sorted(set(landmarks)):
        d = bfs_distances(src, dst, n, [lm], directed=directed)
        for v in range(n):
            if v != lm and d[v] > 0:
                h[v] += 1.0 / d[v]
    return h


def adamic_adar(src, dst, n, min_common=1, max_fanout=10_000):
    """{(a, b): (common, score)} over the undirected simple graph; score =
    sum 1/ln(deg(z)) over common neighbors z with 2 <= deg(z) <= max_fanout
    (degrees from the full graph)."""
    nbrs = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out = {}
    for z in range(n):
        dz = len(nbrs[z])
        if dz < 2 or dz > max_fanout:
            continue
        ns = sorted(nbrs[z])
        wz = 1.0 / np.log(dz)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                c, s_ = out.get(key, (0, 0.0))
                out[key] = (c + 1, s_ + wz)
    return {k: v for k, v in out.items() if v[0] >= min_common}


def graph_summary(src, dst, n):
    """(n_vertices, n_edges_simple, n_sinks, max_out_deg, avg_out_deg,
    reciprocity) over the simple directed graph."""
    e = {(s, d) for s, d in zip(src.tolist(), dst.tolist()) if s != d}
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    recip = sum(1 for s, d in e if (d, s) in e)
    return (
        n, len(e), n - len(outdeg),
        max(outdeg.values()) if outdeg else 0,
        round(len(e) / max(n, 1), 8),
        round(recip / max(len(e), 1), 8),
    )


def random_walks(src, dst, n, walk_length=5, walks_per_vertex=1, seed=42):
    """Deterministic md5-chooser walks (operators/walks.py). Returns
    {(walk_id, step): vertex}; step 0 = start, sinks stop early."""
    import hashlib

    adj = {}
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    out = {}
    for v in range(n):
        for k in range(walks_per_vertex):
            wid = v * walks_per_vertex + k
            cur = v
            out[(wid, 0)] = cur
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = int(hashlib.md5(
                    f"{seed}|{wid}|{step}".encode()).hexdigest()[:15], 16)
                cur = nbrs[h % len(nbrs)]
                out[(wid, step)] = cur
    return out


def anf(src, dst, n, radius, n_sketches=8, seed=42):
    """Flajolet-Martin ANF (operators/anf.py): per-vertex ball_est after
    ``radius`` union sweeps, same md5 seeding/bit arithmetic. Returns
    {id: round(est, 6)}."""
    import hashlib

    def md5_63(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def tz(h):
        return (h & -h).bit_length() - 1 if h else 63

    sk = [[1 << min(tz(md5_63(f"{seed}|{k}|{v}")), 50)
           for k in range(n_sketches)] for v in range(n)]
    succ = {}
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            succ.setdefault(s, []).append(d)
    for _ in range(radius):
        new = [row[:] for row in sk]
        for v, ds in succ.items():
            for d in ds:
                for k in range(n_sketches):
                    new[v][k] |= sk[d][k]
        sk = new
    out = {}
    for v in range(n):
        rs = []
        for k in range(n_sketches):
            s = sk[v][k]
            rs.append(((~s) & (s + 1)).bit_length() - 1)
        out[v] = round(2.0 ** (sum(rs) / n_sketches) / 0.77351, 6)
    return out


def powerlaw_alpha(src, dst, n, xmin=1):
    """Hill/CSN continuous MLE over out-degrees >= xmin (matches
    operators.structure.powerlaw_alpha): (n_tail, alpha or None)."""
    import math

    deg = {}
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            deg[s] = deg.get(s, 0) + 1
    tail = [v for v in deg.values() if v >= xmin]
    s_ = sum(math.log(v / xmin) for v in tail)
    alpha = round(1.0 + len(tail) / s_, 8) if s_ > 0 else None
    return len(tail), alpha


def neighborhood_function(src, dst, n):
    """Exact N(t) = #{(v, u) : dist(v->u) <= t} including u = v, by BFS
    from every vertex. Returns [N(0), N(1), ..., N(D)] where D is the
    largest finite eccentricity (N stops growing after D)."""
    from collections import deque

    succ = {}
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            succ.setdefault(s, []).append(d)
    counts = {}  # t -> number of pairs at exactly distance t
    for v in range(n):
        dist = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            for w in succ.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for t in dist.values():
            counts[t] = counts.get(t, 0) + 1
    nf, acc = [], 0
    for t in range(max(counts) + 1):
        acc += counts.get(t, 0)
        nf.append(acc)
    return nf


def effective_diameter_exact(src, dst, n, q=0.9):
    """Exact interpolated q-effective diameter — same interpolation rule as
    operators.anf.effective_diameter, over the exact BFS curve."""
    nf = neighborhood_function(src, dst, n)
    target = q * nf[-1]
    for t, v in enumerate(nf):
        if v >= target:
            if t == 0 or nf[t] <= nf[t - 1]:
                return float(t)
            return (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
    return float(len(nf) - 1)


def betweenness(src, dst, n, sources=None):
    """Brandes betweenness (directed, unweighted, endpoints excluded);
    ``sources`` defaults to all vertices (exact bc)."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for s, d in set(zip(src.tolist(), dst.tolist())):
        if s != d:
            adj[s].append(d)
    bc = [0.0] * n
    for s in (range(n) if sources is None else sorted(set(sources))):
        dist = [-1] * n
        sigma = [0.0] * n
        preds = [[] for _ in range(n)]
        dist[s] = 0
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] == -1:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = [0.0] * n
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += (sigma[v] / sigma[w]) * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def k_truss(src, dst, n, k):
    """k-truss edge peel (operators/structure.k_truss): returns
    {(a, b): support} over surviving canonical edges, a < b."""
    edges = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            edges.add((min(s, d), max(s, d)))
    while True:
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in edges}
        drop = {e for e, s_ in sup.items() if s_ < k - 2}
        if not drop:
            return sup
        edges -= drop
        if not edges:
            return {}


def modularity(src, dst, n, labels):
    """{label: (internal, degree_sum, contrib)} over the undirected simple
    graph (operators/structure.modularity)."""
    und = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            und.add((min(s, d), max(s, d)))
    m = len(und)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for v, dv in deg.items():
        lbl = labels[v]
        i, ds = out.get(lbl, (0, 0))
        out[lbl] = (i, ds + dv)
    for a, b in und:
        if labels[a] == labels[b]:
            i, ds = out[labels[a]]
            out[labels[a]] = (i + 1, ds)
    return {lbl: (i, ds, round(i / m - (ds / (2.0 * m)) * (ds / (2.0 * m)), 8))
            for lbl, (i, ds) in out.items()}


def assortativity(src, dst, n):
    """(r, n_stubs) — Pearson over ordered undirected edge stubs."""
    und = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    stubs = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    ns = len(stubs)
    sx = sum(deg[a] for a, _ in stubs)
    sxx = sum(deg[a] * deg[a] for a, _ in stubs)
    sxy = sum(deg[a] * deg[b] for a, b in stubs)
    den = ns * sxx - sx * sx
    r = float(ns * sxy - sx * sx) / den if den else 0.0
    return round(r, 8), ns


def closeness_centrality(src, dst, n, landmarks, directed=True):
    """(r_v - 1)/S_v over landmark distances (v included when landmark)."""
    out = [0.0] * n
    r = [0] * n
    s = [0] * n
    for lm in sorted(set(landmarks)):
        d = bfs_distances(src, dst, n, [lm], directed=directed)
        for v in range(n):
            if d[v] >= 0:
                r[v] += 1
                s[v] += d[v]
    for v in range(n):
        out[v] = (r[v] - 1) / s[v] if s[v] > 0 else 0.0
    return out


def trust_rank(src, dst, n, weights, damping=0.85, num_iters=20):
    """Weighted-teleport PageRank (operators/centrality.trust_rank);
    ``weights`` is {id: w}, normalized internally."""
    total = float(sum(weights.values()))
    p = np.zeros(n)
    for v, w in weights.items():
        p[v] = w / total
    deg = out_degrees(src, n)
    x = p.copy()
    for _ in range(num_iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, x[src] / deg[src])
        dang = x[deg == 0].sum()
        x = (1.0 - damping) * p + damping * (contrib + dang * p)
    return x


def salsa(src, dst, n, num_iters=10):
    """SALSA hub/authority half-steps (operators/centrality.salsa)."""
    e = sorted({(s, d) for s, d in zip(src.tolist(), dst.tolist())
                if s != d})
    outdeg = {}
    indeg = {}
    for s, d in e:
        outdeg[s] = outdeg.get(s, 0) + 1
        indeg[d] = indeg.get(d, 0) + 1
    n_auth = len(indeg)
    a = {v: 1.0 / max(n_auth, 1) for v in indeg}
    h = {}
    for _ in range(num_iters):
        h = {}
        for s, d in e:
            h[s] = h.get(s, 0.0) + a.get(d, 0.0) / indeg[d]
        a = {}
        for s, d in e:
            a[d] = a.get(d, 0.0) + h.get(s, 0.0) / outdeg[s]
    hub = np.zeros(n)
    auth = np.zeros(n)
    for v, x in h.items():
        hub[v] = x
    for v, x in a.items():
        auth[v] = x
    return hub, auth


def jaccard_neighbors(src, dst, n, min_common=1, max_fanout=10_000):
    """{(a, b): (common, jac)} — |N∩|/|N∪| over undirected neighbors,
    middles guarded like adamic_adar, degrees from the full graph."""
    nbrs = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    deg = [len(x) for x in nbrs]
    common = {}
    for z in range(n):
        if deg[z] < 2 or deg[z] > max_fanout:
            continue
        ns = sorted(nbrs[z])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                common[key] = common.get(key, 0) + 1
    out = {}
    for (a, b), c in common.items():
        if c >= min_common:
            out[(a, b)] = (c, round(c / (deg[a] + deg[b] - c), 8))
    return out


def wl_refinement(src, dst, n, rounds=3):
    """1-WL labels (operators/structure.wl_refinement). {id: hex label}."""
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    nbrs = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    lbl = [h(str(len(nbrs[v]))) for v in range(n)]
    for _ in range(rounds):
        lbl = [h(lbl[v] + "|" + ",".join(sorted(lbl[u] for u in nbrs[v])))
               for v in range(n)]
    return {v: lbl[v] for v in range(n)}


def katz(src, dst, n, alpha=0.02, beta=1.0, num_iters=10):
    """Katz centrality, unrolled: x <- beta + alpha * A^T x over the simple
    self-loop-free directed edge set (operators.centrality.katz)."""
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    x = np.full(n, float(beta))
    for _ in range(num_iters):
        msgs = np.zeros(n)
        np.add.at(msgs, d, x[s])
        x = beta + alpha * msgs
    return x


def eigenvector_centrality(src, dst, n, num_iters=20):
    """Power iteration x <- normalize(A^T x) on the simple self-loop-free
    directed graph (operators.centrality.eigenvector_centrality)."""
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    x = np.ones(n)
    for _ in range(num_iters):
        nxt = np.zeros(n)
        np.add.at(nxt, d, x[s])
        nrm = np.sqrt((nxt * nxt).sum())
        x = nxt / nrm if nrm > 0 else nxt
    return x


def coreness(src, dst, n):
    """Core numbers by the classic min-degree peel (Batagelj-Zaversnik)
    over the undirected simple graph — the independent check for the
    distributed h-index fixpoint (operators.structure.coreness)."""
    keep = src != dst
    und = set()
    for a, b in zip(src[keep].tolist(), dst[keep].tolist()):
        und.add((a, b)); und.add((b, a))
    nbrs = [[] for _ in range(n)]
    for a, b in und:
        nbrs[a].append(b)
    deg = np.array([len(x) for x in nbrs])
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    k = 0
    for _ in range(n):
        cand = np.where(alive)[0]
        v = cand[np.argmin(deg[cand])]
        k = max(k, int(deg[v]))
        core[v] = k
        alive[v] = False
        for u in nbrs[v]:
            if alive[u]:
                deg[u] -= 1
    return core

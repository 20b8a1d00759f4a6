"""Programmatic DuckDB SQL twins for the driver's hash-exact oracle gate.

Round-1 left 11 driver queries on the weaker rows-only check (no SQL
oracle); this module generates their exact DuckDB twins:

- unrolled fixed-point SQL for the four graph colorings (greedy / JP /
  distance-2 / speculative) — the same MATERIALIZED-CTE unrolling pattern
  as ``queries.pagerank_sql``, with the mex expressed via DuckDB list
  functions;
- per-color Gauss–Seidel PageRank ("pagerankPP") — greedy-coloring CTEs
  feeding sweeps of per-color-slot rank updates;
- MinHash-LSH and SimHash in *md5 hash mode*: both engines derive 60-bit
  hashes as ``int('0x' + md5(s)[:15])`` (Spark ``conv(substring(md5,1,15),
  16,10)``; DuckDB ``CAST('0x' || substr(md5,1,15) AS BIGINT)``), making
  candidate generation bit-reproducible across engines. The xxhash64 mode
  stays the production path (JVM-native, no string round-trip).
- random-hyperplane LSH buckets with the seeded unit hyperplanes baked in
  as SQL literals (float64 repr round-trips exactly);
- sha256-derived multimodal stub features re-derived arithmetically;
- IVF-ANN assignment + probe + re-rank over centroids the Spark query
  exports to ``HANDOFF_DIR`` (parquet handoff: DuckDB cannot run k-means,
  but everything downstream of the fitted centroids is SQL).

All float aggregations that feed a hash comparison are sequenced
identically on both sides (Spark ``F.aggregate`` fold order == explicit
nested additions here) and rounded identically.
"""

from __future__ import annotations

import numpy as np

# Spark queries write cross-engine handoff tables (exported centroids, the
# encoded pages link graph) under this directory; oracle SQL reads them via
# read_parquet. The harness runs each Spark query immediately before its
# oracle, so last-write-wins is correct per run.
HANDOFF_DIR = "/tmp/hpr_oracle_handoff"

# deterministic linear-congruential priority — trivially reproducible in
# both engines (no overflow: id * 1103515245 stays far below 2^63)
JP_PRIORITY_SQL = "(id * 1103515245 + 12345) % 2147483648"


def _mex(expr: str) -> str:
    """DuckDB mex: smallest int >= 1 absent from the list ``expr``
    (findSmallestPossibleColor, GraphColoring.hs:229-241)."""
    lst = f"COALESCE({expr}, [])"
    return (f"COALESCE(list_min(list_filter(range(1, len({lst}) + 2), "
            f"x -> NOT list_contains({lst}, x))), 1)")


def _mex_bounded(expr: str, palette: int) -> str:
    """Bounded mex: smallest color in 1..palette absent from ``expr``;
    NULL when the palette is exhausted (operators.coloring bounded mode)."""
    lst = f"COALESCE({expr}, [])"
    return (f"list_min(list_filter(range(1, {palette} + 1), "
            f"x -> NOT list_contains({lst}, x)))")


def _und_ctes(edges_sql: str, verts_sql: str) -> list[str]:
    return [
        f"verts AS MATERIALIZED ({verts_sql})",
        f"e0 AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0))",
    ]


def _fixed_point_rounds(rounds: int, palette: int | None = None) -> list[str]:
    """The shared coloring fixed point over a predecessor table ``pe(src,
    dst)`` (dst = predecessor of src): each round colors every uncolored
    vertex whose predecessors are all colored, with the mex of their
    colors — mirrors operators.coloring._fixed_point_coloring exactly."""
    ctes = ["c0 AS MATERIALIZED (SELECT id, CAST(NULL AS INTEGER) AS color "
            "FROM verts)"]
    mex = (_mex("ps.pcolors") if palette is None
           else _mex_bounded("ps.pcolors", palette))
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"ps{i} AS MATERIALIZED (SELECT pe.src AS id, "
            "COUNT(*) AS n_pred, COUNT(c.color) AS n_colored, "
            "list(c.color) FILTER (WHERE c.color IS NOT NULL) AS pcolors "
            f"FROM pe JOIN c{p} c ON pe.dst = c.id GROUP BY 1)"
        )
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT v.id, "
            "CASE WHEN c.color IS NOT NULL THEN c.color "
            "WHEN COALESCE(ps.n_colored, 0) = COALESCE(ps.n_pred, 0) "
            f"THEN {mex} ELSE NULL END AS color "
            f"FROM verts v LEFT JOIN c{p} c ON v.id = c.id "
            f"LEFT JOIN ps{i} ps ON v.id = ps.id)"
        )
    return ctes


def greedy_coloring_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """graphColoringGreedyInputOrder fixed point: predecessors = lower-id
    both-direction neighbors. ``rounds`` must cover the longest
    id-increasing path (<= |V|); extra rounds are no-ops."""
    ctes = _und_ctes(edges_sql, verts_sql)
    ctes.append("pe AS MATERIALIZED (SELECT src, dst FROM und "
                "WHERE dst < src)")
    ctes += _fixed_point_rounds(rounds)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, color FROM c{rounds}"


def bounded_coloring_sql(edges_sql: str, verts_sql: str, rounds: int,
                         palette: int) -> str:
    """graphColoring bounded-palette fixed point (GraphColoring.hs:319-336):
    greedy predecessors, mex restricted to 1..palette."""
    ctes = _und_ctes(edges_sql, verts_sql)
    ctes.append("pe AS MATERIALIZED (SELECT src, dst FROM und "
                "WHERE dst < src)")
    ctes += _fixed_point_rounds(rounds, palette=palette)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, color FROM c{rounds}"


def color_layout_1d_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """getGraphColoring1D' layout over the greedy coloring: pos = rank in
    (color, id) order; (start, length) = the color's contiguous run."""
    greedy = greedy_coloring_sql(edges_sql, verts_sql, rounds)
    return f"""
WITH gc AS MATERIALIZED ({greedy}),
p AS (SELECT id, color,
             ROW_NUMBER() OVER (ORDER BY color, id) - 1 AS pos
      FROM gc)
SELECT id, color, pos,
       MIN(pos) OVER (PARTITION BY color) AS start,
       COUNT(*) OVER (PARTITION BY color) AS length
FROM p
"""


def jp_coloring_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """Jones–Plassmann fixed point with the LCG priorities of
    JP_PRIORITY_SQL: u precedes v iff (pri[u], u) < (pri[v], v)."""
    ctes = _und_ctes(edges_sql, verts_sql)
    ctes.append(
        f"pri AS MATERIALIZED (SELECT id, {JP_PRIORITY_SQL} AS p FROM verts)")
    ctes.append(
        "pe AS MATERIALIZED (SELECT u.src, u.dst FROM und u "
        "JOIN pri a ON u.src = a.id JOIN pri b ON u.dst = b.id "
        "WHERE b.p < a.p OR (b.p = a.p AND u.dst < u.src))")
    ctes += _fixed_point_rounds(rounds)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, color FROM c{rounds}"


def mis_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """Maximal independent set under the LCG priorities — via the theorem
    that the deterministic-Luby fixpoint equals the color-1 class of the
    Jones–Plassmann coloring with the same priorities (a vertex gets color 1
    iff no predecessor got color 1 iff no predecessor entered the greedy
    MIS; see operators.coloring.maximal_independent_set). Returns
    (id, in_mis 1/0)."""
    jp = jp_coloring_sql(edges_sql, verts_sql, rounds)
    return (f"SELECT id, CASE WHEN color = 1 THEN 1 ELSE 0 END AS in_mis "
            f"FROM ({jp}) _jp")


# deterministic edge priority for the matching gate — same LCG family as
# JP_PRIORITY_SQL, over the canonical (src < dst) endpoint pair; no overflow
# for ids < 2^31 (src * 1103515245 < 2^61)
MATCHING_PRIORITY_SQL = "(src * 1103515245 + dst * 12345 + 12345) % 2147483648"


def matching_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """Deterministic greedy maximal matching, mirroring the distributed
    local-min rounds of operators.coloring.maximal_matching directly: per
    round an active canonical edge wins iff its (pri, src, dst) key is the
    minimum at both endpoints (DuckDB ordered-aggregate ``first(... ORDER
    BY)``), then every edge touching a matched vertex retires. The globally
    minimal active edge always wins, so ``rounds`` >= max matching size
    (|V|/2) reaches the fixpoint; extra rounds are no-ops."""
    ctes = _und_ctes(edges_sql, verts_sql)
    ctes.append(
        "a0 AS MATERIALIZED (SELECT src, dst, "
        f"{MATCHING_PRIORITY_SQL} AS pri FROM und WHERE src < dst)")
    ctes.append("m0 AS MATERIALIZED (SELECT src, dst FROM a0 WHERE FALSE)")
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"inc{i} AS (SELECT src AS vid, pri, src, dst FROM a{p} "
            f"UNION ALL SELECT dst, pri, src, dst FROM a{p})")
        ctes.append(
            f"best{i} AS (SELECT vid, "
            "first(src ORDER BY pri, src, dst) AS bs, "
            "first(dst ORDER BY pri, src, dst) AS bd "
            f"FROM inc{i} GROUP BY vid)")
        ctes.append(
            f"w{i} AS (SELECT a.src, a.dst FROM a{p} a "
            f"JOIN best{i} b1 ON b1.vid = a.src AND b1.bs = a.src "
            "AND b1.bd = a.dst "
            f"JOIN best{i} b2 ON b2.vid = a.dst AND b2.bs = a.src "
            "AND b2.bd = a.dst)")
        ctes.append(
            f"m{i} AS (SELECT src, dst FROM m{p} "
            f"UNION ALL SELECT src, dst FROM w{i})")
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT a.src, a.dst, a.pri FROM a{p} a "
            f"WHERE a.src NOT IN (SELECT src FROM w{i} "
            f"UNION ALL SELECT dst FROM w{i}) "
            f"AND a.dst NOT IN (SELECT src FROM w{i} "
            f"UNION ALL SELECT dst FROM w{i}))")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT src, dst FROM m{rounds}")


def d2_coloring_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """Distance-2 greedy fixed point: predecessors = lower-id vertices at
    distance <= 2 in the undirected simple graph."""
    ctes = _und_ctes(edges_sql, verts_sql)
    ctes.append(
        "two AS MATERIALIZED (SELECT a.src AS src, b.dst AS dst "
        "FROM und a JOIN und b ON a.dst = b.src WHERE a.src <> b.dst)")
    ctes.append(
        "near AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT * FROM und UNION ALL SELECT * FROM two))")
    ctes.append("pe AS MATERIALIZED (SELECT src, dst FROM near "
                "WHERE dst < src)")
    ctes += _fixed_point_rounds(rounds)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, color FROM c{rounds}"


def speculative_coloring_sql(edges_sql: str, verts_sql: str,
                             rounds: int) -> str:
    """Synchronous conflict-fix loop (operators.coloring.speculative_
    coloring): init all colors 1; per round a vertex whose color collides
    with a higher-id neighbor recolors to the mex over its higher-id
    neighbors' colors. Stable fixed point -> extra rounds are no-ops."""
    ctes = _und_ctes(edges_sql, verts_sql)
    ctes.append("higher AS MATERIALIZED (SELECT src, dst FROM und "
                "WHERE dst > src)")
    ctes.append("c0 AS MATERIALIZED (SELECT id, 1 AS color FROM verts)")
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"nb{i} AS MATERIALIZED (SELECT h.src AS id, "
            "list(c.color) AS ncolors "
            f"FROM higher h JOIN c{p} c ON h.dst = c.id GROUP BY 1)"
        )
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT c.id, "
            "CASE WHEN list_contains(COALESCE(nb.ncolors, []), c.color) "
            f"THEN {_mex('nb.ncolors')} ELSE c.color END AS color "
            f"FROM c{p} c LEFT JOIN nb{i} nb ON c.id = nb.id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, color FROM c{rounds}"


# ------------------------------------------------- per-color Gauss–Seidel

def pagerank_pp_sql(edges_sql: str, verts_sql: str, sweeps: int,
                    max_colors: int, coloring_rounds: int,
                    damping: float = 0.15, round_to: int = 8) -> str:
    """Unrolled pagerankPP (PageRankWithPreprocessing.hs:269-294): greedy
    coloring of the amended graph (== coloring of the raw graph: amendSinks
    only reverses existing edges, so the undirected neighbor sets are
    identical), then ``sweeps`` Gauss–Seidel sweeps, each a sequence of
    ``max_colors`` per-color-slot updates (empty slots are no-ops).
    Reference semantics: dconst = (1-d)/n_nonsink over the amended graph,
    vertices with no amended out-edges pinned to 0, init 1/|V|."""
    ctes = _und_ctes(edges_sql, verts_sql)
    # amended weighted edge set (same CTE chain as pagerank_reflect_sql)
    ctes += [
        "snk AS MATERIALIZED (SELECT id FROM verts "
        "WHERE id NOT IN (SELECT src FROM e0))",
        "refl AS MATERIALIZED (SELECT e.dst AS src, e.src AS dst "
        "FROM e0 e JOIN snk ON e.dst = snk.id)",
        "ae AS MATERIALIZED (SELECT * FROM e0 UNION ALL SELECT * FROM refl)",
        "e AS MATERIALIZED (SELECT src, dst, COUNT(*) AS cnt FROM ae "
        "GROUP BY 1, 2)",
        "deg AS MATERIALIZED (SELECT src, SUM(cnt) AS deg FROM e GROUP BY 1)",
        "w AS MATERIALIZED (SELECT e.src, e.dst, "
        "CAST(e.cnt AS DOUBLE) / deg.deg AS w "
        "FROM e JOIN deg ON e.src = deg.src)",
        "ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "pe AS MATERIALIZED (SELECT src, dst FROM und WHERE dst < src)",
    ]
    ctes += _fixed_point_rounds(coloring_rounds)
    ctes.append(f"col AS MATERIALIZED (SELECT id, color FROM "
                f"c{coloring_rounds})")
    ctes.append("r0_0 AS MATERIALIZED (SELECT id, "
                "1.0 / (SELECT n FROM nv) AS rank FROM verts)")
    dconst = f"(1.0 - {damping}) / (SELECT n FROM ns)"
    prev = "r0_0"
    for s in range(1, sweeps + 1):
        for k in range(1, max_colors + 1):
            cur = f"r{s}_{k}"
            ctes.append(
                f"m{s}_{k} AS MATERIALIZED (SELECT w.dst AS id, "
                "SUM(w.w * r.rank) AS msg "
                f"FROM w JOIN {prev} r ON w.src = r.id "
                f"JOIN col ON w.dst = col.id AND col.color = {k} GROUP BY 1)"
            )
            ctes.append(
                f"{cur} AS MATERIALIZED (SELECT r.id, "
                f"CASE WHEN col.color = {k} THEN "
                "CASE WHEN d.src IS NULL THEN 0.0 "
                f"ELSE {dconst} + {damping} * COALESCE(m.msg, 0.0) END "
                "ELSE r.rank END AS rank "
                f"FROM {prev} r JOIN col ON r.id = col.id "
                f"LEFT JOIN m{s}_{k} m ON r.id = m.id "
                "LEFT JOIN deg d ON r.id = d.src)"
            )
            prev = cur
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, ROUND(rank, {round_to}) AS rank FROM {prev}")


# ------------------------------------------------------- md5-mode sketches

def _md5_60bit(expr: str) -> str:
    """DuckDB twin of Spark ``conv(substring(md5(x), 1, 15), 16, 10)``:
    the top 60 bits of md5 as a non-negative BIGINT."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_lsh_sql(shingles_sql: str, num_hashes: int, bands: int,
                    threshold: float, jaccard_round: int = 6) -> str:
    """MinHash+LSH twin in md5 hash mode. ``shingles_sql`` must yield
    (id, sh: list<varchar>) — the distinct word shingles per document."""
    rpb = num_hashes // bands
    band_keys = ", ".join(
        "(" + _md5_60bit(
            f"array_to_string(sig[{b * rpb + 1}:{b * rpb + rpb}], ',')"
        ) + f") AS k{b}"
        for b in range(bands)
    )
    band_structs = ", ".join(
        f"{{'band': {b}, 'key': k{b}}}" for b in range(bands))
    return f"""
WITH base AS MATERIALIZED ({shingles_sql}),
ex AS MATERIALIZED (
    SELECT id, {_md5_60bit('s')} % 2147483647 AS x
    FROM (SELECT id, unnest(sh) AS s FROM base)),
mh AS MATERIALIZED (
    -- multiply-mod-prime permutations, mirrored from
    -- functions/dedup.py minhash_signatures md5 mode:
    -- A_i = ((i*1103515245 + 12345) % (P-1)) + 1, B_i = (i*40503+17) % P
    SELECT id, i,
           MIN(((((i * 1103515245 + 12345) % 2147483646) + 1) * x
                + (i * 40503 + 17) % 2147483647) % 2147483647) AS m
    FROM ex CROSS JOIN (SELECT unnest(range({num_hashes})) AS i)
    GROUP BY 1, 2),
sig AS MATERIALIZED (
    SELECT id, list(m ORDER BY i) AS sig FROM mh GROUP BY 1),
keys AS MATERIALIZED (SELECT id, {band_keys} FROM sig),
bands AS MATERIALIZED (
    SELECT id, unnest([{band_structs}], recursive := true) FROM keys),
cand AS MATERIALIZED (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
    WHERE x.id < y.id),
j AS (
    SELECT c.id_a, c.id_b,
           ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                 {jaccard_round}) AS jaccard
    FROM cand c JOIN base a ON c.id_a = a.id JOIN base b ON c.id_b = b.id)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


def simhash_sql(tokens_sql: str, max_hamming: int, n_bits: int = 60,
                chunk_bits: int = 15) -> str:
    """SimHash twin in md5 hash mode: 60-bit signatures from per-token md5
    bit votes, 4 x 15-bit chunk banding. ``tokens_sql`` must yield
    (id, t) — one row per token occurrence."""
    n_chunks = n_bits // chunk_bits
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits))
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(n_bits))
    chunk_structs = ", ".join(
        f"{{'chunk': {c}, 'key': (simhash >> {c * chunk_bits}) "
        f"& {(1 << chunk_bits) - 1}}}"
        for c in range(n_chunks))
    return f"""
WITH tok AS MATERIALIZED ({tokens_sql}),
h AS MATERIALIZED (SELECT id, {_md5_60bit('t')} AS h FROM tok),
voted AS MATERIALIZED (SELECT id, {votes} FROM h GROUP BY 1),
sigs AS MATERIALIZED (SELECT id, CAST({sig} AS BIGINT) AS simhash
                      FROM voted),
chunks AS MATERIALIZED (
    SELECT id, simhash, unnest([{chunk_structs}], recursive := true)
    FROM sigs)
SELECT DISTINCT x.id AS id_a, y.id AS id_b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key
WHERE x.id < y.id AND bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


# ------------------------------------------------------------ LSH ANN twin

def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    """Must stay identical to functions.similarity._hyperplanes."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((tables, bits, dim))
    return h / np.linalg.norm(h, axis=2, keepdims=True)


def ann_lsh_pairs_sql(dim: int, threshold: float, bits: int, tables: int,
                      seed: int, cosine_round: int = 6) -> str:
    """LSH bucket + exact-cosine-re-rank twin over the embeddings view.
    The seeded unit hyperplanes are baked in as literals (repr(float64)
    round-trips exactly, so DuckDB parses the same doubles numpy holds)."""
    planes = _hyperplanes(dim, bits, tables, seed)
    sigs = []
    for t in range(tables):
        terms = []
        for b in range(bits):
            lits = ", ".join(repr(float(x)) for x in planes[t, b])
            terms.append(f"CASE WHEN list_dot_product(e, [{lits}]) > 0 "
                         f"THEN {1 << b} ELSE 0 END")
        sigs.append(f"SELECT id, {t} AS t, ({' + '.join(terms)}) AS bucket "
                    "FROM v")
    sig_union = "\nUNION ALL\n".join(sigs)
    return f"""
WITH v AS MATERIALIZED (
    SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings),
sig AS MATERIALIZED ({sig_union}),
cand AS MATERIALIZED (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM sig x JOIN sig y ON x.t = y.t AND x.bucket = y.bucket
    WHERE x.id < y.id),
scored AS (
    SELECT c.id_a, c.id_b,
           ROUND(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))),
                 {cosine_round}) AS cosine
    FROM cand c JOIN v a ON c.id_a = a.id JOIN v b ON c.id_b = b.id)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
"""


# ------------------------------------------------------------ IVF ANN twin

def ann_ivf_topk_sql(n_query: int, k: int, n_probe: int,
                     centroids_path: str, cosine_round: int = 6) -> str:
    """IVF assignment + probe + exact re-rank over the unit centroids the
    Spark query exports to ``centroids_path`` (parquet handoff — k-means
    itself is not SQL, everything downstream is). Assignment order matches
    ivf_assignments exactly: sim DESC, cell ASC."""
    return f"""
WITH c AS MATERIALIZED (
    SELECT cell, c FROM read_parquet('{centroids_path}/*.parquet')),
v AS MATERIALIZED (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings),
sims AS MATERIALIZED (
    SELECT v.vec_id, c.cell, list_dot_product(v.e, c.c) AS s,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.e, c.c) DESC,
                                       c.cell ASC) AS rn
    FROM v CROSS JOIN c),
cells AS MATERIALIZED (
    SELECT vec_id AS id, cell FROM sims WHERE rn = 1),
qcells AS MATERIALIZED (
    SELECT vec_id AS query_id, cell FROM sims
    WHERE rn <= {n_probe} AND vec_id < {n_query}),
cand AS MATERIALIZED (
    SELECT DISTINCT q.query_id, d.id AS neighbor_id
    FROM qcells q JOIN cells d ON q.cell = d.cell
    WHERE q.query_id <> d.id),
scored AS (
    SELECT c.query_id, c.neighbor_id,
           list_dot_product(q.e, d.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(d.e, d.e))) AS cs
    FROM cand c JOIN v q ON c.query_id = q.vec_id
    JOIN v d ON c.neighbor_id = d.vec_id)
SELECT query_id, neighbor_id, ROUND(cs, {cosine_round}) AS cosine FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {k}
"""


# ------------------------------------------------- multimodal feature twin

def multimodal_features_sql(feature_dim: int = 16, round_to: int = 6) -> str:
    """Twin of functions.multimodal._decode_stub: feature i = float32(
    uint32_LE(sha256(payload) bytes [4i..4i+4)) / 2^32) with the digest
    repeated (so feature i uses digest word i mod 8); feature_sum folds the
    float32 features into a double left-to-right — exactly Spark's
    ``F.aggregate(features, 0.0, (a, x) -> a + double(x))`` order.
    The payload is the utf-8 text bytes, so DuckDB's sha256(text) hashes
    the same bytes hashlib sees."""
    words = []
    for j in range(8):  # digest = 8 uint32 words, little-endian
        o = 8 * j
        be_hex = " || ".join(
            f"substr(h, {o + off + 1}, 2)" for off in (6, 4, 2, 0))
        words.append(
            f"CAST(CAST('0x' || {be_hex} AS BIGINT) / 4294967296.0 "
            f"AS REAL) AS f{j}")
    acc = "0.0"
    for i in range(feature_dim):
        acc = f"({acc} + CAST(f{i % 8} AS DOUBLE))"
    return f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS h FROM documents),
f AS (SELECT media_id, {', '.join(words)} FROM m)
SELECT media_id, ROUND({acc}, {round_to}) AS feature_sum FROM f
"""


# ---------------------------------------------------------- centralities
# (engine extensions: HITS / personalized PageRank / BFS / k-core —
# operators/centrality.py; textbook semantics, deterministic, so the twins
# are exact unrollings like queries.pagerank_sql)

def hits_sql(edges_sql: str, verts_sql: str, iters: int,
             round_to: int = 8) -> str:
    """Unrolled HITS over the simple directed edge set, L2-normalized after
    each half-step (matches operators.centrality.hits fp-op for fp-op)."""
    ctes = [
        f"verts AS MATERIALIZED ({verts_sql})",
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS s FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes += [
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(h.s) AS s "
            f"FROM e JOIN h{p} h ON e.src = h.id GROUP BY 1)",
            f"ad{i} AS MATERIALIZED (SELECT v.id, COALESCE(a.s, 0.0) AS s "
            f"FROM verts v LEFT JOIN ar{i} a ON v.id = a.id)",
            f"an{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nrm FROM ad{i})",
            f"a{i} AS MATERIALIZED (SELECT id, CASE WHEN "
            f"(SELECT nrm FROM an{i}) > 0 THEN s / (SELECT nrm FROM an{i}) "
            f"ELSE 0.0 END AS s FROM ad{i})",
            f"hr{i} AS MATERIALIZED (SELECT e.src AS id, SUM(a.s) AS s "
            f"FROM e JOIN a{i} a ON e.dst = a.id GROUP BY 1)",
            f"hd{i} AS MATERIALIZED (SELECT v.id, COALESCE(h.s, 0.0) AS s "
            f"FROM verts v LEFT JOIN hr{i} h ON v.id = h.id)",
            f"hn{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nrm FROM hd{i})",
            f"h{i} AS MATERIALIZED (SELECT id, CASE WHEN "
            f"(SELECT nrm FROM hn{i}) > 0 THEN s / (SELECT nrm FROM hn{i}) "
            f"ELSE 0.0 END AS s FROM hd{i})",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT h.id, ROUND(h.s, {round_to}) AS hub, "
            f"ROUND(a.s, {round_to}) AS authority "
            f"FROM h{iters} h JOIN a{iters} a ON h.id = a.id")


def ppr_sql(edges_sql: str, verts_sql: str, seeds: list[int], iters: int,
            damping: float = 0.85, round_to: int = 8) -> str:
    """Unrolled personalized PageRank: teleport + dangling mass return
    uniformly to the seed set (operators.centrality.personalized_pagerank)."""
    seed_list = ", ".join(str(int(s)) for s in sorted(set(seeds)))
    p0 = 1.0 / len(set(seeds))
    ctes = [
        f"verts AS MATERIALIZED ({verts_sql})",
        f"e AS MATERIALIZED (SELECT src, dst, COUNT(*) AS cnt FROM ({edges_sql}) "
        "WHERE src <> dst GROUP BY 1, 2)",
        "deg AS MATERIALIZED (SELECT src, SUM(cnt) AS deg FROM e GROUP BY 1)",
        "w AS MATERIALIZED (SELECT e.src, e.dst, CAST(e.cnt AS DOUBLE) / deg.deg AS w "
        "FROM e JOIN deg ON e.src = deg.src)",
        f"p AS MATERIALIZED (SELECT id, CASE WHEN id IN ({seed_list}) "
        f"THEN {p0!r} ELSE 0.0 END AS p FROM verts)",
        "r0 AS MATERIALIZED (SELECT id, p AS rank FROM p)",
    ]
    for i in range(1, iters + 1):
        pi = i - 1
        ctes += [
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m "
            f"FROM r{pi} r LEFT JOIN deg ON r.id = deg.src "
            "WHERE deg.src IS NULL)",
            f"m{i} AS MATERIALIZED (SELECT w.dst AS id, SUM(w.w * r.rank) AS msg "
            f"FROM w JOIN r{pi} r ON w.src = r.id GROUP BY 1)",
            f"r{i} AS MATERIALIZED (SELECT v.id, "
            f"(1.0 - {damping}) * p.p + {damping} * "
            f"(COALESCE(m.msg, 0.0) + (SELECT m FROM dang{i}) * p.p) AS rank "
            f"FROM verts v JOIN p ON v.id = p.id "
            f"LEFT JOIN m{i} m ON v.id = m.id)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, ROUND(rank, {round_to}) AS rank FROM r{iters}")


def bfs_sql(edges_sql: str, verts_sql: str, sources: list[int],
            directed: bool = True, max_depth: int = 50) -> str:
    """Multi-source BFS hop distances as a recursive CTE (reached vertices
    only — matches operators.centrality.bfs_distances)."""
    src_list = ", ".join(str(int(s)) for s in sorted(set(sources)))
    base = f"SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst"
    if not directed:
        base = ("SELECT DISTINCT src, dst FROM ("
                f"SELECT src, dst FROM ({edges_sql}) WHERE src <> dst "
                f"UNION ALL SELECT dst, src FROM ({edges_sql}) "
                "WHERE src <> dst)")
    return f"""
        WITH RECURSIVE e AS ({base}),
        r(id, d) AS (
            SELECT id, CAST(0 AS BIGINT) FROM ({verts_sql})
            WHERE id IN ({src_list})
            UNION
            SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id
            WHERE r.d < {max_depth}
        )
        SELECT id, MIN(d) AS dist FROM r GROUP BY 1
    """


def k_core_sql(edges_sql: str, verts_sql: str, k: int, rounds: int) -> str:
    """Unrolled k-core peel over the undirected simple graph; ``rounds``
    must cover the peel depth (each non-fixpoint round removes >= 1 vertex,
    so rounds = |V| + 1 always suffices). Output (id, deg) = the core
    members with their within-core degree."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0))",
        "v0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes += [
            f"d{i} AS MATERIALIZED (SELECT u.src AS id, COUNT(*) AS deg "
            f"FROM und u JOIN v{p} a ON u.src = a.id "
            f"JOIN v{p} b ON u.dst = b.id GROUP BY 1)",
            f"v{i} AS MATERIALIZED (SELECT id FROM d{i} WHERE deg >= {k})",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, deg FROM d{rounds} WHERE deg >= {k}")


# ------------------------------------------------------ structure analytics
# (engine extensions: clustering coefficient / co-citation / SCC / bow-tie /
# SSSP / harmonic centrality — operators/structure.py; deterministic, so the
# twins are direct SQL or exact unrollings)

def clustering_sql(edges_sql: str, verts_sql: str, round_to: int = 8) -> str:
    """Local clustering coefficient: degree + per-vertex triangle count over
    the undirected simple graph (matches operators.structure
    .clustering_coefficient)."""
    return f"""
        WITH e0 AS ({edges_sql}),
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM e0 WHERE src <> dst
                 UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
        canon AS (SELECT src, dst FROM und WHERE src < dst),
        tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
                JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        stacked AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri),
        cnt AS (SELECT id, COUNT(*) AS n FROM stacked GROUP BY 1),
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY 1)
        SELECT v.id, COALESCE(deg.deg, 0) AS deg,
               COALESCE(cnt.n, 0) AS n_triangles,
               ROUND(CASE WHEN COALESCE(deg.deg, 0) >= 2
                     THEN 2.0 * COALESCE(cnt.n, 0)
                          / (deg.deg * (deg.deg - 1))
                     ELSE 0.0 END, {round_to}) AS cc
        FROM ({verts_sql}) v
        LEFT JOIN deg ON v.id = deg.id
        LEFT JOIN cnt ON v.id = cnt.id
    """


def cocitation_sql(edges_sql: str, min_common: int = 1,
                   max_fanout: int = 10_000) -> str:
    """Co-citation pair counts with the citing-fanout hub guard (matches
    operators.structure.cocitation)."""
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})
                   WHERE src <> dst),
        fan AS (SELECT src FROM e GROUP BY 1
                HAVING COUNT(*) <= {max_fanout}),
        ek AS (SELECT e.src, e.dst FROM e JOIN fan USING (src))
        SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
        FROM ek e1 JOIN ek e2
          ON e1.src = e2.src AND e1.dst < e2.dst
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_common}
    """


def scc_sql(edges_sql: str, verts_sql: str) -> str:
    """SCC labels via mutual reachability: reach(a, b) transitive closure,
    scc(v) = min u with v ->* u and u ->* v (matches operators.structure
    .strongly_connected_components; fixture scale only — the closure is
    O(n^2) rows, fine for gate graphs)."""
    return f"""
        WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ({edges_sql})
                             WHERE src <> dst),
        reach(a, b) AS (
            SELECT id, id FROM ({verts_sql})
            UNION
            SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
        )
        SELECT r1.a AS id, MIN(r1.b) AS scc
        FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
        GROUP BY 1
    """


def bowtie_sql(edges_sql: str, verts_sql: str) -> str:
    """Bow-tie classes around the largest SCC (ties: min scc id); CORE /
    IN (reaches core) / OUT (reached from core) / OTHER."""
    return f"""
        WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ({edges_sql})
                             WHERE src <> dst),
        reach(a, b) AS (
            SELECT id, id FROM ({verts_sql})
            UNION
            SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
        ),
        scc AS (
            SELECT r1.a AS id, MIN(r1.b) AS scc
            FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
            GROUP BY 1
        ),
        core_id AS (SELECT scc FROM scc GROUP BY scc
                    ORDER BY COUNT(*) DESC, scc LIMIT 1),
        core AS (SELECT id FROM scc WHERE scc = (SELECT scc FROM core_id)),
        fwd AS (SELECT DISTINCT r.b AS id FROM reach r
                JOIN core c ON r.a = c.id),
        bwd AS (SELECT DISTINCT r.a AS id FROM reach r
                JOIN core c ON r.b = c.id)
        SELECT v.id,
               CASE WHEN v.id IN (SELECT id FROM core) THEN 'CORE'
                    WHEN v.id IN (SELECT id FROM bwd) THEN 'IN'
                    WHEN v.id IN (SELECT id FROM fwd) THEN 'OUT'
                    ELSE 'OTHER' END AS component
        FROM ({verts_sql}) v
    """


def sssp_sql(edges_sql: str, verts_sql: str, sources: list[int],
             rounds: int, round_to: int = 6) -> str:
    """Unrolled Bellman-Ford over deterministic weights
    w = 1 + (src*31 + dst) % 7 (matches queries._q_sssp_nation); ``rounds``
    >= |V| guarantees the fixpoint. Reached vertices only."""
    src_list = ", ".join(str(int(s)) for s in sorted(set(sources)))
    ctes = [
        f"w AS MATERIALIZED (SELECT src, dst, "
        "1.0 + (src * 31 + dst) % 7 AS w "
        f"FROM (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst))",
        f"d0 AS MATERIALIZED (SELECT id, 0.0 AS d FROM ({verts_sql}) "
        f"WHERE id IN ({src_list}))",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT id, MIN(d) AS d FROM ("
            f"SELECT id, d FROM d{p} "
            f"UNION ALL "
            f"SELECT w.dst AS id, d{p}.d + w.w AS d "
            f"FROM d{p} JOIN w ON w.src = d{p}.id) GROUP BY 1)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, ROUND(d, {round_to}) AS dist FROM d{rounds}")


def harmonic_sql(edges_sql: str, verts_sql: str, round_to: int = 8,
                 max_depth: int = 50, sources_sql: str | None = None,
                 scale_num: float = 1.0, scale_den: float = 1.0) -> str:
    """Exact harmonic centrality (landmarks = all vertices) via one
    multi-landmark recursive BFS; h(v) = sum over u != v reaching v of
    1/d(u, v) (matches operators.structure.harmonic_centrality). With
    ``sources_sql`` the BFS seeds only those landmarks and the sum is
    multiplied by scale_num/scale_den before rounding — the
    Eppstein–Wang landmark estimate, matching ``harmonic_sampled``
    (which scales as h * n / k in that operand order)."""
    seed = sources_sql if sources_sql is not None else verts_sql
    return f"""
        WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ({edges_sql})
                             WHERE src <> dst),
        r(lm, id, d) AS (
            SELECT id, id, CAST(0 AS BIGINT) FROM ({seed})
            UNION
            SELECT r.lm, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id
            WHERE r.d < {max_depth}
        ),
        m AS (SELECT lm, id, MIN(d) AS d FROM r GROUP BY 1, 2),
        h AS (SELECT id, SUM(1.0 / d) AS harmonic FROM m
              WHERE d > 0 GROUP BY 1)
        SELECT v.id, ROUND(COALESCE(h.harmonic, 0.0) * {scale_num!r}
                           / {scale_den!r}, {round_to}) AS harmonic
        FROM ({verts_sql}) v LEFT JOIN h ON v.id = h.id
    """


def adamic_adar_sql(edges_sql: str, min_common: int = 1,
                    max_fanout: int = 10_000, round_to: int = 8) -> str:
    """Adamic–Adar pair scores over the undirected simple graph; middles
    with deg < 2 or deg > max_fanout excluded, degrees from the full graph
    (matches operators.structure.adamic_adar)."""
    return f"""
        WITH e0 AS ({edges_sql}),
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM e0 WHERE src <> dst
                 UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY 1),
        mid AS (SELECT u.src, u.dst, d.deg AS zdeg
                FROM und u JOIN deg d ON u.src = d.id
                WHERE d.deg BETWEEN 2 AND {max_fanout})
        SELECT m1.dst AS a, m2.dst AS b, COUNT(*) AS common,
               ROUND(SUM(1.0 / ln(m1.zdeg)), {round_to}) AS score
        FROM mid m1 JOIN mid m2
          ON m1.src = m2.src AND m1.dst < m2.dst
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_common}
    """


def graph_summary_sql(edges_sql: str, verts_sql: str,
                      round_to: int = 8) -> str:
    """One-row graph shape dashboard (matches operators.structure
    .graph_summary)."""
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})
                   WHERE src <> dst),
        v AS (SELECT COUNT(*) AS n FROM ({verts_sql})),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        r AS (SELECT COUNT(*) AS n FROM e
              WHERE EXISTS (SELECT 1 FROM e e2
                            WHERE e2.src = e.dst AND e2.dst = e.src))
        SELECT (SELECT n FROM v) AS n_vertices,
               (SELECT COUNT(*) FROM e) AS n_edges,
               (SELECT n FROM v) - (SELECT COUNT(*) FROM deg) AS n_sinks,
               COALESCE((SELECT MAX(deg) FROM deg), 0) AS max_out_deg,
               ROUND((SELECT COUNT(*) FROM e)
                     / GREATEST(CAST((SELECT n FROM v) AS DOUBLE), 1),
                     {round_to}) AS avg_out_deg,
               ROUND((SELECT n FROM r)
                     / GREATEST(CAST((SELECT COUNT(*) FROM e) AS DOUBLE), 1),
                     {round_to}) AS reciprocity
    """


def transitivity_sql(edges_sql: str, round_to: int = 8) -> str:
    """Global clustering coefficient (matches operators.structure
    .transitivity): 3T/W over the undirected simple graph; the twin counts
    triangles by the id-ordered (a<b<c) triple join — same exact integer
    as the engine's degree-ordered orientation."""
    return f"""
        WITH u AS (SELECT DISTINCT LEAST(src, dst) AS a,
                          GREATEST(src, dst) AS b
                   FROM ({edges_sql}) WHERE src <> dst),
        ub AS (SELECT a AS v FROM u UNION ALL SELECT b FROM u),
        deg AS (SELECT v, COUNT(*) AS d FROM ub GROUP BY 1),
        wg AS (SELECT COALESCE(SUM(d * (d - 1) // 2), 0) AS n_wedges
               FROM deg),
        tri AS (SELECT COUNT(*) AS n_triangles
                FROM u e1 JOIN u e2 ON e1.b = e2.a
                     JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT CAST((SELECT n_wedges FROM wg) AS BIGINT) AS n_wedges,
               (SELECT n_triangles FROM tri) AS n_triangles,
               ROUND(3.0 * (SELECT n_triangles FROM tri)
                     / GREATEST(CAST((SELECT n_wedges FROM wg) AS DOUBLE),
                                1), {round_to}) AS transitivity
    """


def rich_club_sql(edges_sql: str, scale: int = 1_000_000) -> str:
    """Rich-club curve (matches operators.structure.rich_club): histogram
    merge + one cumulative-from-strictly-above window; all-BIGINT
    phi_ppm."""
    cum = ("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")
    return f"""
        WITH u AS (SELECT DISTINCT LEAST(src, dst) AS a,
                          GREATEST(src, dst) AS b
                   FROM ({edges_sql}) WHERE src <> dst),
        ub AS (SELECT a AS v FROM u UNION ALL SELECT b FROM u),
        deg AS (SELECT v, COUNT(*) AS d FROM ub GROUP BY 1),
        hd AS (SELECT d AS val, COUNT(*) AS ncnt FROM deg GROUP BY 1),
        hm AS (SELECT LEAST(da.d, db.d) AS val, COUNT(*) AS ecnt
               FROM u JOIN deg da ON u.a = da.v
                      JOIN deg db ON u.b = db.v
               GROUP BY 1),
        axis AS (SELECT COALESCE(hd.val, hm.val) AS val,
                        COALESCE(ncnt, 0) AS ncnt,
                        COALESCE(ecnt, 0) AS ecnt
                 FROM hd FULL OUTER JOIN hm ON hd.val = hm.val),
        curve AS (SELECT val AS k,
                         CAST(COALESCE(SUM(ncnt) OVER (
                             ORDER BY val DESC {cum}), 0) AS BIGINT)
                             AS n_nodes,
                         CAST(COALESCE(SUM(ecnt) OVER (
                             ORDER BY val DESC {cum}), 0) AS BIGINT)
                             AS n_edges
                  FROM axis)
        SELECT k, n_nodes, n_edges,
               (2 * n_edges * {scale}) // (n_nodes * (n_nodes - 1))
                   AS phi_ppm
        FROM curve WHERE n_nodes >= 2
    """


def betweenness_sql_twin(edges_sql: str, verts_sql: str,
                         max_depth: int = 12,
                         sources_sql: str | None = None,
                         scale_num: float = 1.0,
                         scale_den: float = 1.0) -> str:
    """Thin re-export keeping queries.py's one-import convention; the twin
    itself lives beside the operator (operators/betweenness.py)."""
    from .operators.betweenness import betweenness_sql
    return betweenness_sql(edges_sql, verts_sql, max_depth=max_depth,
                           sources_sql=sources_sql, scale_num=scale_num,
                           scale_den=scale_den)


def k_truss_sql(edges_sql: str, k: int, rounds: int) -> str:
    """Unrolled k-truss peel (matches operators.structure.k_truss);
    ``rounds`` must cover the peel depth (extra rounds are no-ops; the
    hard bound is |E|+1)."""
    ctes = [
        f"e0raw AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "c0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM e0raw)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes += [
            # support of every surviving canonical edge = common neighbors
            f"t{i} AS MATERIALIZED (SELECT c.src, c.dst, COUNT(w.w) "
            f"AS support FROM c{p} c LEFT JOIN ("
            f"SELECT src AS v, dst AS w FROM c{p} "
            f"UNION ALL SELECT dst AS v, src AS w FROM c{p}) n1 "
            "ON n1.v = c.src "
            f"LEFT JOIN (SELECT src AS v, dst AS w FROM c{p} "
            f"UNION ALL SELECT dst AS v, src AS w FROM c{p}) w "
            "ON w.v = c.dst AND w.w = n1.w "
            "GROUP BY 1, 2)",
            f"c{i} AS MATERIALIZED (SELECT src, dst FROM t{i} "
            f"WHERE support >= {k - 2})",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT src, dst, support FROM t{rounds} "
            f"WHERE support >= {k - 2}")


def trussness_sql(edges_sql: str, rounds: int) -> str:
    """Unrolled edge h-index fixpoint for the full truss decomposition,
    mirroring operators.structure.trussness: triangle-edge incidence
    materialized once (id-oriented enumeration — same count as the
    degree-oriented Spark path), t0 = support, per round t(e) := min(t(e),
    h-index over min(t(e1), t(e2)) of e's triangles). ``rounds`` must
    cover the convergence depth (extra rounds are no-ops at the fixpoint;
    each non-converged round decreases some t by >= 1, so max-support
    rounds always suffice). Triangle-free edges report trussness 2."""
    ctes = [
        f"e0raw AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "canon AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM e0raw)",
        "tri AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c "
        "FROM canon e1 JOIN canon e2 ON e1.dst = e2.src "
        "JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)",
        "inc AS MATERIALIZED ("
        "SELECT a AS s, b AS d, b AS o1s, c AS o1d, a AS o2s, c AS o2d "
        "FROM tri UNION ALL "
        "SELECT b, c, a, b, a, c FROM tri UNION ALL "
        "SELECT a, c, a, b, b, c FROM tri)",
        "t0 AS MATERIALIZED (SELECT c.src AS s, c.dst AS d, "
        "COUNT(i.s) AS t FROM canon c LEFT JOIN inc i "
        "ON i.s = c.src AND i.d = c.dst GROUP BY 1, 2)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes += [
            f"m{i} AS (SELECT i.s, i.d, LEAST(t1.t, t2.t) AS m "
            f"FROM inc i JOIN t{p} t1 ON t1.s = i.o1s AND t1.d = i.o1d "
            f"JOIN t{p} t2 ON t2.s = i.o2s AND t2.d = i.o2d)",
            f"h{i} AS (SELECT s, d, MAX(LEAST(m, cum)) AS h FROM ("
            f"SELECT s, d, m, SUM(cnt) OVER (PARTITION BY s, d "
            "ORDER BY m DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS cum FROM ("
            f"SELECT s, d, m, COUNT(*) AS cnt FROM m{i} GROUP BY 1, 2, 3"
            ")) GROUP BY 1, 2)",
            f"t{i} AS MATERIALIZED (SELECT t.s, t.d, "
            f"LEAST(t.t, COALESCE(h.h, 0)) AS t FROM t{p} t "
            f"LEFT JOIN h{i} h ON h.s = t.s AND h.d = t.d)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT s AS src, d AS dst, t + 2 AS trussness "
            f"FROM t{rounds}")


def modularity_sql(edges_sql: str, labels_sql: str,
                   round_to: int = 8) -> str:
    """Per-community modularity terms over the undirected simple graph;
    ``labels_sql`` yields (id, label) — e.g. queries.lp_sql's output
    (matches operators.structure.modularity)."""
    return f"""
        WITH lp AS MATERIALIZED (SELECT * FROM ({labels_sql}) t),
        e0 AS (SELECT src, dst FROM ({edges_sql}) WHERE src <> dst),
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
        canon AS (SELECT src, dst FROM und WHERE src < dst),
        m AS (SELECT COUNT(*) AS m FROM canon),
        internal AS (SELECT ls.label, COUNT(*) AS n FROM canon c
                     JOIN lp ls ON c.src = ls.id
                     JOIN lp ld ON c.dst = ld.id
                     WHERE ls.label = ld.label GROUP BY 1),
        degsum AS (SELECT l.label, COUNT(*) AS ds FROM und u
                   JOIN lp l ON u.src = l.id GROUP BY 1)
        SELECT d.label, COALESCE(i.n, 0) AS internal_edges,
               d.ds AS degree_sum,
               ROUND(COALESCE(i.n, 0) / CAST(m.m AS DOUBLE)
                     - (d.ds / (2.0 * m.m)) * (d.ds / (2.0 * m.m)),
                     {round_to}) AS contrib
        FROM degsum d LEFT JOIN internal i ON d.label = i.label, m
    """


def assortativity_sql(edges_sql: str, round_to: int = 8) -> str:
    """One-row degree-assortativity twin — identical integer moments, one
    final float division (matches operators.structure.assortativity)."""
    return f"""
        WITH e0 AS (SELECT src, dst FROM ({edges_sql}) WHERE src <> dst),
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY 1),
        stubs AS (SELECT dx.deg AS dx, dy.deg AS dy FROM und u
                  JOIN deg dx ON u.src = dx.id JOIN deg dy ON u.dst = dy.id),
        agg AS (SELECT COUNT(*) AS n, SUM(dx) AS sx,
                       SUM(dx * dx) AS sxx, SUM(dx * dy) AS sxy FROM stubs)
        SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
               ELSE ROUND(CAST(n * sxy - sx * sx AS DOUBLE)
                          / (n * sxx - sx * sx), {round_to}) END AS r,
               n AS n_stubs
        FROM agg
    """


def closeness_sql(edges_sql: str, verts_sql: str, round_to: int = 8,
                  max_depth: int = 50) -> str:
    """Incoming closeness (r-1)/S over the all-landmark BFS (matches
    operators.structure.closeness_centrality)."""
    return f"""
        WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ({edges_sql})
                             WHERE src <> dst),
        r(lm, id, d) AS (
            SELECT id, id, CAST(0 AS BIGINT) FROM ({verts_sql})
            UNION
            SELECT r.lm, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id
            WHERE r.d < {max_depth}
        ),
        m AS (SELECT lm, id, MIN(d) AS d FROM r GROUP BY 1, 2),
        c AS (SELECT id, COUNT(*) AS rr, SUM(d) AS s FROM m GROUP BY 1)
        SELECT v.id, ROUND(CASE WHEN COALESCE(c.s, 0) > 0
                    THEN CAST(c.rr - 1 AS DOUBLE) / c.s
                    ELSE 0.0 END, {round_to}) AS closeness
        FROM ({verts_sql}) v LEFT JOIN c ON v.id = c.id
    """


def trust_rank_sql(edges_sql: str, verts_sql: str, weights_sql: str,
                   iters: int, damping: float = 0.85,
                   round_to: int = 8) -> str:
    """Unrolled weighted-teleport PageRank (TrustRank); ``weights_sql``
    yields (id, weight) — matches operators.centrality.trust_rank."""
    ctes = [
        f"verts AS MATERIALIZED ({verts_sql})",
        f"wt AS MATERIALIZED ({weights_sql})",
        "tot AS MATERIALIZED (SELECT SUM(weight) AS t FROM wt)",
        f"e AS MATERIALIZED (SELECT src, dst, COUNT(*) AS cnt "
        f"FROM ({edges_sql}) WHERE src <> dst GROUP BY 1, 2)",
        "deg AS MATERIALIZED (SELECT src, SUM(cnt) AS deg FROM e GROUP BY 1)",
        "w AS MATERIALIZED (SELECT e.src, e.dst, "
        "CAST(e.cnt AS DOUBLE) / deg.deg AS w "
        "FROM e JOIN deg ON e.src = deg.src)",
        "p AS MATERIALIZED (SELECT v.id, "
        "COALESCE(wt.weight, 0.0) / (SELECT t FROM tot) AS p "
        "FROM verts v LEFT JOIN wt ON v.id = wt.id)",
        "r0 AS MATERIALIZED (SELECT id, p AS rank FROM p)",
    ]
    for i in range(1, iters + 1):
        pi = i - 1
        ctes += [
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) "
            f"AS m FROM r{pi} r LEFT JOIN deg ON r.id = deg.src "
            "WHERE deg.src IS NULL)",
            f"m{i} AS MATERIALIZED (SELECT w.dst AS id, "
            f"SUM(w.w * r.rank) AS msg FROM w JOIN r{pi} r ON w.src = r.id "
            "GROUP BY 1)",
            f"r{i} AS MATERIALIZED (SELECT v.id, "
            f"(1.0 - {damping}) * p.p + {damping} * "
            f"(COALESCE(m.msg, 0.0) + (SELECT m FROM dang{i}) * p.p) AS rank "
            f"FROM verts v JOIN p ON v.id = p.id "
            f"LEFT JOIN m{i} m ON v.id = m.id)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, ROUND(rank, {round_to}) AS rank FROM r{iters}")


def salsa_sql(edges_sql: str, verts_sql: str, iters: int,
              round_to: int = 8) -> str:
    """Unrolled SALSA half-steps (matches operators.centrality.salsa)."""
    ctes = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "od AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e "
        "GROUP BY 1)",
        "ind AS MATERIALIZED (SELECT dst, COUNT(*) AS indeg FROM e "
        "GROUP BY 1)",
        "a0 AS MATERIALIZED (SELECT dst AS id, "
        "1.0 / (SELECT COUNT(*) FROM ind) AS s FROM ind)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes += [
            f"h{i} AS MATERIALIZED (SELECT e.src AS id, "
            f"SUM(a.s / ind.indeg) AS s FROM e "
            f"JOIN a{p} a ON e.dst = a.id "
            "JOIN ind ON e.dst = ind.dst GROUP BY 1)",
            f"a{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"SUM(h.s / od.outdeg) AS s FROM e "
            f"JOIN h{i} h ON e.src = h.id "
            "JOIN od ON e.src = od.src GROUP BY 1)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"""
        SELECT v.id, ROUND(COALESCE(h.s, 0.0), {round_to}) AS hub,
               ROUND(COALESCE(a.s, 0.0), {round_to}) AS authority
        FROM ({verts_sql}) v
        LEFT JOIN h{iters} h ON v.id = h.id
        LEFT JOIN a{iters} a ON v.id = a.id""")


def jaccard_neighbors_sql(edges_sql: str, min_common: int = 1,
                          max_fanout: int = 10_000,
                          round_to: int = 8) -> str:
    """Jaccard neighbor-similarity pairs (matches operators.structure
    .jaccard_neighbors)."""
    return f"""
        WITH e0 AS ({edges_sql}),
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM e0 WHERE src <> dst
                 UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY 1),
        mid AS (SELECT u.src, u.dst FROM und u JOIN deg d ON u.src = d.id
                WHERE d.deg BETWEEN 2 AND {max_fanout}),
        pairs AS (SELECT m1.dst AS a, m2.dst AS b, COUNT(*) AS common
                  FROM mid m1 JOIN mid m2
                    ON m1.src = m2.src AND m1.dst < m2.dst
                  GROUP BY 1, 2
                  HAVING COUNT(*) >= {min_common})
        SELECT p.a, p.b, p.common,
               ROUND(CAST(p.common AS DOUBLE)
                     / (da.deg + db.deg - p.common), {round_to}) AS jac
        FROM pairs p JOIN deg da ON p.a = da.id JOIN deg db ON p.b = db.id
    """


def simrank_sql(edges_sql: str, verts_sql: str, iters: int,
                c: float = 0.8, round_to: int = 6) -> str:
    """All-pairs SimRank unrolled ``iters`` times (matches
    operators.structure.simrank): s0 = identity; each step expands every
    scored pair through the directed simple edge set, sums per target
    pair, normalizes by the in-degree product, and re-pins the diagonal.
    Output: (a, b, score) for a < b with score > 0 (structural inclusion,
    identical in every engine)."""
    ctes = [
        f"e0 AS ({edges_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 "
        "WHERE src <> dst)",
        f"verts AS MATERIALIZED ({verts_sql})",
        "ind AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS ind "
        "FROM e GROUP BY 1)",
        "s0 AS MATERIALIZED (SELECT id AS a, id AS b, 1.0 AS s FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT e1.dst AS a, e2.dst AS b, "
            f"SUM(s.s) AS tot FROM s{p} s "
            "JOIN e e1 ON e1.src = s.a JOIN e e2 ON e2.src = s.b "
            "GROUP BY 1, 2)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED ("
            "SELECT id AS a, id AS b, 1.0 AS s FROM verts "
            "UNION ALL "
            f"SELECT m.a, m.b, {c} * m.tot / (ia.ind * ib.ind) AS s "
            f"FROM m{i} m JOIN ind ia ON ia.id = m.a "
            "JOIN ind ib ON ib.id = m.b WHERE m.a <> m.b)"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT a, b, ROUND(s, {round_to}) AS score FROM s{iters} "
              "WHERE a < b AND s > 0")


def ngram_counts_sql(n: int, min_count: int = 2) -> str:
    """Corpus n-gram counts over ``documents`` (matches functions.text
    .ngram_counts; same whitespace tokenizer twin as token_stats)."""
    return f"""
        WITH t AS (SELECT string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
        g AS (SELECT array_to_string(toks[i:i+{n - 1}], ' ') AS ngram
              FROM t, UNNEST(range(1, len(toks) - {n - 1} + 1)) AS u(i)
              WHERE len(toks) >= {n})
        SELECT ngram, COUNT(*) AS cnt FROM g
        GROUP BY 1 HAVING COUNT(*) >= {min_count}
    """


def top_bigram_share_sql(scale: int = 1_000_000) -> str:
    """Per-document most-frequent bigram + integer ppm token share over
    ``documents`` (matches functions.text.top_bigram_share): all-BIGINT
    ``share_ppm = (2 * cnt * scale) // n_tokens``, ties on ascending
    gram."""
    return f"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
        b AS (SELECT doc_id, len(toks) AS n_tokens,
                     lower(array_to_string(toks[i:i+1], ' ')) AS gram
              FROM t, UNNEST(range(1, len(toks))) AS u(i)
              WHERE len(toks) >= 2),
        c AS (SELECT doc_id, n_tokens, gram, COUNT(*) AS cnt
              FROM b GROUP BY 1, 2, 3),
        r AS (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
              FROM c)
        SELECT doc_id, gram, cnt, CAST(n_tokens AS BIGINT) AS n_tokens,
               (2 * cnt * {scale}) // n_tokens AS share_ppm
        FROM r WHERE rn = 1
    """


def tfidf_top_terms_sql(k: int = 3, idf_scale: int = 1_000_000) -> str:
    """Per-document top-k TF-IDF terms over ``documents`` (matches
    functions.text.tfidf_top_terms): lowercased whitespace tokens,
    integer-scaled idf ``score = tf * ((N * idf_scale) // df)`` — all
    BIGINT arithmetic, so both engines agree bit-for-bit — ties broken on
    ascending term."""
    return f"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(lower(text)), '\\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
        tf AS (SELECT doc_id, u.term AS term, COUNT(*) AS tf
               FROM t, UNNEST(toks) AS u(term) GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
        sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                      tf.tf * (((SELECT n FROM nn) * {idf_scale}) // df.df)
                          AS score
               FROM tf JOIN df USING (term)),
        rk AS (SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
               FROM sc)
        SELECT doc_id, term, tf, df, score, rnk FROM rk WHERE rnk <= {k}
    """


def weighted_pagerank_sql(edges_sql: str, iters: int,
                          damping: float = 0.85,
                          round_to: int = 8) -> str:
    """Unrolled weighted-table PageRank (matches operators.pagerank
    .run_pagerank_weighted_table); ``edges_sql`` yields
    (src, dst, weight) with any join-able vertex type."""
    ctes = [
        f"e AS MATERIALIZED (SELECT src, dst, CAST(weight AS DOUBLE) AS w "
        f"FROM ({edges_sql}) WHERE src <> dst)",
        "ow AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM e GROUP BY 1)",
        "wn AS MATERIALIZED (SELECT e.src, e.dst, e.w / ow.ow AS wn "
        "FROM e JOIN ow ON e.src = ow.src)",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        "hv AS MATERIALIZED (SELECT v.vertex, ow.src IS NOT NULL AS has_out "
        "FROM verts v LEFT JOIN ow ON v.vertex = ow.src)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n "
        "FROM verts)",
        "r0 AS MATERIALIZED (SELECT vertex, 1.0 / (SELECT n FROM nn) "
        "AS rank FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes += [
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) "
            f"AS m FROM r{p} r JOIN hv ON r.vertex = hv.vertex "
            "WHERE NOT hv.has_out)",
            f"m{i} AS MATERIALIZED (SELECT wn.dst AS vertex, "
            f"SUM(wn.wn * r.rank) AS msg FROM wn JOIN r{p} r "
            "ON wn.src = r.vertex GROUP BY 1)",
            f"r{i} AS MATERIALIZED (SELECT v.vertex, "
            f"(1.0 - {damping}) / (SELECT n FROM nn) + {damping} * "
            f"(COALESCE(m.msg, 0.0) + (SELECT m FROM dang{i}) "
            "/ (SELECT n FROM nn)) AS rank "
            f"FROM verts v LEFT JOIN m{i} m ON v.vertex = m.vertex)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vertex, ROUND(rank, {round_to}) AS rank "
            f"FROM r{iters}")


def session_stats_sql(gap_s: int = 1800, round_to: int = 6) -> str:
    """Per-session rollup over ``events`` (matches functions.events
    .session_stats)."""
    return f"""
        WITH o AS (SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                    - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > {gap_s}
                 THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq FROM o)
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))
               - MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS duration_s,
               ROUND(SUM(value), {round_to}) AS value_sum
        FROM s GROUP BY 1, 2
    """


def sample_edges_sql(edges_sql: str, rate_inverse: int,
                     seed: int = 42) -> str:
    """Deterministic md5 edge sample (matches operators.graph
    .sample_edges)."""
    return f"""
        SELECT src, dst FROM ({edges_sql})
        WHERE CAST('0x' || substr(md5(CAST({seed} AS VARCHAR) || '|' ||
              CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR)), 1, 15)
              AS BIGINT) % {rate_inverse} = 0
    """


def wl_refinement_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """Unrolled 1-WL color refinement (matches operators.structure
    .wl_refinement)."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0))",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und "
        "GROUP BY 1)",
        f"l0 AS MATERIALIZED (SELECT v.id, "
        "md5(CAST(COALESCE(deg.deg, 0) AS VARCHAR)) AS lbl "
        f"FROM ({verts_sql}) v LEFT JOIN deg ON v.id = deg.id)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes += [
            f"n{i} AS MATERIALIZED (SELECT u.src AS id, "
            f"string_agg(l.lbl, ',' ORDER BY l.lbl) AS nbrs "
            f"FROM und u JOIN l{p} l ON u.dst = l.id GROUP BY 1)",
            f"l{i} AS MATERIALIZED (SELECT l.id, "
            f"md5(l.lbl || '|' || COALESCE(n.nbrs, '')) AS lbl "
            f"FROM l{p} l LEFT JOIN n{i} n ON l.id = n.id)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, lbl AS wl_label FROM l{rounds}")


def katz_sql(edges_sql: str, verts_sql: str, alpha: float, beta: float,
             iters: int, round_to: int = 8) -> str:
    """Unrolled Katz centrality over the simple directed edge set
    (matches operators.centrality.katz fp-op for fp-op)."""
    ctes = [
        f"verts AS MATERIALIZED ({verts_sql})",
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        f"x0 AS MATERIALIZED (SELECT id, CAST({beta} AS DOUBLE) AS s "
        "FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes += [
            f"m{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(x.s) AS s "
            f"FROM e JOIN x{p} x ON e.src = x.id GROUP BY 1)",
            f"x{i} AS MATERIALIZED (SELECT v.id, {beta} + {alpha} "
            f"* COALESCE(m.s, 0.0) AS s "
            f"FROM verts v LEFT JOIN m{i} m ON v.id = m.id)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, ROUND(s, {round_to}) AS katz FROM x{iters}")


def contamination_sql(n: int, probe_mod: int) -> str:
    """Train/eval contamination twin over ``documents``: docs with
    doc_id % probe_mod == 0 are the benchmark; everyone else reports
    distinct-n-gram overlap (matches functions.text.contamination_overlap
    with the probe built by queries._q_contamination)."""
    return f"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
        g AS (SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, len(toks) - {n - 1} + 1),
                         i -> array_to_string(toks[i:i+{n - 1}], ' ')))
                         AS grams
              FROM t WHERE len(toks) >= {n}),
        probe AS (SELECT DISTINCT unnest(grams) AS ngram FROM g
                  WHERE doc_id % {probe_mod} = 0),
        ex AS (SELECT doc_id, len(grams) AS n_ngrams, unnest(grams) AS ngram
               FROM g WHERE doc_id % {probe_mod} <> 0),
        ov AS (SELECT e.doc_id, e.n_ngrams, COUNT(*) AS n_overlap
               FROM ex e JOIN probe p ON e.ngram = p.ngram GROUP BY 1, 2)
        SELECT doc_id, n_overlap, n_ngrams,
               ROUND(n_overlap::DOUBLE / n_ngrams, 6) AS overlap_frac
        FROM ov
    """


def bloom_contamination_sql(n: int, probe_mod: int, m_bits: int = 1 << 16,
                            k: int = 3, seed: int = 42) -> str:
    """Bloom-screened contamination twin (matches functions.text
    .bloom_contamination with the doc_id % probe_mod benchmark probe):
    same md5 bit positions, same word/bit packing, so every false positive
    reproduces bit-for-bit."""
    return f"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
        g AS (SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, len(toks) - {n - 1} + 1),
                         i -> array_to_string(toks[i:i+{n - 1}], ' ')))
                         AS grams
              FROM t WHERE len(toks) >= {n}),
        ks AS (SELECT UNNEST(range({k})) AS i),
        probe AS (SELECT DISTINCT unnest(grams) AS ngram FROM g
                  WHERE doc_id % {probe_mod} = 0),
        bloom AS (SELECT p // 63 AS word,
                         bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT))
                             AS bits
                  FROM (SELECT CAST('0x' || substr(md5(
                            CAST({seed} AS VARCHAR) || '|'
                            || CAST(ks.i AS VARCHAR) || '|' || p.ngram),
                            1, 15) AS BIGINT) % {m_bits} AS p
                        FROM probe p, ks)
                  GROUP BY 1),
        ex AS (SELECT doc_id, len(grams) AS n_ngrams, unnest(grams) AS ngram
               FROM g WHERE doc_id % {probe_mod} <> 0),
        pr AS (SELECT doc_id, n_ngrams, ngram, p // 63 AS word,
                      CAST(1 AS BIGINT) << CAST(p % 63 AS INT) AS b
               FROM (SELECT doc_id, n_ngrams, ngram,
                            CAST('0x' || substr(md5(
                                CAST({seed} AS VARCHAR) || '|'
                                || CAST(ks.i AS VARCHAR) || '|' || ngram),
                                1, 15) AS BIGINT) % {m_bits} AS p
                     FROM ex, ks)),
        hits AS (SELECT doc_id, n_ngrams, ngram,
                        MIN(CASE WHEN (COALESCE(bits, 0) & b) <> 0
                                 THEN 1 ELSE 0 END) AS all_hit
                 FROM pr LEFT JOIN bloom ON pr.word = bloom.word
                 GROUP BY 1, 2, 3)
        SELECT doc_id, COUNT(*) AS n_overlap,
               CAST(n_ngrams AS BIGINT) AS n_ngrams,
               ROUND(COUNT(*)::DOUBLE / n_ngrams, 6) AS overlap_frac
        FROM hits WHERE all_hit = 1 GROUP BY doc_id, n_ngrams
    """


def eigenvector_sql(edges_sql: str, verts_sql: str, iters: int,
                    round_to: int = 8) -> str:
    """Unrolled eigenvector-centrality power iteration (matches
    operators.centrality.eigenvector_centrality fp-op for fp-op)."""
    ctes = [
        f"verts AS MATERIALIZED ({verts_sql})",
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "x0 AS MATERIALIZED (SELECT id, 1.0 AS s FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes += [
            f"r{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(x.s) AS s "
            f"FROM e JOIN x{p} x ON e.src = x.id GROUP BY 1)",
            f"d{i} AS MATERIALIZED (SELECT v.id, COALESCE(r.s, 0.0) AS s "
            f"FROM verts v LEFT JOIN r{i} r ON v.id = r.id)",
            f"n{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nrm "
            f"FROM d{i})",
            f"x{i} AS MATERIALIZED (SELECT id, CASE WHEN "
            f"(SELECT nrm FROM n{i}) > 0 THEN s / (SELECT nrm FROM n{i}) "
            f"ELSE 0.0 END AS s FROM d{i})",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, ROUND(s, {round_to}) AS eigenvector "
            f"FROM x{iters}")


def coreness_sql(edges_sql: str, verts_sql: str, rounds: int) -> str:
    """Unrolled h-index coreness fixpoint (matches operators.structure
    .coreness); ``rounds`` must cover the measured convergence depth —
    extra rounds are no-ops at the fixpoint."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0))",
        f"verts AS MATERIALIZED ({verts_sql})",
        "c0 AS MATERIALIZED (SELECT v.id, COALESCE(d.c, 0) AS c "
        "FROM verts v LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM und "
        "GROUP BY 1) d ON v.id = d.id)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes += [
            f"h{i} AS MATERIALIZED (SELECT id, MAX(LEAST(rn, cn)) AS h "
            f"FROM (SELECT u.src AS id, c.c AS cn, ROW_NUMBER() OVER "
            f"(PARTITION BY u.src ORDER BY c.c DESC) AS rn "
            f"FROM und u JOIN c{p} c ON u.dst = c.id) GROUP BY 1)",
            f"c{i} AS MATERIALIZED (SELECT c{p}.id, "
            f"LEAST(c{p}.c, COALESCE(h{i}.h, 0)) AS c "
            f"FROM c{p} LEFT JOIN h{i} ON c{p}.id = h{i}.id)",
        ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, c AS coreness FROM c{rounds}")


def multimodal_resize_sql(target_w: int = 8, target_h: int = 8) -> str:
    """Twin of functions.multimodal.resize_images over the derived media
    table's image rows: pixel (y, x) of the resized grid = sha256(text)
    byte ((y*h0//H)*w0 + (x*w0//W)) mod 32 — the stub grid plus the same
    floor nearest-neighbor index mapping; pixel_sum folds them exactly."""
    return f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS h,
                  (doc_id * 13) % 48 + 16 AS w0,
                  (doc_id * 29) % 48 + 16 AS h0
           FROM documents WHERE doc_id % 3 = 0)
SELECT media_id, CAST({target_w} AS BIGINT) AS width,
       CAST({target_h} AS BIGINT) AS height,
       CAST(list_sum(flatten(list_transform(range({target_h}), y ->
           list_transform(range({target_w}), x ->
               CAST('0x' || substr(h,
                   2 * ((((y * h0) // {target_h}) * w0
                         + ((x * w0) // {target_w})) % 32) + 1, 2)
                    AS BIGINT))))) AS BIGINT) AS pixel_sum
FROM m
"""

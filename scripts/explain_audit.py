"""Physical-plan audit: capture .explain("formatted") for the engine's core
plans and assert the properties the 100 TB design depends on.

Checks (each also printed into BENCH/PLANS.md for review):
- parquet scans show PushedFilters / pruned ReadSchema (never read columns
  a query does not touch — e.g. html pruned out of text-only queries);
- the PageRank superstep is partial agg -> exchange -> final agg (map-side
  combine bounds the shuffle at |V| rows per partition, not |E|);
- the persisted weighted-edge table is reused without a per-iteration
  re-exchange (the iteration loop shuffles only the rank table);
- WholeStageCodegen covers the join+agg pipeline (no per-row Python in any
  hot path);
- the nation-graph joins broadcast the small side (BroadcastHashJoin), the
  cs-graph degree join does not silently broadcast a |V|-sized table.

Usage: python scripts/explain_audit.py [sf_dir]  (writes BENCH/PLANS.md,
exits non-zero if an assertion fails).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FAILURES: list[str] = []
SECTIONS: list[tuple[str, str, list[str]]] = []


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def codegen_summary(df) -> str:
    """'Found N WholeStageCodegen subtrees' from codegen mode. AQE wraps the
    un-executed plan in AdaptiveSparkPlan, which reports 0 subtrees — toggle
    it off for the probe (explain replans on every call)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("codegen")
        head = buf.getvalue().splitlines()[:1]
        return head[0] if head else ""
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def audit(title: str, df, must: list[str] = (), must_not: list[str] = ()):
    # codegen probe FIRST: a DataFrame memoizes its QueryExecution on first
    # explain, so the AQE-off probe must create it
    cg = ""
    if "WholeStageCodegen" in must:
        cg = codegen_summary(df)
    plan = formatted(df)
    if cg and not cg.startswith("Found 0"):
        plan += f"\n{cg} -> WholeStageCodegen"
    notes = []
    for pat in must:
        ok = pat in plan
        notes.append(f"{'ok  ' if ok else 'FAIL'} contains {pat!r}")
        if not ok:
            FAILURES.append(f"{title}: missing {pat!r}")
    for pat in must_not:
        ok = pat not in plan
        notes.append(f"{'ok  ' if ok else 'FAIL'} absent   {pat!r}")
        if not ok:
            FAILURES.append(f"{title}: unexpected {pat!r}")
    SECTIONS.append((title, plan, notes))
    print(f"== {title}")
    for n in notes:
        print("  ", n)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from haskellpagerank_spark.operators.graph import out_degrees
    from haskellpagerank_spark.operators.pagerank import weighted_edges
    from haskellpagerank_spark.operators.triangles import triangle_count
    from haskellpagerank_spark.queries import nation_trade_graph
    from haskellpagerank_spark.session import get_spark
    from haskellpagerank_spark.sources.tpch_graph import cs_graph
    from haskellpagerank_spark.functions.text import quality_features

    spark = get_spark(app_name="explain-audit", cores=8, shuffle_partitions=8)

    g = cs_graph(spark, sf_dir)

    # 1. column pruning: degree query must scan only the key columns
    audit(
        "out_degrees(cs) — pruned parquet scan, partial agg",
        out_degrees(g),
        must=["HashAggregate", "ReadSchema"],
        must_not=["o_comment", "o_totalprice", "l_comment"],
    )

    # 2. superstep message agg: partial -> exchange -> final (map-side combine)
    ranks = g.vertices().select("id", F.lit(1.0).alias("rank"))
    ew = weighted_edges(g)
    msgs = (
        ew.join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.col("w") * F.col("rank")).alias("msg"))
    )
    audit(
        "PageRank superstep msgs — join + two-phase agg, codegen",
        msgs,
        must=["HashAggregate", "Exchange", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    # 3. nation graph: small side broadcast in the 4-way key join
    audit(
        "nation_trade_graph — broadcast small dims",
        nation_trade_graph(spark, sf_dir).edges,
        must=["BroadcastHashJoin"],
        must_not=["BatchEvalPython"],
    )

    # 4. triangle count: no python, joins + aggs only
    audit(
        "triangle_count(nation) — catalyst-only",
        triangle_count(nation_trade_graph(spark, sf_dir)),
        must=["HashAggregate"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    # 5. documents quality features: html/binary never scanned, no python
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    audit(
        "quality_features(documents) — codegen string kernels",
        quality_features(docs).select("doc_id", "quality_score"),
        must=["WholeStageCodegen"],
        must_not=["BatchEvalPython"],
    )

    # 6. pagerankPP sub-superstep: per-color filtered join + two-phase agg
    #    (the dcolor filter must prune before the rank join, not after)
    colors = g.vertices().select("id", (F.col("id") % 3 + 1).alias("color"))
    ewc = ew.join(colors.select(F.col("id").alias("dst"),
                                F.col("color").alias("dcolor")), "dst")
    sub = (
        ewc.where(F.col("dcolor") == 1)
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.col("w") * F.col("rank")).alias("msg"))
    )
    audit(
        "pagerankPP sub-superstep — color-filtered join + two-phase agg",
        sub,
        must=["HashAggregate", "Exchange"],
        must_not=["BatchEvalPython"],
    )

    # 6b. prism adj_sets frontier mode: the pre-grouped adjacency join —
    #     one grouped row per frontier vertex, explode AFTER the join (the
    #     prism4 analogue); pure catalyst, explode + two-phase agg
    frontier = ranks.select("id", F.lit(1e-3).alias("delta")).limit(100)
    adj = ew.groupBy("src").agg(
        F.collect_list(F.struct("dst", "w")).alias("nbrs"))
    prism_msgs = (
        adj.join(frontier.withColumnRenamed("id", "src"), "src")
        .select("delta", F.explode("nbrs").alias("nb"))
        .groupBy(F.col("nb.dst").alias("id"))
        .agg(F.sum(F.col("nb.w") * F.col("delta")).alias("dmsg"))
    )
    audit(
        "prism adj_sets msgs — grouped-adjacency join, post-join explode",
        prism_msgs,
        must=["HashAggregate", "Generate"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    # 7. LSH signatures: ONE Arrow kernel; hyperplanes in the closure, so
    #    the plan is O(1) in embedding dim (no plan literals)
    from haskellpagerank_spark.functions.similarity import lsh_signatures
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sig = lsh_signatures(emb, dim=64, bits=12, tables=6)
    audit(
        "lsh_signatures — single MapInPandas kernel, O(1)-in-dim plan",
        sig,
        must=["MapInPandas"],
        must_not=["BatchEvalPython"],
    )
    if len(formatted(sig)) > 50_000:
        FAILURES.append("lsh_signatures: plan text > 50k chars "
                        "(literals leaked back into the plan?)")

    # 8. incremental CC disagreement scan: two label joins over the
    #    undirected edge set + a distinct — joins/aggs only, no python, no
    #    cartesian; this single scan is the whole steady-state maintenance
    #    cost (frontier empty -> zero supersteps)
    labels = g.vertices().select("id", F.col("id").alias("component"))
    und = g.edges.unionAll(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates(["src", "dst"])
    touched = (
        und.join(labels.select(F.col("id").alias("src"),
                               F.col("component").alias("c_src")), "src")
        .join(labels.select(F.col("id").alias("dst"),
                            F.col("component").alias("c_dst")), "dst")
        .where(F.col("c_src") != F.col("c_dst"))
        .select(F.col("src").alias("id"))
        .distinct()
    )
    audit(
        "incremental CC disagreement scan — joins + distinct, catalyst-only",
        touched,
        must=["HashAggregate", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    )

    # 9. composed corpus prep: one plan, untouched columns (lang, source,
    #    n_chars) pruned out of the documents scan, no python
    from haskellpagerank_spark.functions.pipeline import prepare_corpus
    audit(
        "prepare_corpus — composed pipeline, pruned scan, catalyst-only",
        prepare_corpus(docs),
        must=["HashAggregate", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "n_chars"],
    )

    # 10. SCC min-label sweep: edge join + partial->final min agg — the
    #     same bounded-shuffle shape as the PageRank superstep
    lbls = g.vertices().select("id", F.col("id").alias("lbl"))
    scc_msgs = (
        g.edges.join(lbls.withColumnRenamed("id", "src")
                     .withColumnRenamed("lbl", "mlbl"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("mlbl").alias("mlbl"))
    )
    audit(
        "SCC min-label sweep — join + two-phase min agg, catalyst-only",
        scc_msgs,
        must=["HashAggregate", "Exchange", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    # 11. co-citation: fanout-guard semi-join, then a self-equi-join on the
    #     citing key (never a cartesian) + two-phase count agg
    from haskellpagerank_spark.operators.structure import cocitation
    audit(
        "cocitation(nation) — guarded self-equi-join + two-phase agg",
        cocitation(nation_trade_graph(spark, sf_dir)),
        must=["HashAggregate"],
        must_not=["BatchEvalPython", "CartesianProduct"],
    )

    # 12. clustering coefficient: degree-oriented triangle join + degree
    #     agg + |V| left joins — catalyst-only
    from haskellpagerank_spark.operators.structure import (
        clustering_coefficient)
    audit(
        "clustering_coefficient(nation) — triangle numerator, catalyst-only",
        clustering_coefficient(nation_trade_graph(spark, sf_dir)),
        must=["HashAggregate"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    )

    # 13. multi-landmark BFS frontier expansion: equi-join + dedup +
    #     anti-join against the visited set — all shuffles on (lm, id) keys
    frontier = g.vertices().limit(4).select(
        F.col("id").alias("lm"), "id", F.lit(0).cast("long").alias("d"))
    expanded = (
        g.edges.join(frontier.withColumnRenamed("id", "src"), "src")
        .select("lm", F.col("dst").alias("id"))
        .dropDuplicates(["lm", "id"])
        .join(frontier.select("lm", "id"), ["lm", "id"], "left_anti")
    )
    audit(
        "multi-landmark BFS expansion — equi-joins + dedup, catalyst-only",
        expanded,
        must=["HashAggregate"],
        must_not=["BatchEvalPython", "CartesianProduct"],
    )

    # 14. ANF sweep: edge join + two-phase bit_or agg on (id, k) — all
    #     codegen'd integer intrinsics, no python
    from haskellpagerank_spark.operators.anf import fm_sketches
    ng = nation_trade_graph(spark, sf_dir)
    st = fm_sketches(ng, 8, 42)
    anf_sweep = (
        ng.edges.join(st.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"), "k")
        .agg(F.bit_or("s").alias("m"))
    )
    audit(
        "ANF union sweep — bit_or two-phase agg, codegen integer ops",
        anf_sweep,
        must=["HashAggregate", "Exchange"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    # 15. random-walk step: composite-key (src, idx) equi-join — one
    #     adjacency row per walk per step, no expansion over neighbor lists
    from haskellpagerank_spark.operators.walks import (
        _pick_hash, indexed_adjacency)
    adj = indexed_adjacency(ng)
    frontier2 = ng.vertices().select(
        F.col("id").alias("walk_id"), F.col("id").alias("src"))
    step = (
        frontier2
        .join(adj.select("src", "outdeg").dropDuplicates(["src"]), "src")
        .select("walk_id", "src",
                (_pick_hash(42, F.col("walk_id"), 1)
                 % F.col("outdeg")).alias("idx"))
        .join(adj.select("src", "idx", "dst"), ["src", "idx"])
    )
    audit(
        "random-walk step — composite-key equi-join, no neighbor expansion",
        step,
        must=["WholeStageCodegen"],
        must_not=["BatchEvalPython", "CartesianProduct"],
    )

    # 16. Katz / eigenvector gather sweep: one equi-join + two-phase sum
    #     agg per sweep — the same audited shape as the PageRank superstep
    kx = ng.vertices().select("id", F.lit(1.0).alias("score"))
    katz_sweep = (
        ng.edges.where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .join(kx.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("score").alias("msg"))
    )
    audit(
        "Katz/eigenvector gather sweep — join + partial/final sum agg",
        katz_sweep,
        must=["HashAggregate", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "CartesianProduct"],
    )

    # 16b. coreness h-index sweep: equi-join + per-vertex window rank +
    #      agg — codegen'd end to end, one id-keyed shuffle per round
    from pyspark.sql.window import Window as _W
    from haskellpagerank_spark.operators.graph import (
        undirected_simple_edges)
    cund = undirected_simple_edges(ng)
    clab = ng.vertices().select("id", F.lit(1).alias("c"))
    cnbr = (cund.join(clab.select(F.col("id").alias("dst"),
                                  F.col("c").alias("cn")), "dst")
            .select(F.col("src").alias("id"), "cn"))
    # histogram h-index (round 4): the window runs over the per-vertex
    # HISTOGRAM of neighbor c values (groupBy(id, cn) first — map-side
    # combinable, hub rows collapse to <= distinct-c rows), never over raw
    # neighbor rows — the 1e7-degree-hub single-task sort is gone
    chist = cnbr.groupBy("id", "cn").agg(F.count(F.lit(1)).alias("cnt"))
    ch = (chist.withColumn(
            "cum", F.sum("cnt").over(
                _W.partitionBy("id").orderBy(F.col("cn").desc())
                .rowsBetween(_W.unboundedPreceding, _W.currentRow)))
          .groupBy("id")
          .agg(F.max(F.least(F.col("cn"), F.col("cum"))).alias("h")))
    audit(
        "coreness h-index sweep — histogram agg BEFORE window (hub-safe)",
        ch,
        must=["HashAggregate", "WholeStageCodegen", "Window"],
        must_not=["BatchEvalPython", "CartesianProduct"],
    )

    # 17. contamination check: the probe set broadcasts; the corpus side
    #     reads only (doc_id, text) and never exchanges before the join
    from haskellpagerank_spark.functions.text import contamination_overlap
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toksc = F.split(F.trim(F.col("text")), r"\s+")
    probe_grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(toksc) - 2),
        lambda i: F.array_join(F.slice(toksc, i, 3), " ")))
    probe = (docs.where(F.col("doc_id") % 37 == 0)
             .where(F.length(F.trim(F.col("text"))) > 0)
             .where(F.size(toksc) >= 3)
             .select(F.explode(probe_grams).alias("ngram")).distinct())
    audit(
        "contamination overlap — broadcast probe join, pruned corpus scan",
        contamination_overlap(docs.where(F.col("doc_id") % 37 != 0), probe,
                              n=3),
        must=["BroadcastHashJoin", "ReadSchema: struct<doc_id:bigint,"
              "text:string>"],
        must_not=["BatchEvalPython", "SortMergeJoin"],
    )

    # 18. near-dup clustering: the LSH pair graph fans into the min-label
    #     frontier loop — audit one frontier sweep over a pair-shaped edge
    #     set: candidate labels pushed from the changed side only, two-phase
    #     min agg, no Python anywhere
    pairs = (docs.select(F.col("doc_id").alias("src"))
             .withColumn("dst", F.col("src") + 1))
    plab = pairs.select(F.col("src").alias("id")).distinct() \
        .withColumn("component", F.col("id"))
    psweep = (
        pairs.join(plab.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("component").alias("cand"))
    )
    audit(
        "neardup_clusters frontier sweep — min-label push, two-phase agg",
        psweep,
        must=["HashAggregate", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "CartesianProduct"],
    )

    # 19. streaming near-dup candidate join (the foreachBatch batch plan):
    #     band keys join band keys — an 8-byte-key equi-join, never an
    #     all-pairs product; signatures stay out of the shuffled key set
    from haskellpagerank_spark.functions.dedup import (band_keys,
                                                       minhash_signatures)
    bsigs = minhash_signatures(docs.limit(500), "text", "doc_id", 3, 64,
                               "xxhash64")
    bk = band_keys(bsigs, 64, 16, "xxhash64")
    cand = (bk.alias("x").join(bk.alias("y"), ["band", "key"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")))
    audit(
        "streaming near-dup candidates — band-key equi-join, no all-pairs",
        cand,
        must=["WholeStageCodegen"],
        must_not=["BatchEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # 20. image resize kernel: Arrow-batched mapInPandas over a pruned
    #     (media_id, payload, dims) projection — the one legitimate Python
    #     hop (stub decode + vectorized index mapping), never row-at-a-time
    from haskellpagerank_spark.functions.multimodal import resize_images
    media = docs.limit(100).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        ((F.col("doc_id") * 13) % 48 + 16).cast("int").alias("width"),
        ((F.col("doc_id") * 29) % 48 + 16).cast("int").alias("height"))
    audit(
        "multimodal resize — single Arrow-batched MapInPandas, no per-row "
        "Python",
        resize_images(media, 8, 8),
        must=["MapInPandas"],
        must_not=["BatchEvalPython"],
    )

    # 21. URL-canonical crawl dedup: regex/array canonicalization entirely
    #     inside codegen, then a two-phase agg keyed on the canonical URL
    #     (the exact distinct count adds the standard second exchange) —
    #     no Python, no joins, nothing wide in the shuffle
    from haskellpagerank_spark.functions.urls import (dedup_crawl,
                                                      synthetic_crawl)
    audit(
        "url_dedup_crawl — codegen canonicalization + canonical-key agg",
        dedup_crawl(synthetic_crawl(spark, n_pages=2000, snapshots=3)),
        must=["HashAggregate", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # 22. star CC round: one large-star + small-star pair. Both stars are a
    #     map-side-combinable groupBy-min (partial_min -> exchange -> min)
    #     plus a shuffle join co-partitioned on the same key — no cartesian
    #     products, no Python, hub rows never serialize into one task.
    from haskellpagerank_spark.operators.components_star import (
        _large_star, _small_star)
    audit(
        "star CC round — partial-agg min + co-partitioned join per star",
        _small_star(_large_star(g.edges)),
        must=["HashAggregate", "partial_min"],
        must_not=["BatchEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # 23. power-law exponent MLE: degree agg + scalar agg, both two-phase
    #     (map-side combined), ln/division in codegen — no Python, no sort
    from haskellpagerank_spark.operators.structure import powerlaw_alpha
    audit(
        "power-law alpha MLE — two-phase degree + scalar aggs, codegen only",
        powerlaw_alpha(g),
        must=["HashAggregate", "partial_count", "WholeStageCodegen"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "Sort"],
    )

    # 23b. trussness round body: two (src, dst)-keyed incidence equi-joins
    #      + the SAME hub-safe histogram-window h-index as coreness, on
    #      edge keys — hash aggs + codegen, no Python, no cartesian
    from haskellpagerank_spark.operators.graph import (
        undirected_simple_edges as _use)
    tcanon = _use(ng).where(F.col("src") < F.col("dst"))
    tlab = tcanon.withColumn("t", F.lit(1))
    tinc = tcanon.select(
        "src", "dst", F.col("src").alias("o1s"), F.col("dst").alias("o1d"),
        F.col("src").alias("o2s"), F.col("dst").alias("o2d"))
    tm = (tinc.join(tlab.select(F.col("src").alias("o1s"),
                                F.col("dst").alias("o1d"),
                                F.col("t").alias("t1")), ["o1s", "o1d"])
          .join(tlab.select(F.col("src").alias("o2s"),
                            F.col("dst").alias("o2d"),
                            F.col("t").alias("t2")), ["o2s", "o2d"])
          .select("src", "dst", F.least("t1", "t2").alias("m")))
    thist = tm.groupBy("src", "dst", "m").agg(F.count(F.lit(1)).alias("cnt"))
    th = (thist.withColumn(
            "cum", F.sum("cnt").over(
                _W.partitionBy("src", "dst").orderBy(F.col("m").desc())
                .rowsBetween(_W.unboundedPreceding, _W.currentRow)))
          .groupBy("src", "dst")
          .agg(F.max(F.least(F.col("m"), F.col("cum"))).alias("h")))
    audit(
        "trussness round — edge-keyed histogram h-index (coreness shape)",
        th,
        must=["HashAggregate", "WholeStageCodegen", "Window"],
        must_not=["BatchEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # 24. maximal-matching round body: incidence union -> two-phase struct
    #     min per vertex, then two equi-joins back to the active edges.
    #     min over a STRUCT (lexicographic (pri, src, dst)) is not
    #     hash-aggregable in Spark, so the planner picks SortAggregate —
    #     the assertion checks partial_min + Exchange instead: map-side
    #     combine is still present, so the shuffle is bounded at |V| rows
    #     (not 2|E|); the per-partition sort is CPU over the active
    #     incidence, which shrinks geometrically per round. The staged
    #     all-scalar alternative (hash min(pri), join, struct tie-break on
    #     the pri-minimal subset) would add a full extra 2|E| join +
    #     shuffle per round to save that sort — shuffle volume dominates
    #     at scale, so one SortAggregate pass is the right plan.
    inc = g.edges.where(F.col("src") < F.col("dst")).withColumn(
        "key", F.struct(F.xxhash64("src", "dst").alias("pri"), "src", "dst"))
    both = inc.select(F.col("src").alias("vid"), "key").unionAll(
        inc.select(F.col("dst").alias("vid"), "key"))
    best = both.groupBy("vid").agg(F.min("key").alias("bkey"))
    winners = (
        inc.join(best.withColumnRenamed("vid", "src"), "src")
        .where(F.col("key") == F.col("bkey")).drop("bkey")
        .join(best.withColumnRenamed("vid", "dst"), "dst")
        .where(F.col("key") == F.col("bkey"))
        .select("src", "dst")
    )
    audit(
        "maximal-matching round — two-phase struct-min + equi-joins",
        winners,
        must=["partial_min", "Exchange"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # ---- round-5 additions ------------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # tfidf: map-side-combined (doc_id, term) count; the 1-row N scalar
    # rides a broadcast nested loop (1 row — constant cost by construction)
    from haskellpagerank_spark.functions.text import (
        bloom_contamination, ngram_counts, tfidf_top_terms, top_bigram_share)
    audit(
        "tfidf_top_terms — one scan, partial agg, bounded window",
        tfidf_top_terms(docs, k=3),
        must=["HashAggregate", "Exchange", "Window"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    )
    audit(
        "top_bigram_share — partial agg + per-doc top-1 window",
        top_bigram_share(docs),
        must=["HashAggregate", "Window"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # shard packing: bucket offsets broadcast back, windows per bucket only
    from haskellpagerank_spark.functions.pipeline import pack_token_shards
    audit(
        "pack_token_shards — broadcast bucket offsets, per-bucket window",
        pack_token_shards(docs, budget=512),
        must=["BroadcastHashJoin", "Window"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # sorted-neighborhood: broadcast rank offsets, band equi-joins only
    # (the rank Window is not visible here: the function eagerly
    # localCheckpoints the ranked relation, truncating the plan — the
    # window shape is asserted by pack_token_shards above, which shares
    # the identical two-phase scheme)
    from haskellpagerank_spark.functions.dedup import sorted_neighborhood_pairs
    audit(
        "sorted_neighborhood_pairs — band equi-joins over checkpointed rank",
        sorted_neighborhood_pairs(docs, threshold=0.5, window=4),
        must=["BroadcastHashJoin", "Exchange"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                  "BroadcastNestedLoopJoin"],
    )

    # FM distinct sketch: register bit_or is map-side combined
    from haskellpagerank_spark.functions.sketches import approx_distinct
    audit(
        "approx_distinct — map-side-combined register bit_or",
        approx_distinct(docs, ["lang"], "doc_id"),
        must=["partial_bit_or", "Exchange"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    # bloom contamination: the bloom side joins as a broadcast hash join
    # (the k-row lane table is a legitimate 3-row BNL)
    probe = ngram_counts(docs.where("doc_id % 37 = 0"), n=3,
                         min_count=1).select("ngram")
    audit(
        "bloom_contamination — broadcast bloom-word hash join",
        bloom_contamination(docs.where("doc_id % 37 <> 0"), probe, n=3),
        must=["BroadcastHashJoin", "HashAggregate"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    )

    # transitivity / rich-club: joins + aggs; rich-club's single-partition
    # window runs over the distinct-degree axis only (documented small step)
    from haskellpagerank_spark.operators.structure import (
        rich_club, transitivity)
    audit(
        "transitivity(nation) — catalyst-only 3T/W",
        transitivity(nation_trade_graph(spark, sf_dir)),
        must=["HashAggregate"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )
    audit(
        "rich_club(cs) — histogram merge + axis window",
        rich_club(cs_graph(spark, sf_dir)),
        must=["HashAggregate", "Window"],
        must_not=["BatchEvalPython", "ArrowEvalPython"],
    )

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write("# Physical-plan audit (`scripts/explain_audit.py`)\n\n"
                f"Scale-factor dir: `{sf_dir}`. Each section: the assertion "
                "list, then the full `.explain(\"formatted\")` output.\n")
        for title, plan, notes in SECTIONS:
            f.write(f"\n## {title}\n\n")
            for n in notes:
                f.write(f"- `{n}`\n")
            f.write("\n```\n" + plan.strip() + "\n```\n")
    print(f"\nwrote BENCH/PLANS.md; {len(FAILURES)} failures")
    for x in FAILURES:
        print("FAIL", x)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())

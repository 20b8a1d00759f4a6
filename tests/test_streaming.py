"""Structured-Streaming ingestion: exactly-once file ingest, byte parity
with batch extraction, watermark windowing."""

import os

import pyspark.sql.functions as F
import pytest

from haskellpagerank_spark.sources.pages import extract_links, generate_pages
from haskellpagerank_spark.streaming.ingest import (
    ingest_pages_to_edges, stream_edge_lists, windowed_event_counts)


def test_stream_ingest_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "pages_in")
    edges_dir = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir)

    pages = generate_pages(spark, num_pages=120, seed=42, avg_links=4)
    # two crawl micro-batches as separate files
    b1 = pages.where(F.col("url") < "https://site0001")
    b2 = pages.subtract(b1)
    b1.coalesce(1).write.mode("append").parquet(in_dir)

    q = ingest_pages_to_edges(spark, in_dir, edges_dir, ck)
    q.awaitTermination(120)
    n1 = spark.read.parquet(edges_dir).count()
    assert n1 == extract_links(b1).count()

    b2.coalesce(1).write.mode("append").parquet(in_dir)
    q = ingest_pages_to_edges(spark, in_dir, edges_dir, ck)
    q.awaitTermination(120)
    streamed = spark.read.parquet(edges_dir)
    batch = extract_links(pages)
    assert streamed.count() == batch.count()         # exactly-once, no dupes
    assert streamed.exceptAll(batch).count() == 0    # byte parity


def test_stream_edge_lists(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("0 1\n1 2\n2 2\n")
    edges = stream_edge_lists(spark, str(d))
    assert edges.isStreaming
    out = str(tmp_path / "out")
    q = (edges.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.src, r.dst) for r in spark.read.parquet(out).collect()}
    assert rows == {(0, 1), (1, 2)}  # self-loop dropped


def test_windowed_event_counts_batch_semantics(spark):
    """The windowing logic is testable in batch mode (same expression)."""
    ev = spark.createDataFrame(
        [(1, "2025-01-01 00:10:00", 1, "click", 1.0),
         (2, "2025-01-01 00:50:00", 1, "click", 2.0),
         (3, "2025-01-01 01:10:00", 2, "view", 3.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = windowed_event_counts(ev, window="1 hour").toPandas()
    clicks = out[out.event_type == "click"]
    assert len(clicks) == 1 and clicks.iloc[0].n_events == 2
    assert clicks.iloc[0].total_value == 3.0


def test_maintain_ranks_over_ingested_batches(spark, tmp_path):
    """Stream two edge-list batches into the sink; warm-started maintenance
    after batch 2 matches a cold full recompute exactly (same fixpoint) in
    fewer sweeps."""
    import numpy as np
    from haskellpagerank_spark.operators.graph import from_edge_df
    from haskellpagerank_spark.operators.pagerank import PageRankConfig
    from haskellpagerank_spark.operators.pagerank_csr import run_pagerank_spmv
    from haskellpagerank_spark.streaming.ingest import (maintain_ranks,
                                                        stream_edge_lists)
    src_dir, sink, ck = (str(tmp_path / d) for d in ("in", "edges", "ck"))
    import os
    os.makedirs(src_dir)
    cfg = PageRankConfig(damping=0.85, tol=1e-10, tol_norm="l1",
                         sink_mode="redistribute", max_iters=300)

    def ingest():
        q = (stream_edge_lists(spark, src_dir)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    n = 22
    # batch 1: a 20-spoke hub plus return edges — a far-from-uniform
    # fixpoint; batch 2 perturbs it with two edges, so the previous state
    # is a much closer start than uniform
    with open(f"{src_dir}/b1.txt", "w") as f:
        f.write("".join(f"{i} 0\n" for i in range(1, 21)) + "0 1\n0 2\n")
    ingest()
    r1 = maintain_ranks(spark, sink, num_vertices=n, cfg=cfg)
    with open(f"{src_dir}/b2.txt", "w") as f:
        f.write("21 0\n0 3\n")
    ingest()
    warm = maintain_ranks(spark, sink, num_vertices=n, prev_ranks=r1.ranks,
                          cfg=cfg)
    edges = spark.read.parquet(sink)
    cold = run_pagerank_spmv(from_edge_df(edges, num_vertices=n), cfg)
    w = warm.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    c = cold.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(w, c, atol=1e-9)
    assert warm.iterations < cold.iterations


def test_maintain_ranks_prism_over_ingested_batches(spark, tmp_path):
    """Prism-mode maintenance: stream two edge batches; the warm run after
    batch 2 re-derives sums once, drains a small frontier, and lands on
    the exact cold fixpoint of the updated graph — across a simulated
    restart (state rebuilt purely from the parquet sink + prev ranks)."""
    import numpy as np
    from haskellpagerank_spark.operators.pagerank import PageRankConfig
    from haskellpagerank_spark.streaming.ingest import (maintain_ranks_prism,
                                                        stream_edge_lists)
    src_dir, sink, ck = (str(tmp_path / d) for d in ("pin", "pedges", "pck"))
    os.makedirs(src_dir)
    cfg = PageRankConfig(damping=0.85, tol=1e-10, sink_mode="reflect",
                         max_iters=300)

    def ingest():
        q = (stream_edge_lists(spark, src_dir)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    n = 22
    with open(f"{src_dir}/b1.txt", "w") as f:
        f.write("".join(f"{i} 0\n" for i in range(1, 21)) + "0 1\n0 2\n")
    ingest()
    r1 = maintain_ranks_prism(spark, sink, num_vertices=n, cfg=cfg)
    # simulate a driver restart: only the sink + the persisted rank table
    # survive (materialize prev ranks through a parquet round-trip)
    prev_path = str(tmp_path / "prev_ranks")
    r1.ranks.write.mode("overwrite").parquet(prev_path)
    prev = spark.read.parquet(prev_path)
    with open(f"{src_dir}/b2.txt", "w") as f:
        f.write("21 0\n0 3\n")
    ingest()
    warm = maintain_ranks_prism(spark, sink, num_vertices=n,
                                prev_ranks=prev, cfg=cfg)
    cold = maintain_ranks_prism(spark, sink, num_vertices=n, cfg=cfg)
    w = warm.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    c = cold.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(w, c, atol=1e-9)
    assert warm.iterations < cold.iterations


def test_dedup_doc_stream_across_batches(spark, tmp_path):
    """Cross-batch exact dedup: a text re-delivered in a later micro-batch
    is dropped by the checkpointed dedup state; first arrival wins."""
    from haskellpagerank_spark.streaming.ingest import dedup_doc_stream
    in_dir, out, ck = (str(tmp_path / d) for d in ("docs_in", "out", "ck3"))
    os.makedirs(in_dir)
    schema = "doc_id long, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (dedup_doc_stream(stream)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], schema)
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 2  # in-batch dup of "alpha text" dropped
    assert {r.text for r in got.collect()} == {"alpha text", "beta text"}

    # batch 2 re-delivers both texts (new ids) plus one genuinely new doc
    b2 = spark.createDataFrame(
        [(4, "alpha text"), (5, "beta text"), (6, "gamma text")], schema)
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 3  # only gamma survived batch 2
    assert {r.text for r in got.collect()} == {
        "alpha text", "beta text", "gamma text"}


def test_neardup_filter_stream_across_batches(spark, tmp_path):
    """Cross-batch near-dup filtering: a boilerplate-shifted copy of an
    already-accepted doc is dropped in a later micro-batch via the MinHash
    signature store; genuinely new docs survive."""
    from haskellpagerank_spark.streaming.ingest import neardup_filter_stream
    in_dir, out, state, ck = (str(tmp_path / d)
                              for d in ("nd_in", "nd_out", "nd_state", "ck"))
    os.makedirs(in_dir)
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(2, 32))       # ~0.87 Jaccard
    other = " ".join(f"z{i}" for i in range(25))
    other_near = " ".join(f"z{i}" for i in range(1, 26))

    def drain():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = neardup_filter_stream(stream, state, out, threshold=0.5,
                                  checkpoint_dir=ck)
        q.awaitTermination(120)

    b1 = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], schema)
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    got = spark.read.parquet(out)
    assert {r.doc_id for r in got.collect()} == {0, 2}  # in-batch near-dup dropped

    # batch 2: near-dup of batch-1 docs (cross-batch, via the store) + new
    b2 = spark.createDataFrame(
        [(3, other_near), (4, "completely different text entirely")], schema)
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    got = spark.read.parquet(out)
    assert {r.doc_id for r in got.collect()} == {0, 2, 4}


def test_neardup_filter_stream_replay_idempotent(spark, tmp_path):
    """foreachBatch replay safety: re-running a batch whose state write
    already landed (crash after the state write, before the checkpoint
    commit) must NOT classify the batch as duplicates of itself. The
    signature-store read filters to strictly-earlier batch partitions, so
    the replayed batch's own batch=N signatures are invisible to it."""
    import shutil
    from haskellpagerank_spark.streaming.ingest import neardup_filter_stream
    in_dir, out, state, ck = (str(tmp_path / d)
                              for d in ("rp_in", "rp_out", "rp_state", "ck"))
    os.makedirs(in_dir)
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(25))

    def drain():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = neardup_filter_stream(stream, state, out, threshold=0.5,
                                  checkpoint_dir=ck)
        q.awaitTermination(120)

    b1 = spark.createDataFrame([(0, base), (1, other)], schema)
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {0, 1}

    # Simulate the replay: the state write for batch 0 is on disk, but the
    # checkpoint commit is lost — Spark re-delivers the same input as
    # batch 0 again. Before the strictly-earlier-batch filter, every doc
    # band-matched its own stored signature (est. Jaccard 1.0) and the
    # replay overwrote out/batch=0 with ZERO survivors.
    shutil.rmtree(ck)
    drain()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {0, 1}


def test_neardup_store_compaction_50_batches(spark, tmp_path):
    """VERDICT r4 #4: drive >=50 micro-batches (maxFilesPerTrigger=1, one
    file per batch) through the near-dup filter with compaction on. The
    signature store must fold into O(compact_every + compact_files) files
    instead of one hive partition per batch forever, dedup semantics must
    be unchanged, and a full checkpoint-loss replay over the compacted
    store must stay idempotent (the per-row batch high-watermark column
    keeps the strictly-earlier guard exact)."""
    import shutil
    from haskellpagerank_spark.streaming.ingest import (
        _store_deltas, _store_segments, neardup_filter_stream)
    in_dir, out, state, ck = (str(tmp_path / d)
                              for d in ("c_in", "c_out", "c_state", "ck"))
    os.makedirs(in_dir)
    schema = "doc_id long, text string"
    n_batches = 50
    n_unique = 0
    for b in range(n_batches):
        if b % 5 == 0:  # rotating near-dup family (pairwise Jaccard ~0.8)
            text = " ".join(f"w{i}" for i in range(b % 3, 30 + b % 3))
        else:  # unique doc
            text = " ".join(f"u{b}x{i}" for i in range(25))
            n_unique += 1
        # one part file per doc, appended flat into in_dir: with
        # maxFilesPerTrigger=1 the file source turns each into its own
        # micro-batch (file->batch order is the source's timestamp order,
        # so assertions below are order-robust)
        spark.createDataFrame([(b, text)], schema) \
            .coalesce(1).write.mode("append").parquet(in_dir)

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
        q = neardup_filter_stream(stream, state, out, threshold=0.5,
                                  checkpoint_dir=ck, compact_every=8,
                                  compact_files=2)
        q.awaitTermination(600)

    def survivors():
        rows = spark.read.parquet(out).collect()
        fam = {r.doc_id for r in rows if r.text.startswith("w")}
        uniq = {r.doc_id for r in rows if not r.text.startswith("w")}
        return fam, uniq

    drain()
    fam, uniq = survivors()
    assert len(fam) == 1         # exactly one of the near-dup family
    assert len(uniq) == n_unique  # every unique doc survived
    segments = _store_segments(spark, state)
    # size-tiered: a handful of disjoint segments, not one per fold and
    # not the quadratic single-segment rewrite
    assert 1 <= len(segments) <= 4
    for (lo_a, hi_a, _), (lo_b, hi_b, _) in zip(segments, segments[1:]):
        assert hi_a < lo_b   # disjoint, ascending coverage
    deltas = _store_deltas(spark, state)
    assert all(j > segments[-1][1] for j in deltas)
    assert len(deltas) < 8       # folded: not one partition per batch
    # full replay over the compacted store: identical survivors (the
    # compacted segment's batch column hides future batches from each
    # replayed one)
    shutil.rmtree(ck)
    drain()
    assert survivors() == (fam, uniq)


def test_sig_store_legacy_layout_migration(spark, tmp_path):
    """Regression: pre-compaction stores wrote signature partitions at
    state_dir/batch=<id> directly. The compacting layout reads only
    delta/ and compacted/ — without migration an upgraded deployment
    silently loses all prior dedup state. The legacy partitions must be
    moved (metadata-only rename) into delta/ on first listing and then
    count as strictly-earlier state."""
    import os as _os
    from haskellpagerank_spark.streaming.ingest import (_read_sig_store,
                                                        _store_deltas)
    state = str(tmp_path / "legacy_state")
    sig_schema = "id long, sig array<long>"
    for b in (0, 1):
        spark.createDataFrame([(100 + b, [1, 2, 3, 4])], sig_schema) \
            .write.parquet(f"{state}/batch={b}")
    # a delta/ copy of batch 1 already exists (replay straddled the
    # upgrade): the delta copy is authoritative, legacy copy dropped
    spark.createDataFrame([(101, [1, 2, 3, 4])], sig_schema) \
        .write.parquet(f"{state}/delta/batch=1")

    assert _store_deltas(spark, state) == [0, 1]
    assert not _os.path.exists(f"{state}/batch=0")
    assert not _os.path.exists(f"{state}/batch=1")
    store = _read_sig_store(spark, state, batch_id=2)
    assert {r.id for r in store.collect()} == {100, 101}
    # strictly-earlier guard still applies to migrated partitions
    assert {r.id for r in _read_sig_store(spark, state, 1).collect()} \
        == {100}


def test_sig_store_compaction_equivalence_randomized(spark, tmp_path):
    """Property (randomized schedules, deterministic seeds): whatever the
    interleaving of delta writes and compaction passes — and whatever
    compact_every / compact_files — _read_sig_store(b) returns EXACTLY the
    union of batches strictly earlier than b. The LSM tiering, range
    naming, stale-delta self-healing, and watermark filtering must never
    lose, duplicate, or leak a signature row."""
    import random
    from haskellpagerank_spark.streaming.ingest import (_maybe_compact_store,
                                                        _read_sig_store)

    sig_schema = "id long, sig array<long>"
    for seed in (7, 23):
        rng = random.Random(seed)
        state = str(tmp_path / f"eq_state_{seed}")
        n_batches = rng.randint(9, 13)
        rows_of = {}          # batch -> set of doc ids
        next_id = 1000 * seed
        for b in range(n_batches):
            ids = list(range(next_id, next_id + rng.randint(1, 3)))
            next_id += len(ids)
            rows_of[b] = set(ids)
            spark.createDataFrame([(i, [i, i + 1]) for i in ids],
                                  sig_schema) \
                .write.parquet(f"{state}/delta/batch={b}")
            if rng.random() < 0.4:
                _maybe_compact_store(spark, state,
                                     compact_every=rng.randint(2, 4),
                                     compact_files=rng.randint(1, 2))
        # one final fold so compacted segments definitely participate
        _maybe_compact_store(spark, state, compact_every=1,
                             compact_files=2)
        for probe in range(n_batches + 1):
            got = sorted(r.id for r in
                         (_read_sig_store(spark, state, probe)
                          or spark.createDataFrame([], sig_schema))
                         .collect())
            want = sorted(i for b in range(probe) for i in rows_of[b])
            assert got == want, (seed, probe)


def test_sig_store_covered_segment_recovery(spark, tmp_path):
    """Crash-recovery invariants of the segment listing: a segment whose
    batch range is covered by a newer one (its cleanup was lost to a
    crash) must be hidden from reads, an incomplete segment (no _SUCCESS)
    must be invisible, and the next compaction pass must delete both the
    covered segment and any stale (already-folded) deltas."""
    import os as _os
    from haskellpagerank_spark.streaming.ingest import (_maybe_compact_store,
                                                        _read_sig_store,
                                                        _store_segments)
    state = str(tmp_path / "crash_state")
    sig = "id long, sig array<long>, batch long"

    def seg(name, rows):
        spark.createDataFrame(rows, sig).write.parquet(
            f"{state}/compacted/{name}")

    # v=0-3 was absorbed into v=0-5 but the crash skipped its deletion;
    # the absorbed copy even disagrees (id 99) — reads must not see it
    seg("v=0-3", [(99, [9, 9], 3)])
    seg("v=0-5", [(1, [1, 2], 3), (2, [3, 4], 5)])
    # an incomplete fold (crash before _SUCCESS): must be invisible
    seg("v=0-9", [(3, [5, 6], 9)])
    _os.remove(f"{state}/compacted/v=0-9/_SUCCESS")
    # a stale delta at batch 4 (<= watermark 5, already folded)
    spark.createDataFrame([(1, [1, 2])], "id long, sig array<long>") \
        .write.parquet(f"{state}/delta/batch=4")

    assert [(s[0], s[1]) for s in _store_segments(spark, state)] == [(0, 5)]
    assert {r.id for r in _read_sig_store(spark, state, 100).collect()} \
        == {1, 2}
    # watermark guard applies per-row inside the segment
    assert {r.id for r in _read_sig_store(spark, state, 4).collect()} == {1}

    # ANY later pass self-heals, even a non-folding one: stale delta,
    # covered segment, and the incomplete fold attempt all swept
    _maybe_compact_store(spark, state, compact_every=99, compact_files=2)
    assert not _os.path.exists(f"{state}/delta/batch=4")
    names = set(_os.listdir(f"{state}/compacted"))
    assert "v=0-3" not in names and "v=0-9" not in names
    assert names == {"v=0-5"}
    # and the store still reads + folds correctly afterwards
    spark.createDataFrame([(5, [7, 8])], "id long, sig array<long>") \
        .write.parquet(f"{state}/delta/batch=6")
    _maybe_compact_store(spark, state, compact_every=1, compact_files=2)
    assert {r.id for r in _read_sig_store(spark, state, 100).collect()} \
        == {1, 2, 5}

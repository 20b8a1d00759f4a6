"""Structured-Streaming ingestion for the link-graph pipeline.

The reference is purely batch-iterative (SURVEY.md §2.9) — this module is
north-rule-adjacent scope: a production crawl lands page batches
continuously, and the engine must fold them into the edge table without
full recomputes. Three pieces:

- ``stream_pages`` / ``ingest_pages_to_edges``: file-source stream of pages
  parquet -> vectorized href extraction (the same Arrow kernel as batch,
  sources/pages.extract_links) -> append-only raw-edges parquet sink with
  exactly-once file-source checkpointing. ``Trigger.AvailableNow`` drains
  the backlog and stops, which is also how the tests drive it
  deterministically.
- ``stream_edge_lists``: reference-style text edge lists as a stream.
- ``windowed_event_counts``: watermark + tumbling-window aggregation over
  the ``events`` table shape (late data handled by the watermark) — the
  standard stateful-agg pattern.

After each ingested batch, recomputing ranks is a *batch* concern:
run_pagerank_incremental (operators/prism.py) seeded with the previous
converged state is the intended delta path — new edges activate their
endpoints' frontiers instead of restarting from uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.pages import PAGES_SCHEMA, extract_links


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of pages parquet batches (one file per crawl
    micro-batch)."""
    return spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)


def ingest_pages_to_edges(spark: SparkSession, input_dir: str,
                          edges_dir: str, checkpoint_dir: str,
                          available_now: bool = True) -> StreamingQuery:
    """pages stream -> href extraction -> append raw_edges parquet.

    Exactly-once per input file via the file-source + checkpoint contract;
    the extraction kernel is the identical Arrow-batched one used in batch
    mode, so streamed and batch-extracted edges are byte-identical.
    """
    raw = extract_links(stream_pages(spark, input_dir))
    writer = (
        raw.writeStream.format("parquet")
        .option("path", edges_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_edge_lists(spark: SparkSession, input_dir: str) -> DataFrame:
    """Reference-style ``src dst`` text lines as a streaming edge source
    (readEdgeArray's format, EdgeArray.hs:145-152)."""
    raw = spark.readStream.text(input_dir)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return raw.where(F.length(F.trim(F.col("value"))) > 0).select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))


def maintain_ranks(spark: SparkSession, edges_dir: str, num_vertices: int,
                   prev_ranks: DataFrame | None = None, cfg=None):
    """Batch-of-batches rank maintenance over a streamed (src, dst) sink.

    After each ingested micro-batch (``stream_edge_lists`` appends encoded
    pairs to ``edges_dir``; the pages path feeds it after dictionary
    encoding), recompute PageRank over the full edge table *warm-started*
    from the previous converged state —
    power iteration converges from any start vector, so the result is the
    exact fixpoint of the updated graph, reached in a fraction of the
    sweeps a cold start needs (tests assert both properties).
    """
    from ..operators.graph import from_edge_df
    from ..operators.pagerank_csr import run_pagerank_auto
    edges = spark.read.parquet(edges_dir)
    g = from_edge_df(edges, num_vertices=num_vertices)
    return run_pagerank_auto(g, cfg, init_ranks=prev_ranks)


def dedup_doc_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exactly-once *cross-batch* exact dedup of a streaming documents
    source: the first arrival of each text wins; re-deliveries in the same
    or any later micro-batch are dropped.

    State is Spark's streaming-dedup store keyed on md5(text) — 16 bytes
    per distinct document ever seen, partitioned across the state store's
    shuffle partitions and checkpointed with the query. This is the
    streaming half of functions/pipeline.dedup_exact: a continuous crawl
    dedups at ingest so the batch pipeline never re-shuffles known text.
    """
    return (docs.withColumn("_text_hash", F.md5(F.col(text_col)))
            .dropDuplicates(["_text_hash"])
            .drop("_text_hash"))


def maintain_components(spark: SparkSession, edges_dir: str,
                        num_vertices: int,
                        prev_labels: DataFrame | None = None,
                        max_iters: int = 200):
    """Component maintenance over a streamed (src, dst) sink — the CC
    analogue of ``maintain_ranks``. Cold start (no ``prev_labels``) runs
    the auto-tiered CC; with previous converged labels it runs the
    incremental operator, whose disagreement scan seeds the frontier with
    only the endpoints the new batch actually disturbed (edge additions
    only — the append sink never deletes)."""
    from ..operators.components import (connected_components_auto,
                                        connected_components_incremental)
    from ..operators.graph import from_edge_df
    g = from_edge_df(spark.read.parquet(edges_dir),
                     num_vertices=num_vertices)
    if prev_labels is None:
        return connected_components_auto(g)
    return connected_components_incremental(g, prev_labels,
                                            max_iters=max_iters)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark over the
    events shape (event_id, ts, user_id, event_type, value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )

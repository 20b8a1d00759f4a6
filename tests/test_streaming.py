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

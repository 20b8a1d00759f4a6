"""Custom stateful streaming operator (applyInPandasWithState):
continuous degree tracking across micro-batches, hub flagging."""

import pyspark.sql.functions as F

from haskellpagerank_spark.streaming.ingest import stream_edge_lists
from haskellpagerank_spark.streaming.stateful import (latest_degrees,
                                                      running_degrees)


def _drain(spark, src_dir, log_dir, ck_dir):
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(log_dir)

    q = (running_degrees(stream_edge_lists(spark, src_dir), hub_threshold=3)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck_dir)
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_running_degrees_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    log, ck = str(tmp_path / "log"), str(tmp_path / "ck")
    # batch 1: vertex 0 has in-degree 2 (not yet a hub at threshold 3)
    (src / "b1.txt").write_text("1 0\n2 0\n0 3\n")
    _drain(spark, str(src), log, ck)
    state = {r.id: r for r in
             latest_degrees(spark.read.parquet(log)).collect()}
    assert (state[0].out_deg, state[0].in_deg) == (1, 2)
    assert not state[0].is_hub

    # batch 2: two more edges into 0 -> crosses threshold; state carries
    # over the checkpointed (out_deg, in_deg) pair between micro-batches —
    # the new file is the only input processed (exactly-once), so the
    # totals prove the state store restored batch 1's counts
    (src / "b2.txt").write_text("3 0\n4 0\n")
    _drain(spark, str(src), log, ck)
    state = {r.id: r for r in
             latest_degrees(spark.read.parquet(log)).collect()}
    assert (state[0].out_deg, state[0].in_deg) == (1, 4)
    assert state[0].is_hub
    assert state[1].out_deg == 1 and state[1].in_deg == 0
    assert not state[3].is_hub

    # the collapsed update log agrees with a batch recount of all edges
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (0, 3), (3, 0), (4, 0)], "src long, dst long")
    truth = (edges.select(F.col("src").alias("id"))
             .groupBy("id").count()
             .withColumnRenamed("count", "out_deg"))
    for r in truth.collect():
        assert state[r.id].out_deg == r.out_deg


def test_streamed_hub_ids_feed_spmv_salting(spark, tmp_path):
    """The tracked hub list replaces the batch skew probe: run_pagerank_spmv
    with known_hub_ids (forcing the hub to be salted) matches the default
    probe path exactly — salting is physical-only."""
    import numpy as np

    from haskellpagerank_spark.operators.graph import from_edge_df
    from haskellpagerank_spark.operators.pagerank import PageRankConfig
    from haskellpagerank_spark.operators.pagerank_csr import run_pagerank_spmv
    from haskellpagerank_spark.streaming.stateful import hub_ids

    src = tmp_path / "in2"
    src.mkdir()
    lines = [f"{i} 0" for i in range(1, 20)] + ["0 1", "0 2"]
    (src / "b1.txt").write_text("\n".join(lines) + "\n")
    log, ck = str(tmp_path / "log2"), str(tmp_path / "ck2")
    _drain(spark, str(src), log, ck)
    hubs = hub_ids(spark.read.parquet(log))
    assert hubs == [0]  # in-degree 19 >= threshold 3

    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in (ln.split() for ln in lines)],
        "src long, dst long")
    g = from_edge_df(edges, num_vertices=20)
    cfg = PageRankConfig(damping=0.85, num_iters=5, sink_mode="redistribute")
    salted = run_pagerank_spmv(g, cfg, known_hub_ids=hubs)
    probed = run_pagerank_spmv(g, cfg)
    s = salted.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    p = probed.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    # salting reshapes the partial-sum tree, so allow the last few ulps
    np.testing.assert_allclose(s, p, rtol=0, atol=1e-14)

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

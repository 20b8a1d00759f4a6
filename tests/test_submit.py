"""End-to-end `spark-submit --py-files` smoke test — the production
invocation shape the north rule names ("run via spark-submit --py-files on
multi-executor clusters"). Packages the engine into a zip, launches a FRESH
JVM through scripts/submit.sh on a bundled reference graph, and checks the
job's rank output against the in-process engine result under the identical
CLI config.

One extra JVM start (~40s); marked `submit` so `-m 'not submit'` can skip
it while iterating.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGE_FILE = "/root/reference/executables/input/doubleSquareEA.txt"


@pytest.mark.submit
@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    out = str(tmp_path / "ranks")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    proc = subprocess.run(
        ["bash", "scripts/submit.sh", "--master", "local[4]", "--",
         "--file", EDGE_FILE, "--method", "pagerankS",
         "--num-iters", "5", "--output", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the job prints a one-line JSON summary (run_job.py)
    summary = None
    for line in proc.stdout.splitlines():
        if line.startswith("{") and '"method"' in line:
            summary = json.loads(line)
    assert summary is not None, proc.stdout[-4000:]
    assert summary["method"] == "pagerankS"
    assert summary["iterations"] == 5
    assert summary["n_edges"] > 0

    # cross-check the written parquet against the same engine in-process
    # under the CLI's exact config (damping 0.15, init 1/n, auto strategy)
    from haskellpagerank_spark.operators.graph import read_edge_list
    from haskellpagerank_spark.operators.pagerank import PageRankConfig
    from haskellpagerank_spark.operators.pagerank_csr import (
        run_pagerank_auto,
    )

    got = {r["id"]: r["rank"] for r in spark.read.parquet(out).collect()}
    g = read_edge_list(spark, EDGE_FILE)
    cfg = PageRankConfig(damping=0.15, num_iters=5, sink_mode="reflect",
                         init_value=1.0 / max(g.num_vertices, 1))
    want_df = run_pagerank_auto(g, cfg).ranks
    want = {r["id"]: r["rank"] for r in want_df.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert summary["rank_sum"] == pytest.approx(sum(want.values()), rel=1e-9)

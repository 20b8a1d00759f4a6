#!/usr/bin/env python
"""Negative-control measurement for the SCC sweep budget (VERDICT r4 #3).

A directed N-cycle is the adversarial input for the distributed SCC tier:
one SCC, diameter N, trim peels nothing, so the FW min-label pass needs N
sweeps. This script measures (a) seconds/sweep of the distributed tier on
a 2M-vertex cycle under a tiny budget (the RuntimeError exit is the
point), extrapolating to full convergence, and (b) the COST tier's wall on
the same graph. Output: JSON rows for BENCH/crossover.json.

Run serialized on an idle box: `python scripts/scc_cycle_bench.py [N]`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from haskellpagerank_spark.operators.graph import Graph  # noqa: E402
from haskellpagerank_spark.operators.structure import (  # noqa: E402
    strongly_connected_components, strongly_connected_components_local)
from haskellpagerank_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(app_name="scc-cycle-bench", cores=cores,
                      shuffle_partitions=cores)
    edges = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n).alias("dst")).persist()
    edges.count()
    g = Graph(edges=edges, num_vertices=n)

    rows = []
    t0 = time.monotonic()
    err = None
    try:
        strongly_connected_components(g, max_sweeps=budget)
    except RuntimeError as exc:
        err = str(exc).splitlines()[0]
    wall = time.monotonic() - t0
    s_per_sweep = wall / budget
    rows.append({
        "cores": cores, "strategy": "join", "algo": "scc",
        "graph": "cycle", "n_vertices": n, "n_edges": n,
        "sweeps_run": budget, "wall_s": round(wall, 3),
        "s_per_sweep": round(s_per_sweep, 3),
        "extrapolated_to_fixpoint_days": round(
            s_per_sweep * n * 2 / 86400, 1),
        "raised": err,
        "note": "sweep-budget negative control: diameter-N cycle needs N "
                "FW + N BW sweeps; the budget turns an O(diameter) "
                "runaway into a fast descriptive RuntimeError",
    })

    t0 = time.monotonic()
    res = strongly_connected_components_local(g)
    n_sccs = res.df.select("scc").distinct().count()
    wall_local = time.monotonic() - t0
    rows.append({
        "cores": cores, "strategy": "local", "algo": "scc",
        "graph": "cycle", "n_vertices": n, "n_edges": n,
        "wall_s": round(wall_local, 3), "n_sccs": n_sccs,
        "note": "COST tier on the same graph: diameter-independent (the "
                "min-label kernel hits its sweep budget and restarts as "
                "linear-time iterative Kosaraju)",
    })
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()

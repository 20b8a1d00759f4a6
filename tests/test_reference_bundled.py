"""Parity on the reference's own bundled input files (executables/input/).

The inline fixtures (fixtures.py) replicate the small graphs; these tests
read the *actual files* — tab- and space-separated, up to 200k edges
(rmatTest.txt, the reference benchmark's largest bundled workload,
MainBench.hs:151-155) — through the engine's parser and match the NumPy
oracle per-vertex, reference semantics (d=0.15, amendSinks, 5 sweeps =
defaultNumberOfIterations, MainBench.hs:26-27).
"""

import numpy as np
import pytest

from haskellpagerank_spark import oracle as O
from haskellpagerank_spark.operators.graph import read_edge_list
from haskellpagerank_spark.operators.pagerank import reference_config
from haskellpagerank_spark.operators.pagerank_csr import run_pagerank_spmv

INPUT = "/root/reference/executables/input"


def _file_pairs(path):
    out = []
    with open(path) as fh:
        for line in fh:
            p = line.split()
            if len(p) == 2:
                out.append((int(p[0]), int(p[1])))
    return out


@pytest.mark.parametrize("name", [
    "doubleSquareEA.txt",          # space-separated
    "doubleSquareReversedEA.txt",
    "twoNodesEA.txt",
    "500nodes4color.txt",
    "rmatTest3.txt",               # tab-separated, 50k edges
    "rmatTest.txt",                # tab-separated, 200k edges
])
def test_bundled_graph_pagerank_matches_oracle(spark, name):
    path = f"{INPUT}/{name}"
    src, dst, n = O.parse_edges(_file_pairs(path))
    asrc, adst = O.amend_sinks(src, dst, n)
    want = O.pagerank_jacobi(asrc, adst, n, damping=0.15,
                             init=1.0 / n, num_iters=5)
    g = read_edge_list(spark, path)
    assert g.num_vertices == n  # dense 0..maxID contract through the parser
    res = run_pagerank_spmv(
        g, reference_config(init_value=1.0 / n, num_iters=5))
    pdf = res.ranks.toPandas().sort_values("id")
    np.testing.assert_allclose(pdf["rank"].to_numpy(), np.asarray(want),
                               atol=1e-9)
    # reference test-suite invariant: rank sum ~ 1 (TestPageRank.hs:30-33)
    assert abs(pdf["rank"].sum() - 1.0) < 0.01

"""Golden fixture graphs from the reference test suite.

Edge lists verbatim from /root/reference:
- pagerank/Test/PageRankGraphs.hs:9-86
- graphcoloring/Test/ColoringGraphs.hs:9-96
- internalutil/Test/Graphs.hs

Vertex-id space is dense ``0..max(id)`` (parser contract,
internalutil/Test/Data/Graph/TestGraphParser.hs:26-31); self-loops are
dropped at parse time (EdgeArray.hs:73,84-85) but are kept here verbatim so
the loader's self-loop filter is itself under test.
"""

from __future__ import annotations

FIXTURE_EDGES: dict[str, list[tuple[int, int]]] = {
    "singleEdge": [(0, 1)],
    "simpleGraphOneNodeMissing": [(1, 2)],
    "doubleSquare": [
        (0, 1), (0, 2), (1, 3), (2, 3), (0, 4), (1, 5),
        (2, 6), (3, 7), (4, 5), (4, 6), (5, 7), (6, 7),
    ],
    "doubleSquareReversed": [
        (1, 0), (2, 0), (3, 1), (3, 2), (4, 0), (5, 1),
        (6, 2), (7, 3), (5, 4), (6, 4), (7, 5), (7, 6),
    ],
    "square": [(0, 1), (1, 2), (2, 3), (0, 3)],
    "hub": [(0, 1), (0, 2), (0, 3)],
    "complete": [(i, j) for i in range(5) for j in range(5) if i < j],
    "myFavorite": [
        (0, 1), (0, 3), (1, 2), (1, 3), (2, 3), (2, 5), (2, 4), (3, 4), (4, 5),
    ],
    "princeton": [(0, 1), (0, 2), (2, 0), (1, 2), (3, 2)],
    "sinkAndSource": [(0, 1), (1, 2)],
    "bigNumbers": [(4, 5), (5, 6), (6, 7), (4, 7)],
    "edgeToSelf": [(0, 0), (1, 2)],
}

# Graphs the PageRank suites run on (pagerank/Test/TestMain.hs:17-30).
PAGERANK_FIXTURES = [
    "singleEdge", "simpleGraphOneNodeMissing", "doubleSquare",
    "doubleSquareReversed", "square", "hub", "complete", "myFavorite",
    "princeton",
]

# Exact greedy-coloring goldens (TestGraphColoring.hs:75-101). Speculative
# (nonDet) coloring converges to the same vectors (TestGraphColoringNonDet.hs).
GREEDY_COLORING_GOLDEN: dict[str, list[int]] = {
    "singleEdge": [1, 2],
    "square": [1, 2, 1, 2],
    "doubleSquare": [1, 2, 2, 1, 2, 1, 1, 2],
    "doubleSquareReversed": [1, 2, 2, 1, 2, 1, 1, 2],
    "hub": [1, 2, 2, 2],
    "complete": [1, 2, 3, 4, 5],
    "myFavorite": [1, 2, 1, 3, 2, 3],
}

# Jones-Plassmann goldens given explicit priority vectors
# (TestGraphColoring.hs:43-73). Tie-break: equal priority -> lower id is the
# predecessor (GraphColoring.hs:293-296).
JP_GOLDEN: list[tuple[str, list[int], list[int]]] = [
    ("simpleGraphOneNodeMissing", [1, 2, 3], [1, 1, 2]),
    ("simpleGraphOneNodeMissing", [1, 0, 2], [1, 1, 2]),
    ("square", [1, 2, 3, 4], [1, 2, 1, 2]),
    ("square", [1, 1, 1, 1], [1, 2, 1, 2]),
    ("doubleSquare", [1, 2, 3, 4, 5, 6, 7, 8], [1, 2, 2, 1, 2, 1, 1, 2]),
    ("doubleSquare", [8, 7, 6, 5, 4, 3, 2, 1], [2, 1, 1, 2, 1, 2, 2, 1]),
    ("doubleSquare", [3, 1, 1, 3, 5, 1, 5, 6], [2, 1, 1, 2, 1, 2, 2, 1]),
    ("doubleSquare", [1, 1, 1, 1, 1, 1, 1, 1], [1, 2, 2, 1, 2, 1, 1, 2]),
]

# Distance-2 coloring goldens on the merged (undirected) graph
# (TestGraphColoring2Dist.hs).
DIST2_GOLDEN: dict[str, list[int]] = {
    "square": [1, 2, 3, 4],
    "doubleSquare": [1, 2, 3, 4, 4, 3, 2, 1],
    "hub": [1, 2, 3, 4],
    "complete": [1, 2, 3, 4, 5],
    "myFavorite": [1, 2, 3, 4, 5, 1],
    "singleEdge": [1, 2],
}


def fixture_text(name: str, sep: str = " ") -> str:
    """Render a fixture as reference edge-list text (one 'src dst' per line)."""
    return "\n".join(f"{s}{sep}{d}" for s, d in FIXTURE_EDGES[name]) + "\n"

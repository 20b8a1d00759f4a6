"""Graphviz DOT sink for colored graphs.

Re-expresses the reference's visualization sink (colorGraph,
internalutil/Graphviz/GraphColoring.hs:96-108: colored graph -> DOT text at
dist/graphviz.dot). Cosmetic/driver-side by design — meant for fixture-scale
graphs; refuses anything large rather than silently collecting a web graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PALETTE = [
    "white", "lightblue", "lightgreen", "lightsalmon", "plum", "khaki",
    "lightcyan", "lightpink", "wheat", "lavender", "palegreen",
]

MAX_RENDER_VERTICES = 10_000


def to_dot(edges: DataFrame, colors: DataFrame | None = None,
           directed: bool = True) -> str:
    """Render an edge DataFrame (+ optional (id, color)) as DOT text."""
    n = colors.count() if colors is not None else 0
    ne = edges.count()
    if max(n, ne) > MAX_RENDER_VERTICES:
        raise ValueError(
            f"refusing to render {max(n, ne)} elements to DOT "
            f"(limit {MAX_RENDER_VERTICES}); sample or filter first")
    kind, arrow = ("digraph", "->") if directed else ("graph", "--")
    lines = [f"{kind} g {{"]
    if colors is not None:
        for row in colors.orderBy("id").collect():
            fill = _PALETTE[int(row["color"]) % len(_PALETTE)]
            lines.append(
                f'  {row["id"]} [style=filled fillcolor={fill} '
                f'label="{row["id"]}:{row["color"]}"];')
    for row in edges.orderBy("src", "dst").collect():
        lines.append(f'  {row["src"]} {arrow} {row["dst"]};')
    lines.append("}")
    return "\n".join(lines) + "\n"


def write_dot(path: str, edges: DataFrame,
              colors: DataFrame | None = None, directed: bool = True) -> None:
    with open(path, "w") as fh:
        fh.write(to_dot(edges, colors, directed))

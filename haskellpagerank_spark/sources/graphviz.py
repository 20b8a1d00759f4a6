"""Graphviz DOT sink + pure-NumPy PNG renderer for colored graphs.

Re-expresses the reference's visualization sinks: colorGraph
(internalutil/Graphviz/GraphColoring.hs:96-108: colored graph -> DOT text
at dist/graphviz.dot) and makeImage.sh:5-9 (dot -Tpng > dist/graph.png).
The sandbox has no graphviz binary, so `render_png` rasterizes the same
colored graph directly — deterministic circular layout, line edges,
palette-filled node discs — and encodes it with the engine's own stdlib
PNG codec (`functions/png.py`), closing the image-sink parity row without
external tools. Cosmetic/driver-side by design — meant for fixture-scale
graphs; refuses anything large rather than silently collecting a web graph.
"""

from __future__ import annotations

import numpy as np
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


# X11/graphviz RGB values for _PALETTE, so the PNG fill matches what
# `dot -Tpng` would paint for the same DOT fillcolor names
_PALETTE_RGB = {
    "white": (255, 255, 255), "lightblue": (173, 216, 230),
    "lightgreen": (144, 238, 144), "lightsalmon": (255, 160, 122),
    "plum": (221, 160, 221), "khaki": (240, 230, 140),
    "lightcyan": (224, 255, 255), "lightpink": (255, 182, 193),
    "wheat": (245, 222, 179), "lavender": (230, 230, 250),
    "palegreen": (152, 251, 152),
}
_EDGE_RGB = (96, 96, 96)
_HEAD_RGB = (0, 0, 0)          # darker final segment marks edge direction
_RING_RGB = (0, 0, 0)


def _layout_circle(ids: list[int], size: int,
                   radius: int) -> dict[int, tuple[int, int]]:
    """Deterministic circular layout: sorted vertex ids evenly spaced on a
    circle, first vertex at angle 0 (east), proceeding counter-clockwise in
    image coordinates."""
    n = len(ids)
    c = size / 2.0
    r = c - radius - 2
    pos = {}
    for i, v in enumerate(sorted(ids)):
        theta = 2.0 * np.pi * i / max(n, 1)
        pos[v] = (int(round(c + r * np.cos(theta))),
                  int(round(c - r * np.sin(theta))))
    return pos


def _draw_line(canvas: np.ndarray, p0: tuple[int, int], p1: tuple[int, int],
               rgb: tuple[int, int, int], head_rgb=None) -> None:
    """Sampled line segment (one sample per pixel of the longer axis).
    With head_rgb, the last 20% nearest p1 is drawn in that color — a
    deterministic direction marker replacing graphviz's arrowhead."""
    steps = max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)
    t = np.linspace(0.0, 1.0, steps + 1)
    xs = np.rint(p0[0] + (p1[0] - p0[0]) * t).astype(int)
    ys = np.rint(p0[1] + (p1[1] - p0[1]) * t).astype(int)
    body = t < 0.8 if head_rgb is not None else np.ones_like(t, dtype=bool)
    canvas[ys[body], xs[body]] = rgb
    if head_rgb is not None:
        canvas[ys[~body], xs[~body]] = head_rgb


def _draw_disc(canvas: np.ndarray, center: tuple[int, int], radius: int,
               fill: tuple[int, int, int], ring: tuple[int, int, int]) -> None:
    cx, cy = center
    y, x = np.ogrid[-radius - 1:radius + 2, -radius - 1:radius + 2]
    d2 = x * x + y * y
    patch = canvas[cy - radius - 1:cy + radius + 2,
                   cx - radius - 1:cx + radius + 2]
    patch[d2 <= radius * radius] = fill
    patch[(d2 <= radius * radius) & (d2 > (radius - 1) * (radius - 1))] = ring


def render_png(edges: DataFrame, colors: DataFrame | None = None,
               directed: bool = True, size: int = 480,
               node_radius: int = 9) -> bytes:
    """Rasterize the colored graph to PNG bytes — the `makeImage.sh`
    counterpart (`dot -Tpng`), self-contained: circular layout, gray edge
    lines (black 20%-tail direction marker when directed), nodes as
    palette-filled discs with a black ring, encoded via the engine's
    stdlib PNG codec. Node fills use the same palette-by-color-mod rule
    as `to_dot`, so the DOT and PNG sinks agree on coloring."""
    erows = edges.orderBy("src", "dst").collect()
    crows = (colors.orderBy("id").collect()
             if colors is not None else [])
    ids = ({int(r["id"]) for r in crows}
           | {int(r["src"]) for r in erows}
           | {int(r["dst"]) for r in erows})
    if max(len(ids), len(erows)) > MAX_RENDER_VERTICES:
        raise ValueError(
            f"refusing to render {max(len(ids), len(erows))} elements "
            f"(limit {MAX_RENDER_VERTICES}); sample or filter first")
    if size < 8 * node_radius:
        raise ValueError("size too small for the node radius")
    canvas = np.full((size, size, 3), 255, dtype=np.uint8)
    pos = _layout_circle(list(ids), size, node_radius)
    for r in erows:
        s, d = int(r["src"]), int(r["dst"])
        if s == d:
            continue  # self-loops are filtered upstream; skip defensively
        _draw_line(canvas, pos[s], pos[d], _EDGE_RGB,
                   _HEAD_RGB if directed else None)
    color_of = {int(r["id"]): int(r["color"]) for r in crows}
    for v in sorted(ids):
        name = _PALETTE[color_of.get(v, 0) % len(_PALETTE)]
        _draw_disc(canvas, pos[v], node_radius, _PALETTE_RGB[name],
                   _RING_RGB)
    from ..functions.png import encode_png
    return encode_png(canvas)


def write_png(path: str, edges: DataFrame,
              colors: DataFrame | None = None, directed: bool = True,
              size: int = 480, node_radius: int = 9) -> None:
    with open(path, "wb") as fh:
        fh.write(render_png(edges, colors, directed, size, node_radius))

"""Pixel-square dissolve — exact, shapely-free ``unary_union``.

The reference unions pixel squares per elevation band with shapely
(reference ``server/api/elevation_query_area_union.py:53-57``).  Our
inputs are axis-aligned unit squares on the shared integer pixel grid,
so the union is exact combinatorics, not floating-point geometry:

1. every pixel side not shared with another pixel of the set is a
   boundary edge, directed so the interior is on its LEFT;
2. directed edges stitch into closed loops (at pinch vertices the
   left-most turn keeps loops simple);
3. loop orientation (shoelace sign) separates outer shells (CCW, +)
   from holes (CW, −); holes attach to the smallest enclosing shell.

Edge-connected pixel regions become one polygon; corner-touching
regions become separate polygons (GEOS's union yields a MultiPolygon
there as well).
"""

from __future__ import annotations

import numpy as np


def _trace_loops(edges: set[tuple[int, int, int, int]]):
    """Stitch directed edges (x1, y1, x2, y2) into closed loops."""
    out_map: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for x1, y1, x2, y2 in edges:
        out_map.setdefault((x1, y1), []).append((x2, y2))
    loops = []
    remaining = set(edges)
    while remaining:
        e = next(iter(remaining))
        start = (e[0], e[1])
        loop = [start]
        cur = start
        prev_dir = None
        while True:
            outs = [o for o in out_map.get(cur, []) if (cur[0], cur[1], o[0], o[1]) in remaining]
            if not outs:
                break
            if prev_dir is None or len(outs) == 1:
                nxt = outs[0]
            else:
                # left-most turn relative to incoming direction keeps the
                # loop on one region at corner-touch (pinch) vertices
                def turn(o):
                    dx, dy = o[0] - cur[0], o[1] - cur[1]
                    return prev_dir[0] * dy - prev_dir[1] * dx
                nxt = max(outs, key=turn)
            remaining.discard((cur[0], cur[1], nxt[0], nxt[1]))
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            if nxt == start:
                break
            loop.append(nxt)
            cur = nxt
        loops.append(loop)
    return loops


def _signed_area2(loop) -> int:
    """Twice the shoelace signed area (integer-exact)."""
    s = 0
    n = len(loop)
    for i in range(n):
        x1, y1 = loop[i]
        x2, y2 = loop[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _point_in_loop(px: float, py: float, loop) -> bool:
    inside = False
    n = len(loop)
    for i in range(n):
        x1, y1 = loop[i]
        x2, y2 = loop[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
            if px < xint:
                inside = not inside
    return inside


def dissolve_pixels(gx: np.ndarray, gy: np.ndarray):
    """Union of unit squares at integer grid cells (gx, gy).

    Returns a list of polygons; each polygon is a list of rings
    (first = outer shell CCW, rest = holes CW); each ring is a list of
    integer (x, y) grid-corner vertices, closed (first == last).
    """
    cells = set(zip(map(int, gx), map(int, gy)))
    edges: set[tuple[int, int, int, int]] = set()
    for x, y in cells:
        if (x, y - 1) not in cells:
            edges.add((x, y, x + 1, y))           # top, interior below-left
        if (x + 1, y) not in cells:
            edges.add((x + 1, y, x + 1, y + 1))   # right
        if (x, y + 1) not in cells:
            edges.add((x + 1, y + 1, x, y + 1))   # bottom
        if (x - 1, y) not in cells:
            edges.add((x, y + 1, x, y))           # left
    loops = _trace_loops(edges)
    shells = [(lp, _signed_area2(lp)) for lp in loops if _signed_area2(lp) > 0]
    holes = [(lp, _signed_area2(lp)) for lp in loops if _signed_area2(lp) < 0]

    polys = [{"shell": lp, "area2": a, "holes": []} for lp, a in shells]
    for hl, _ in holes:
        # attach to the smallest shell containing the hole's first vertex
        hx, hy = hl[0]
        candidates = [
            p for p in polys if _point_in_loop(hx + 1e-9, hy + 1e-9, p["shell"])
            or _point_in_loop(hx - 1e-9, hy + 1e-9, p["shell"])
        ]
        if candidates:
            min(candidates, key=lambda p: p["area2"])["holes"].append(hl)

    out = []
    for p in polys:
        rings = [p["shell"] + [p["shell"][0]]]
        for h in p["holes"]:
            rings.append(h + [h[0]])
        out.append(rings)
    return out


def dissolve_area_px(polys) -> float:
    """Total area (in pixel units) of a dissolve result — for tests."""
    total = 0.0
    for rings in polys:
        for i, ring in enumerate(rings):
            a = _signed_area2(ring[:-1]) / 2.0
            total += a
    return total

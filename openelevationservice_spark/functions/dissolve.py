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


# Directed boundary-edge types, in STORED grid coordinates (y grows
# downward): R = (1,0), D = (0,1), L = (-1,0), U = (0,-1).  Each
# boundary edge keeps the pixel set's interior on its left under the
# max-cross-product turn rule below.
_DXY = ((1, 0), (0, 1), (-1, 0), (0, -1))
# tail-vertex offset of each edge type relative to its cell (cx, cy):
# top side → tail (cx, cy) dir R; right side → (cx+1, cy) dir D;
# bottom side → (cx+1, cy+1) dir L; left side → (cx, cy+1) dir U.
_TAIL_OFF = ((0, 0), (1, 0), (1, 1), (0, 1))
# successor-direction preference per incoming direction: the candidate
# maximizing cross(prev, cand) = prev_dx*c_dy - prev_dy*c_dx, then
# straight, then the opposite turn (a same-segment reverse edge cannot
# exist, so one of the three always does):
#   R → [D, R, U]; D → [L, D, R]; L → [U, L, D]; U → [R, U, L]
_PREF = ((1, 0, 3), (2, 1, 0), (3, 2, 1), (0, 3, 2))


def _trace_loops_fast(gx: np.ndarray, gy: np.ndarray):
    """Boundary loops of the pixel set, as (loops, areas2).

    Fully-vectorized successor construction: every directed boundary
    edge has exactly ONE successor under the turn rule (a pure function
    of the 2×2 cell occupancy at its head vertex), so the edge set
    decomposes into the cycles of a permutation — computed here as
    numpy id-grid gathers, with only the final cycle walk as a plain
    list chase (~0.1 µs/edge vs ~1.5 µs/edge for the former
    dict/set-of-tuples tracer, which was 65 % of the bench suite's
    dominant query).

    Returns ``loops`` (list of vertex lists, tails only, not closed,
    GLOBAL grid coords) and ``areas2`` (twice the shoelace area per
    loop, integer-exact) — the area falls out of the walk for free:
    a unit step contributes x1*y2 − x2*y1 = {R: −y, D: +x, L: +y,
    U: −x} of its tail, and the per-loop sum is translation-invariant,
    so the per-edge contributions are precomputed vectorized.
    """
    g, x0, y0 = _dense_grid(gx, gy)
    h, w = g.shape
    p = np.pad(g, 1)
    inner = p[1:-1, 1:-1]
    masks = (
        inner & ~p[:-2, 1:-1],   # top    → dir R
        inner & ~p[1:-1, 2:],    # right  → dir D
        inner & ~p[2:, 1:-1],    # bottom → dir L
        inner & ~p[1:-1, :-2],   # left   → dir U
    )
    txs, tys, counts = [], [], []
    for d in range(4):
        yy, xx = np.nonzero(masks[d])
        ox, oy = _TAIL_OFF[d]
        txs.append(xx + ox)
        tys.append(yy + oy)
        counts.append(len(xx))
    n = int(sum(counts))
    if n == 0:
        return [], []
    # one id grid per direction over the (h+1) x (w+1) vertex lattice:
    # (tail vertex, dir) identifies an edge uniquely
    idg = np.full((4, h + 1, w + 1), -1, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    tx = np.empty(n, dtype=np.int64)
    ty = np.empty(n, dtype=np.int64)
    dirs = np.empty(n, dtype=np.int64)
    contrib = np.empty(n, dtype=np.int64)
    for d in range(4):
        s, e = offs[d], offs[d + 1]
        tx[s:e] = txs[d]
        ty[s:e] = tys[d]
        dirs[s:e] = d
        idg[d, tys[d], txs[d]] = np.arange(s, e)
    contrib[dirs == 0] = -ty[dirs == 0]
    contrib[dirs == 1] = tx[dirs == 1]
    contrib[dirs == 2] = ty[dirs == 2]
    contrib[dirs == 3] = -tx[dirs == 3]
    dx = np.array([o[0] for o in _DXY])[dirs]
    dy = np.array([o[1] for o in _DXY])[dirs]
    hx = tx + dx
    hy = ty + dy
    pref = np.array(_PREF, dtype=np.int64)[dirs]          # (n, 3)
    e1 = idg[pref[:, 0], hy, hx]
    e2 = idg[pref[:, 1], hy, hx]
    e3 = idg[pref[:, 2], hy, hx]
    succ = np.where(e1 >= 0, e1, np.where(e2 >= 0, e2, e3)).tolist()
    gxl = (tx + x0).tolist()
    gyl = (ty + y0).tolist()
    cl = contrib.tolist()
    visited = bytearray(n)
    loops, areas = [], []
    for s in range(n):
        if visited[s]:
            continue
        loop = []
        a = 0
        cur = s
        while not visited[cur]:
            visited[cur] = 1
            loop.append((gxl[cur], gyl[cur]))
            a += cl[cur]
            cur = succ[cur]
        loops.append(loop)
        areas.append(a)
    return loops, areas


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


def _dense_grid(gx: np.ndarray, gy: np.ndarray):
    """Boolean occupancy grid over the cell bbox + its origin."""
    x0 = int(gx.min())
    y0 = int(gy.min())
    g = np.zeros((int(gy.max()) - y0 + 1, int(gx.max()) - x0 + 1), dtype=bool)
    g[gy - y0, gx - x0] = True
    return g, x0, y0


def dissolve_pixels_rings(gx: np.ndarray, gy: np.ndarray):
    """Union of unit squares at integer grid cells (gx, gy), with areas.

    Returns ``(polys, areas2)``: ``polys`` is a list of polygons, each a
    list of rings (first = outer shell CCW, rest = holes CW), each ring
    a list of integer (x, y) grid-corner vertices, closed (first ==
    last); ``areas2`` mirrors the structure with twice the shoelace
    signed area of every ring (shell +, hole −) — already computed by
    the tracer, so callers never re-walk ring vertices for areas.
    """
    loops, la = _trace_loops_fast(np.asarray(gx), np.asarray(gy))
    shells = [(lp, a) for lp, a in zip(loops, la) if a > 0]
    holes = [(lp, a) for lp, a in zip(loops, la) if a < 0]

    polys = [{"shell": lp, "area2": a, "holes": []} for lp, a in shells]
    for hl, ha in holes:
        # attach to the smallest shell containing the hole's first vertex
        hx, hy = hl[0]
        candidates = [
            p for p in polys if _point_in_loop(hx + 1e-9, hy + 1e-9, p["shell"])
            or _point_in_loop(hx - 1e-9, hy + 1e-9, p["shell"])
        ]
        if candidates:
            min(candidates, key=lambda p: p["area2"])["holes"].append((hl, ha))

    out, out_areas = [], []
    for p in polys:
        rings = [p["shell"] + [p["shell"][0]]]
        areas = [p["area2"]]
        for h, ha in p["holes"]:
            rings.append(h + [h[0]])
            areas.append(ha)
        out.append(rings)
        out_areas.append(areas)
    return out, out_areas


def dissolve_pixels(gx: np.ndarray, gy: np.ndarray):
    """Union of unit squares at integer grid cells (gx, gy).

    Returns a list of polygons; each polygon is a list of rings
    (first = outer shell CCW, rest = holes CW); each ring is a list of
    integer (x, y) grid-corner vertices, closed (first == last).
    """
    return dissolve_pixels_rings(gx, gy)[0]


def _n_components(g: np.ndarray, conn: int) -> int:
    """Connected components of a boolean grid (conn ∈ {4, 8}) — adjacency
    pairs extracted with numpy shifts, merged with union-find.  Python
    touches only the O(#adjacencies) pair list, never the full grid.

    Scale note: band groups are bounded by a single polygon's pixel
    count (the operator shards by (poly_id, height_base)); the 100 TB
    path keeps per-group labeling local exactly because of that bound.
    """
    n = int(g.sum())
    if n == 0:
        return 0
    idx = np.full(g.shape, -1, dtype=np.int64)
    idx[g] = np.arange(n)
    parent = np.arange(n)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    shifts = [((slice(None), slice(None, -1)), (slice(None), slice(1, None))),
              ((slice(None, -1), slice(None)), (slice(1, None), slice(None)))]
    if conn == 8:
        shifts += [((slice(None, -1), slice(None, -1)), (slice(1, None), slice(1, None))),
                   ((slice(None, -1), slice(1, None)), (slice(1, None), slice(None, -1)))]
    for sa, sb in shifts:
        m = g[sa] & g[sb]
        for a, b in zip(idx[sa][m].tolist(), idx[sb][m].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    return len({find(a) for a in range(n)})


def label_counts(gx: np.ndarray, gy: np.ndarray) -> tuple[int, int, int, int]:
    """(C4, C8, H4, H8) for the cell set: foreground components under 4-
    and 8-connectivity, and background holes under 4- and 8-connectivity
    (bounded background components inside a 1-cell-padded bbox, minus
    the single outer component).

    These are the Euler-number building blocks — Gray's quad-count
    formula gives χ4 = C4 − H8 = (Q1 − Q3 + 2·QD)/4 and
    χ8 = C8 − H4 = (Q1 − Q3 − 2·QD)/4, which is how the SQL oracle
    verifies the dissolve (contract query ``color_dissolve``).
    """
    g, _, _ = _dense_grid(np.asarray(gx), np.asarray(gy))
    bg = ~np.pad(g, 1)
    return (
        _n_components(g, 4),
        _n_components(g, 8),
        _n_components(bg, 4) - 1,
        _n_components(bg, 8) - 1,
    )


def quad_counts(gx: np.ndarray, gy: np.ndarray) -> tuple[int, int, int]:
    """Gray's 2×2 window counts over the cell set — one vectorized numpy
    pass: (Q1, Q3, QD) with QD = diagonal two-pixel windows.  Euler
    numbers follow as χ4 = (Q1 − Q3 + 2·QD)/4 = C4 − H8 and
    χ8 = (Q1 − Q3 − 2·QD)/4 = C8 − H4 (property-tested against
    :func:`label_counts` in tests/test_geometry_dissolve.py)."""
    g, _, _ = _dense_grid(np.asarray(gx), np.asarray(gy))
    p = np.pad(g, 1)
    a = p[:-1, :-1]
    b = p[:-1, 1:]
    c = p[1:, :-1]
    d = p[1:, 1:]
    n = (a.astype(np.int8) + b.astype(np.int8)
         + c.astype(np.int8) + d.astype(np.int8))
    q1 = int((n == 1).sum())
    q3 = int((n == 3).sum())
    qd = int(((n == 2) & (a == d)).sum())
    return q1, q3, qd


def dissolve_area_px(polys) -> float:
    """Total area (in pixel units) of a dissolve result — for tests."""
    total = 0.0
    for rings in polys:
        for i, ring in enumerate(rings):
            a = _signed_area2(ring[:-1]) / 2.0
            total += a
    return total

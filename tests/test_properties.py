"""Property-based tests (hypothesis) for the pure kernels.

The reference ships only example-based tests (SURVEY.md §5.1); these
pin the algebraic invariants of the codec / cell-index / dissolve
kernels across randomized inputs, which is what actually protects the
10^12-row paths (every weird coordinate WILL occur at that scale).
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openelevationservice_spark.functions import cells, polyline as pl
from openelevationservice_spark.functions.dissolve import (
    _signed_area2,
    dissolve_pixels,
)

lon_s = st.floats(min_value=-179.99, max_value=179.99,
                  allow_nan=False, allow_infinity=False)
lat_s = st.floats(min_value=-89.99, max_value=89.99,
                  allow_nan=False, allow_infinity=False)
z_s = st.floats(min_value=-10000, max_value=10000,
                allow_nan=False, allow_infinity=False)


def _py2_round(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(lon_s, lat_s, z_s), min_size=1, max_size=20),
       st.sampled_from([5, 6]))
def test_polyline_roundtrip_is_quantization(coords, precision):
    """decode(encode(c)) == the codec's quantization law, for every
    vertex, both precisions, 3-D (z factor 100)."""
    enc = pl.encode(coords, precision, is3d=True)
    dec = pl.decode(enc, precision, is3d=True)
    assert len(dec) == len(coords)
    f = 10 ** precision
    for (lon, lat, z), (dlon, dlat, dz) in zip(coords, dec):
        assert _py2_round(lon * f) == round(dlon * f)
        assert _py2_round(lat * f) == round(dlat * f)
        assert _py2_round(z * 100) == round(dz * 100)


@settings(max_examples=200, deadline=None)
@given(lon_s, lat_s)
def test_cell_contains_its_point(lon, lat):
    """The cell a point maps to must cover the point (half-open), up to
    one ulp of the shared floor arithmetic: the floor law itself is the
    spec (identical expression JVM-side and in the SQL oracle), so a
    point within rounding distance of a seam may land on either side —
    but always on the SAME side in every component of the engine."""
    cx, cy = cells.cell_xy(np.array([lon]), np.array([lat]))
    size = cells.cell_size_deg()
    tol = 1e-9 * size
    x0 = -180.0 + cx[0] * size
    y1 = 90.0 - cy[0] * size          # north edge
    assert x0 - tol <= lon < x0 + size + tol
    assert y1 - size - tol < lat <= y1 + tol


@settings(max_examples=100, deadline=None)
@given(lon_s, lat_s, st.integers(min_value=0, max_value=14))
def test_cell_parent_consistency(lon, lat, res):
    """Coarser-resolution assignment == parent of base assignment."""
    cx, cy = cells.cell_xy(np.array([lon]), np.array([lat]))
    base = cells.morton_id(cx, cy)
    coarse_xy = cells.cell_xy(np.array([lon]), np.array([lat]), res=res)
    coarse = cells.morton_id(coarse_xy[0], coarse_xy[1], res=res)
    assert cells.parent(base, res)[0] == coarse[0]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=5))
def test_ring_disk_counts(k):
    """|ring(k)| = 8k, |disk(k)| = (2k+1)^2 — the kNN search frontier."""
    rx, ry = cells.ring_offsets(k)
    assert len(rx) == len(ry) == 8 * k
    assert all(max(abs(a), abs(b)) == k for a, b in zip(rx, ry))
    dx, dy = cells.disk_offsets(k)
    assert len(dx) == (2 * k + 1) ** 2


@settings(max_examples=60, deadline=None)
@given(st.sets(st.tuples(st.integers(0, 12), st.integers(0, 12)),
               min_size=1, max_size=60))
def test_dissolve_preserves_area_and_closes_rings(pixels):
    """Dissolved polygons cover exactly the input pixels: total signed
    area (outer − holes) == pixel count; every ring closes."""
    gx = np.array([p[0] for p in pixels], dtype=np.int64)
    gy = np.array([p[1] for p in pixels], dtype=np.int64)
    polys = dissolve_pixels(gx, gy)
    total = 0.0
    for rings in polys:
        for ring in rings:
            assert ring[0] == ring[-1]          # closed
        total += sum(_signed_area2(r[:-1]) / 2.0 for r in rings)
    assert total == len(pixels)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.floats(13.0, 14.0, allow_nan=False),
    st.floats(38.0, 39.0, allow_nan=False),
    st.floats(13.0, 14.0, allow_nan=False),
    st.floats(38.0, 39.0, allow_nan=False),
), min_size=1, max_size=8))
def test_densify_implementations_agree(spark, lines):
    """The Arrow densify and the array-expression densify are the same
    operator on arbitrary segments (incl. zero-length and near-seam)."""
    import pandas as pd
    from openelevationservice_spark.operators.line import (
        densify_lines,
        densify_lines_arrow,
    )

    pdf = pd.DataFrame(
        [(i, x1, y1, x2, y2) for i, (x1, y1, x2, y2) in enumerate(lines)],
        columns=["line_id", "x1", "y1", "x2", "y2"],
    )
    df = spark.createDataFrame(pdf)
    a = densify_lines_arrow(df).toPandas().sort_values(
        ["line_id", "seq"]).reset_index(drop=True)
    b = densify_lines(df).toPandas().sort_values(
        ["line_id", "seq"]).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c

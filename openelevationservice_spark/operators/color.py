"""Color-polygon pipeline: elevation-band bucketing + grid dissolve.

Reference (``server/api/querybuilder.py:56-102`` +
``server/api/elevation_query_area_union.py:32-76``): fetch all pixel
polygons, then **client-side** min/max/avg, 23-band bucketing

    range_div   = (max - min + 1) / num_ranges
    color_range = floor((height - min) / range_div)
    height_base = ceil(color_range * range_div + min)

and a shapely ``unary_union`` per band.  At continental polygons that
pixel list explodes driver memory (SURVEY.md §3.3) — here the whole
pipeline stays distributed: pixel rows → two-pass agg (G1) → JVM
bucket columns (G2) → hash-repartition by **(poly_id, height_base)**
(bands dissolve independently, exactly as the reference unions per
band — so the largest polygon's bands spread across tasks) → one
packed ``array<long>`` cell row per band (co-partitioned
``collect_list``, see :func:`_banded_cells`) → exact grid dissolve
kernel (G3) over each band row.  Only the final FeatureCollection is
collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import NUM_RANGES, PX, WORLD_X0, WORLD_Y0
from ..functions.dissolve import dissolve_pixels_rings, quad_counts
from ..plans.cache import lease
from .polygon import polygon_pixels


def polygon_stats(pixels_df: DataFrame) -> DataFrame:
    """min/max/avg per polygon (reference ``querybuilder.py:84-88``)."""
    return pixels_df.groupBy("poly_id").agg(
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
        F.avg("z").alias("avg_z"),
        F.count("*").alias("n_pixels"),
    )


def with_height_base(pixels_df: DataFrame, stats_df: DataFrame,
                     num_ranges: int = NUM_RANGES) -> DataFrame:
    """Exact reference band arithmetic as JVM columns (G2)."""
    j = pixels_df.join(F.broadcast(stats_df.select("poly_id", "min_z", "max_z")), "poly_id")
    range_div = (F.col("max_z") - F.col("min_z") + F.lit(1)) / F.lit(float(num_ranges))
    color_range = F.floor((F.col("z") - F.col("min_z")) / range_div)
    height_base = F.ceil(color_range * range_div + F.col("min_z"))
    return j.withColumn("height_base", height_base.cast("long"))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType()),
        T.StructField("height_base", T.LongType()),
        T.StructField("feature_idx", T.IntegerType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("area_px", T.DoubleType()),
        T.StructField(
            "rings",
            T.ArrayType(T.ArrayType(T.StructType(
                [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
            ))),
        ),
    ]
)


def _dissolve_group(poly_id: int, hb: int, gx: np.ndarray,
                    gy: np.ndarray) -> list[dict]:
    polys, ring_areas = dissolve_pixels_rings(gx, gy)
    rows = []
    for i, (rings, ra) in enumerate(zip(polys, ring_areas)):
        deg_rings = [
            [{"x": WORLD_X0 + gx * PX, "y": WORLD_Y0 - gy * PX} for gx, gy in ring]
            for ring in rings
        ]
        area = sum(ra) / 2.0
        rows.append({
            "poly_id": poly_id,
            "height_base": hb,
            "feature_idx": i,
            "n_rings": len(rings),
            "area_px": float(area),
            "rings": deg_rings,
        })
    return rows


def _dissolve_partitions(df: DataFrame) -> int:
    """Partition count for the dissolve exchange: 4 tasks per core."""
    return df.sparkSession.sparkContext.defaultParallelism * 4


#: gx/gy pack base for the band-cell transfer (gxy = gx * 2^32 + gy);
#: a global pixel grid at SRTM-like resolution is ~10^6 cells per axis,
#: far inside the 32-bit halves.
_GXY = 1 << 32


def _banded_cells(pixels: DataFrame, num_ranges: int) -> DataFrame:
    """One row per (poly_id, height_base): the band's cells as ONE packed
    ``array<long>`` column.

    This is the operator's Arrow-boundary diet (round-5 decomposition,
    BENCH/SCALE.md): shipping the 9.9M banded pixel rows into the python
    kernel as 4 scalar columns was +2.75 s at local[32] — ~35 % of the
    query — while the kernel's own compute is noise (~0.3 s).  Packing
    (gx, gy) into one long and gathering each band with a co-partitioned
    ``collect_list`` cuts per-value Arrow writes 4× and row overhead
    ~430× (one row per band), and replaces the sortWithinPartitions +
    python-side group streaming entirely; the agg adds no JVM cost (the
    `agg_jvm` variant times identical to the former sort shape).

    The explicit ``repartition`` count is load-bearing (AQE straggler
    tail otherwise — see the partition-count plan test); ``groupBy`` on
    the same keys reuses that exchange, so the agg is partial-free but
    exchange-free too.  Peak task memory is one band's cell array —
    the same bound as the python kernel's dense-grid materialization,
    which has always been the operator's per-band bound (the reference
    dissolves a bbox request's bands driver-side; continental single
    bands need a tiled dissolve in ANY shape).
    """
    stats = polygon_stats(pixels)
    banded = with_height_base(pixels, stats, num_ranges)
    gxy = (F.col("gx").cast("long") * F.lit(_GXY) + F.col("gy")).alias("gxy")
    return (
        banded.select("poly_id", "height_base", gxy)
        .repartition(_dissolve_partitions(banded), "poly_id", "height_base")
        .groupBy("poly_id", "height_base")
        .agg(F.collect_list("gxy").alias("cells"))
    )


def _iter_cell_groups(batches):
    """(poly_id, height_base, gx, gy) per band row.  collect_list order
    is nondeterministic, but every kernel consumer rasterizes the cells
    into an occupancy grid first — order-invariant by construction."""
    for pdf in batches:
        for pid, hb, cells in zip(pdf["poly_id"].to_numpy(),
                                  pdf["height_base"].to_numpy(),
                                  pdf["cells"].to_numpy()):
            arr = np.asarray(cells, dtype=np.int64)
            yield int(pid), int(hb), arr >> 32, arr & (_GXY - 1)


def _dissolve_partition(batches):
    rows = []
    for pid, hb, gx, gy in _iter_cell_groups(batches):
        rows.extend(_dissolve_group(pid, hb, gx, gy))
    yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def polygon_color_features(polygons_df: DataFrame, images_df: DataFrame,
                           num_ranges: int = NUM_RANGES,
                           index_strategy: str = "broadcast",
                           spread: bool = True,
                           pixels_df: DataFrame | None = None) -> DataFrame:
    """Distributed equivalent of ``group_and_union_geometries``.

    Returns one row per dissolved feature:
    (poly_id, height_base, feature_idx, n_rings, area_px, rings).

    Pass ``pixels_df`` (an already-built — typically already-persisted —
    ``polygon_pixels`` result for the same polygons) to reuse one pixel
    dump across stats and dissolve; the caller then owns its cache
    lifecycle and this operator takes no lease of its own.
    """
    if pixels_df is not None:
        pixels = pixels_df
    else:
        pixels = polygon_pixels(polygons_df, images_df,
                                index_strategy=index_strategy, spread=spread)
        lease("color_features", pixels)
    return _banded_cells(pixels, num_ranges).mapInPandas(
        _dissolve_partition, schema=FEATURE_SCHEMA
    )


INVARIANT_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType()),
        T.StructField("height_base", T.LongType()),
        T.StructField("area_px", T.LongType()),
        T.StructField("euler4", T.LongType()),
        T.StructField("euler8", T.LongType()),
    ]
)


def _invariants_group(poly_id: int, hb: int, gx: np.ndarray,
                      gy: np.ndarray) -> dict:
    """Dissolve one (poly_id, height_base) band and reduce it to three
    SQL-checkable invariants:

    - ``area_px``  — Σ shoelace area of the traced rings (holes negative);
      equals the band's pixel count iff the ring tracer is exact.
    - ``euler4``   — C4 − H8 = Gray quad formula (Q1 − Q3 + 2·QD)/4.
    - ``euler8``   — C8 − H4 = (Q1 − Q3 − 2·QD)/4.

    The loop tracer is cross-asserted against the one-pass quad counts
    (shells = C4, GEOS-convention ring holes ∈ [H8, H4] — properties
    established against independent grid labeling in
    tests/test_geometry_dissolve.py — give the sandwich
    χ8 ≤ shells − ring_holes ≤ χ4), so a tracer bug fails the query
    instead of shipping wrong rings.  Full union-find labeling stays in
    the property tests: running it per band was the kernel's dominant
    cost (Python union loops over the mostly-background bbox).
    """
    polys, ring_areas = dissolve_pixels_rings(gx, gy)
    n_shells = len(polys)
    n_holes = sum(len(rings) - 1 for rings in polys)
    area2 = sum(a for areas in ring_areas for a in areas)
    q1, q3, qd = quad_counts(gx, gy)
    euler4 = (q1 - q3 + 2 * qd) // 4
    euler8 = (q1 - q3 - 2 * qd) // 4
    if not (euler8 <= n_shells - n_holes <= euler4) or area2 % 2:
        raise AssertionError(
            f"dissolve/quad mismatch: shells={n_shells} ring_holes={n_holes} "
            f"euler4={euler4} euler8={euler8} area2={area2}"
        )
    return {
        "poly_id": poly_id,
        "height_base": hb,
        "area_px": area2 // 2,
        "euler4": euler4,
        "euler8": euler8,
    }


def _invariants_partition(batches):
    rows = [_invariants_group(pid, hb, gx, gy)
            for pid, hb, gx, gy in _iter_cell_groups(batches)]
    yield pd.DataFrame(rows, columns=[f.name for f in INVARIANT_SCHEMA.fields])


def polygon_color_invariants(polygons_df: DataFrame, images_df: DataFrame,
                             num_ranges: int = NUM_RANGES,
                             index_strategy: str = "broadcast",
                             spread: bool = True) -> DataFrame:
    """Per-band dissolve invariants (poly_id, height_base, area_px,
    euler4, euler8) — the oracle-checkable face of the dissolve (G3).
    Same plan shape as :func:`polygon_color_features`."""
    pixels = polygon_pixels(polygons_df, images_df,
                            index_strategy=index_strategy, spread=spread)
    lease("color_invariants", pixels)
    return _banded_cells(pixels, num_ranges).mapInPandas(
        _invariants_partition, schema=INVARIANT_SCHEMA
    )


def feature_collection(features_pdf: pd.DataFrame) -> dict:
    """Driver-side GeoJSON assembly (formatting layer, not distributed)."""
    feats = []
    for _, r in features_pdf.iterrows():
        coords = [[[p["x"], p["y"]] for p in ring] for ring in r["rings"]]
        feats.append({
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": coords},
            "properties": {"heightBase": int(r["height_base"])},
        })
    return {"type": "FeatureCollection", "features": feats}

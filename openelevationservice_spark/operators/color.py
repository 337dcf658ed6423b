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
bucket columns (G2) → ``groupBy(poly, band).applyInPandas`` exact grid
dissolve (G3).  Only the final FeatureCollection is collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import NUM_RANGES, PX, WORLD_X0, WORLD_Y0
from ..functions.dissolve import _signed_area2, dissolve_pixels, quad_counts
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


def _dissolve_group(pdf: pd.DataFrame) -> pd.DataFrame:
    poly_id = int(pdf["poly_id"].iloc[0])
    hb = int(pdf["height_base"].iloc[0])
    polys = dissolve_pixels(pdf["gx"].to_numpy(np.int64), pdf["gy"].to_numpy(np.int64))
    rows = []
    for i, rings in enumerate(polys):
        deg_rings = [
            [{"x": WORLD_X0 + gx * PX, "y": WORLD_Y0 - gy * PX} for gx, gy in ring]
            for ring in rings
        ]
        area = sum(_signed_area2(r[:-1]) / 2.0 for r in rings)
        rows.append({
            "poly_id": poly_id,
            "height_base": hb,
            "feature_idx": i,
            "n_rings": len(rings),
            "area_px": float(area),
            "rings": deg_rings,
        })
    return pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def _dissolve_partition(batches):
    """One python invocation per PARTITION, not per group.

    ``groupBy().applyInPandas`` pays a shuffle + Arrow round-trip +
    python call per (poly_id, height_base) group; band groups here are
    tiny (tens of pixels), so that overhead dominated the operator
    (measured 13 s distributed vs 4 s single-threaded pandas at
    sf0.01).  Instead the rows are hash-partitioned by poly_id (all of
    a polygon's bands co-located), the partition's Arrow batches are
    accumulated, and plain pandas groupby dissolves every group in one
    call — same rows out, ~5× less overhead.  Per-partition buffering
    is bounded: a partition holds ~n_polygons/shuffle_partitions
    polygons' pixels.
    """
    pdfs = [pdf for pdf in batches if len(pdf)]
    if not pdfs:
        yield pd.DataFrame(columns=[f.name for f in FEATURE_SCHEMA.fields])
        return
    all_rows = pd.concat(pdfs, ignore_index=True)
    outs = [
        _dissolve_group(g)
        for _, g in all_rows.groupby(["poly_id", "height_base"], sort=False)
    ]
    # one Arrow batch per partition, not one per band group
    yield pd.concat(outs, ignore_index=True)


def polygon_color_features(polygons_df: DataFrame, images_df: DataFrame,
                           num_ranges: int = NUM_RANGES,
                           index_strategy: str = "broadcast",
                           spread: bool = True) -> DataFrame:
    """Distributed equivalent of ``group_and_union_geometries``.

    Returns one row per dissolved feature:
    (poly_id, height_base, feature_idx, n_rings, area_px, rings).
    """
    pixels = polygon_pixels(polygons_df, images_df,
                            index_strategy=index_strategy, spread=spread)
    pixels.persist()
    stats = polygon_stats(pixels)
    banded = with_height_base(pixels, stats, num_ranges)
    return (
        banded.select("poly_id", "height_base", "gx", "gy")
        .repartition("poly_id")
        .mapInPandas(_dissolve_partition, schema=FEATURE_SCHEMA)
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


def _invariants_group(pdf: pd.DataFrame) -> dict:
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
    gx = pdf["gx"].to_numpy(np.int64)
    gy = pdf["gy"].to_numpy(np.int64)
    polys = dissolve_pixels(gx, gy)
    n_shells = len(polys)
    n_holes = sum(len(rings) - 1 for rings in polys)
    area2 = sum(_signed_area2(r[:-1]) for rings in polys for r in rings)
    q1, q3, qd = quad_counts(gx, gy)
    euler4 = (q1 - q3 + 2 * qd) // 4
    euler8 = (q1 - q3 - 2 * qd) // 4
    if not (euler8 <= n_shells - n_holes <= euler4) or area2 % 2:
        raise AssertionError(
            f"dissolve/quad mismatch: shells={n_shells} ring_holes={n_holes} "
            f"euler4={euler4} euler8={euler8} area2={area2}"
        )
    return {
        "poly_id": int(pdf["poly_id"].iloc[0]),
        "height_base": int(pdf["height_base"].iloc[0]),
        "area_px": area2 // 2,
        "euler4": euler4,
        "euler8": euler8,
    }


def _invariants_partition(batches):
    pdfs = [pdf for pdf in batches if len(pdf)]
    if not pdfs:
        yield pd.DataFrame(columns=[f.name for f in INVARIANT_SCHEMA.fields])
        return
    all_rows = pd.concat(pdfs, ignore_index=True)
    yield pd.DataFrame(
        [_invariants_group(g)
         for _, g in all_rows.groupby(["poly_id", "height_base"], sort=False)],
        columns=[f.name for f in INVARIANT_SCHEMA.fields],
    )


def polygon_color_invariants(polygons_df: DataFrame, images_df: DataFrame,
                             num_ranges: int = NUM_RANGES,
                             index_strategy: str = "broadcast",
                             spread: bool = True) -> DataFrame:
    """Per-band dissolve invariants (poly_id, height_base, area_px,
    euler4, euler8) — the oracle-checkable face of the dissolve (G3).
    Same plan shape as :func:`polygon_color_features`."""
    pixels = polygon_pixels(polygons_df, images_df,
                            index_strategy=index_strategy, spread=spread)
    pixels.persist()
    stats = polygon_stats(pixels)
    banded = with_height_base(pixels, stats, num_ranges)
    return (
        banded.select("poly_id", "height_base", "gx", "gy")
        .repartition("poly_id")
        .mapInPandas(_invariants_partition, schema=INVARIANT_SCHEMA)
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

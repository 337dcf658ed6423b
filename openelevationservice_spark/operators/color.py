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
band — so the largest polygon's bands spread across tasks) → sorted
partitions streamed group-by-group through the exact grid dissolve
kernel (G3).  Only the final FeatureCollection is collected.
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


def _dissolve_group(pdf: pd.DataFrame) -> pd.DataFrame:
    poly_id = int(pdf["poly_id"].iloc[0])
    hb = int(pdf["height_base"].iloc[0])
    polys, ring_areas = dissolve_pixels_rings(
        pdf["gx"].to_numpy(np.int64), pdf["gy"].to_numpy(np.int64)
    )
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
    return pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def _dissolve_partitions(df: DataFrame) -> int:
    """Partition count for the dissolve exchange: 4 tasks per core."""
    return df.sparkSession.sparkContext.defaultParallelism * 4


def _iter_sorted_groups(batches):
    """Stream (poly_id, height_base) groups out of a partition whose rows
    are SORTED by that key (``sortWithinPartitions`` upstream).

    One python invocation per PARTITION, not per group —
    ``groupBy().applyInPandas`` pays a shuffle + Arrow round-trip +
    python call per band group, and band groups are tiny (tens of
    pixels), so that overhead dominated the operator (measured 13 s
    distributed vs 4 s single-threaded pandas at sf0.01).  But unlike
    the round-2 shape (``pd.concat`` of the WHOLE partition before a
    pandas groupby), sorted streaming holds only the CURRENT group plus
    one Arrow batch in memory: group boundaries are found vectorized per
    batch, complete groups are yielded immediately, and only the
    trailing run (a group that may continue into the next batch) is
    carried over.  Peak memory ∝ largest single band, NOT largest
    partition (VERDICT r2 "What's wrong" #2 — the skew/OOM cliff where
    one continental polygon's entire pixel set sat in one worker).
    """
    pending: list[pd.DataFrame] = []
    cur_key = None
    for pdf in batches:
        if not len(pdf):
            continue
        pid = pdf["poly_id"].to_numpy()
        hb = pdf["height_base"].to_numpy()
        change = np.flatnonzero((pid[1:] != pid[:-1]) | (hb[1:] != hb[:-1])) + 1
        bounds = np.concatenate(([0], change, [len(pdf)]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            key = (pid[s], hb[s])
            if cur_key is not None and key != cur_key:
                yield pending[0] if len(pending) == 1 else pd.concat(pending, ignore_index=True)
                pending = []
            cur_key = key
            pending.append(pdf.iloc[s:e])
    if pending:
        yield pending[0] if len(pending) == 1 else pd.concat(pending, ignore_index=True)


# groups per emitted Arrow batch: large enough to amortize the Arrow
# boundary, small enough to keep output buffering negligible
_GROUPS_PER_BATCH = 512


def _dissolve_partition(batches):
    outs, emitted = [], False
    for g in _iter_sorted_groups(batches):
        outs.append(_dissolve_group(g))
        if len(outs) >= _GROUPS_PER_BATCH:
            yield pd.concat(outs, ignore_index=True)
            outs, emitted = [], True
    if outs:
        yield pd.concat(outs, ignore_index=True)
    elif not emitted:
        yield pd.DataFrame(columns=[f.name for f in FEATURE_SCHEMA.fields])


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
    stats = polygon_stats(pixels)
    banded = with_height_base(pixels, stats, num_ranges)
    return (
        banded.select("poly_id", "height_base", "gx", "gy")
        # explicit partition count: AQE's byte-based coalescing merges
        # these small-by-bytes partitions down to a handful of tasks,
        # but the python dissolve kernel's cost per byte is orders of
        # magnitude above a normal shuffle read, so coalescing creates
        # a straggler tail (measured 15%+ at local[32], worse under
        # ambient load).  4x slots keeps the kernel stage amortizable.
        .repartition(_dissolve_partitions(banded), "poly_id", "height_base")
        .sortWithinPartitions("poly_id", "height_base")
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
        "poly_id": int(pdf["poly_id"].iloc[0]),
        "height_base": int(pdf["height_base"].iloc[0]),
        "area_px": area2 // 2,
        "euler4": euler4,
        "euler8": euler8,
    }


def _invariants_partition(batches):
    rows, emitted = [], False
    for g in _iter_sorted_groups(batches):
        rows.append(_invariants_group(g))
        if len(rows) >= _GROUPS_PER_BATCH:
            yield pd.DataFrame(rows, columns=[f.name for f in INVARIANT_SCHEMA.fields])
            rows, emitted = [], True
    if rows or not emitted:
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
    stats = polygon_stats(pixels)
    banded = with_height_base(pixels, stats, num_ranges)
    return (
        banded.select("poly_id", "height_base", "gx", "gy")
        # explicit partition count: AQE's byte-based coalescing merges
        # these small-by-bytes partitions down to a handful of tasks,
        # but the python dissolve kernel's cost per byte is orders of
        # magnitude above a normal shuffle read, so coalescing creates
        # a straggler tail (measured 15%+ at local[32], worse under
        # ambient load).  4x slots keeps the kernel stage amortizable.
        .repartition(_dissolve_partitions(banded), "poly_id", "height_base")
        .sortWithinPartitions("poly_id", "height_base")
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

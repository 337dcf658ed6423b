"""Color-polygon pipeline: elevation-band bucketing + grid dissolve.

Reference (``server/api/querybuilder.py:56-102`` +
``server/api/elevation_query_area_union.py:32-76``): fetch all pixel
polygons, then **client-side** min/max/avg, 23-band bucketing

    range_div   = (max - min + 1) / num_ranges
    color_range = floor((height - min) / range_div)
    height_base = ceil(color_range * range_div + min)

and a shapely ``unary_union`` per band.  At continental polygons that
pixel list explodes driver memory (SURVEY.md §3.3) — here the whole
pipeline stays distributed AND runs-resident (r5): scanline runs →
stats off the run arrays (G1, JVM array_min/array_max — no pixel
explode) → vectorized band-split kernel → packed band-subruns →
hash-repartition by **(poly_id, height_base)** (bands dissolve
independently, exactly as the reference unions per band — so the
largest polygon's bands spread across tasks) → one ``array<long>``
subrun row per band (co-partitioned ``collect_list``, see
:func:`_banded_subruns`) → exact grid dissolve kernel (G3) over each
band row.  Only the final FeatureCollection is collected.  The
exploded-pixel shape survives as the asserted parity twin
(:func:`_banded_cells`, ``cells_shape="pixels"`` / ``pixels_df=``).
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
from .polygon import (polygon_pixel_run_blobs, polygon_pixel_runs,
                      polygon_pixels, runs_stats)


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
    """Partition count for the dissolve exchange: 2 tasks per core —
    cores-proportional (never volume-tuned).  r6 sweep at bench volume,
    interleaved minima: 4× 5.90 s, 2× 5.19 s, 1× 8.56 s (straggler
    tail) — with the batched invariants kernel the per-task python
    dispatch outweighs 4×'s extra balance slack, while 1× loses the
    skew headroom outright."""
    return df.sparkSession.sparkContext.defaultParallelism * 2


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


#: subrun packing: one long per band-subrun, gy<<40 | gx0<<16 | len.
#: gx gets 24 bits (16.7M cells); gy gets 23 — bits 40..62 — so the
#: packed value stays inside SIGNED int64 (a 24-bit gy would reach the
#: sign bit and numpy would wrap silently past the assertion — round-5
#: ADVICE).  A global grid at SRTM-like resolution is 432k cells per
#: axis (constants.NCELL_X * TILE_PX), 19x inside the tighter bound.
#: len is a scanline-run fragment, <= TILE_PX (50) by construction.
#: Bounds are asserted in the kernel, not assumed.
_SUB_GY_SHIFT = 40
_SUB_GX_SHIFT = 16
_SUB_G_MAX = 1 << 24
_SUB_GY_MAX = 1 << 23
_SUB_LEN_MAX = 1 << 16

#: map-side-partial subrun rows: ``subs`` is the group's packed int64
#: subruns as ONE little-endian binary buffer — binary crosses the
#: Arrow boundary as a buffer memcpy where ``array<long>`` pays a
#: per-element write on the way out of the kernel and a per-element
#: read on the way back in (the measured r5/r6 transfer term).
SUBRUN_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType()),
        T.StructField("height_base", T.LongType()),
        T.StructField("subs", T.BinaryType()),
    ]
)


def _band_subrun_kernel(num_ranges: int):
    """Vectorized band-split of scanline runs → packed band-subruns.

    Input rows: (poly_id, gy, gx0, zs, min_z, max_z) — the pixel-run
    table joined with the broadcast per-polygon stats.  The kernel
    flattens every run in the batch into one z vector, applies the
    exact reference band arithmetic (``querybuilder.py:56-102``; the
    same IEEE-double expression as :func:`with_height_base`, so both
    shapes bucket identically), and splits runs at band-change
    boundaries — pure numpy, no per-run python loop.  Terrain is
    locally smooth, so subrun count ~ run count, not pixel count:
    the downstream exchange ships ~run-many longs instead of
    pixel-many rows (the measured r5 transfer term).

    The packed subruns are PARTIALLY AGGREGATED before they leave the
    kernel (guide §2.3 "aggregate before you shuffle"): one output row
    per (poly_id, height_base) group *of the batch*, carrying that
    group's subruns as one ``array<long>`` — the r6 measurement showed
    the synthetic z field band-splits almost every step (7.8M subruns
    from 9.9M pixels), so per-subrun rows re-created the per-pixel
    Arrow/exchange row volume the runs diet was meant to remove.  The
    final gather flattens the partials (same multiset of packed longs;
    every consumer rasterizes, so order never matters)."""

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            zs_list = pdf["zs"].to_numpy()
            lens = np.fromiter((len(v) for v in zs_list), np.int64,
                               count=len(zs_list))
            if int(lens.sum()) == 0:
                continue
            z = np.concatenate([np.asarray(v, dtype=np.int64) for v in zs_list])
            out = _subrun_partial_frame(
                pdf["poly_id"].to_numpy(), pdf["gy"].to_numpy(),
                pdf["gx0"].to_numpy(), lens, z,
                pdf["min_z"].to_numpy(), pdf["max_z"].to_numpy(), num_ranges)
            if out is not None:
                yield out

    return kernel


def _subrun_partial_frame(pid_run, gy_run, gx0_run, lens, z,
                          minz_run, maxz_run, num_ranges):
    """Vectorized band-split of flat run arrays → map-side-partial
    subrun frame (one row per (poly, band) group of the batch, subruns
    packed).  ``z`` is the int64 concat of every run's values in run
    order; per-run scalars are expanded with one np.repeat."""
    total = len(z)
    if total == 0:
        return None
    n_runs = len(lens)
    rep = np.repeat(np.arange(n_runs), lens)
    min_z = minz_run.astype(np.float64)[rep]
    max_z = maxz_run.astype(np.float64)[rep]
    range_div = (max_z - min_z + 1.0) / float(num_ranges)
    color_range = np.floor((z - min_z) / range_div)
    hb = np.ceil(color_range * range_div + min_z).astype(np.int64)
    starts0 = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gx = gx0_run[rep] + (np.arange(total) - starts0[rep])
    gy = gy_run[rep]
    new = np.empty(total, dtype=bool)
    new[0] = True
    new[1:] = (hb[1:] != hb[:-1]) | (rep[1:] != rep[:-1])
    s = np.flatnonzero(new)
    ln = np.diff(np.append(s, total))
    gy_s, gx_s = gy[s], gx[s]
    if len(gy_s) and not (gy_s.max() < _SUB_GY_MAX
                          and gx_s.max() + ln.max() < _SUB_G_MAX
                          and ln.max() < _SUB_LEN_MAX):
        raise AssertionError(
            "band-subrun outside the 23/24/16-bit packing bound"
        )
    sub = (gy_s << _SUB_GY_SHIFT) | (gx_s << _SUB_GX_SHIFT) | ln
    pid_s = np.asarray(pid_run)[rep][s]
    hb_s = hb[s]
    # map-side partial: group the batch's subruns by (poly, band)
    order = np.lexsort((hb_s, pid_s))
    pid_o, hb_o, sub_o = pid_s[order], hb_s[order], sub[order]
    grp = np.flatnonzero(np.concatenate(
        ([True], (pid_o[1:] != pid_o[:-1]) | (hb_o[1:] != hb_o[:-1]))))
    sub_le = sub_o.astype("<i8", copy=False)
    return pd.DataFrame(
        {"poly_id": pid_o[grp],
         "height_base": hb_o[grp],
         "subs": pd.Series([chunk.tobytes() for chunk in
                            np.split(sub_le, grp[1:])], dtype=object)},
        columns=["poly_id", "height_base", "subs"],
    )


def _band_subrun_kernel_blob(num_ranges: int):
    """Blob twin of :func:`_band_subrun_kernel`: input rows are
    (poly_id, blob, min_z, max_z) from
    :func:`~..operators.polygon.polygon_pixel_run_blobs` joined with the
    broadcast stats.  Unpacks every pair's runs with ``np.frombuffer``
    views (z never existed as a JVM array) and band-splits the whole
    batch in one vectorized pass."""

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # per-row work is VIEWS only (3 frombuffer slices); every
            # astype/expansion happens once per batch over the
            # concatenated arrays — the per-pair alloc loop was the
            # measured low-core cost of the blob path
            gy_l, gx0_l, ln_l, z_l, n_runs = [], [], [], [], []
            for blob in pdf["blob"]:
                n = int(np.frombuffer(blob, dtype="<i4", count=1)[0])
                head = np.frombuffer(blob, dtype="<i4", count=1 + 3 * n)
                gy_l.append(head[1:1 + n])
                gx0_l.append(head[1 + n:1 + 2 * n])
                ln_l.append(head[1 + 2 * n:])
                z_l.append(np.frombuffer(blob, dtype="<i2",
                                         offset=4 * (1 + 3 * n)))
                n_runs.append(n)
            n_runs = np.asarray(n_runs, dtype=np.int64)
            out = _subrun_partial_frame(
                np.repeat(pdf["poly_id"].to_numpy(), n_runs),
                np.concatenate(gy_l).astype(np.int64),
                np.concatenate(gx0_l).astype(np.int64),
                np.concatenate(ln_l).astype(np.int64),
                np.concatenate(z_l).astype(np.int64),
                np.repeat(pdf["min_z"].to_numpy(), n_runs),
                np.repeat(pdf["max_z"].to_numpy(), n_runs), num_ranges)
            if out is not None:
                yield out

    return kernel


def _banded_subruns(runs: DataFrame, num_ranges: int) -> DataFrame:
    """One row per (poly_id, height_base): the band's packed subruns.

    The runs-resident successor of :func:`_banded_cells` (kept as the
    parity twin): the persisted/aggregated/shuffled unit is the
    scanline run, never the exploded pixel row.  vs the pixel shape
    this removes the 9.9M-row posexplode+persist, the pixel-row stats
    scan (JVM array_min/array_max over runs instead), the 9.9M-long
    exchange (ships ~run-many packed subruns) and the 9.9M-value
    collect_list — the kernel re-expands cells from subruns with one
    np.repeat.  Results are asserted frame-identical to the pixel
    shape in tests/test_polygon.py."""
    stats = runs_stats(runs).select("poly_id", "min_z", "max_z")
    j = runs.join(F.broadcast(stats), "poly_id")
    subs = j.mapInPandas(_band_subrun_kernel(num_ranges), SUBRUN_SCHEMA)
    return _gather_bands(subs)


def _gather_bands(subs: DataFrame) -> DataFrame:
    """(poly, band)-exchange + gather of the map-side subrun partials.
    The gathered column is ``array<binary>`` (one packed buffer per
    partial); kernels re-join the chunks with one ``b"".join`` —
    no per-element JVM work anywhere in the gather."""
    return (
        subs.repartition(_dissolve_partitions(subs), "poly_id", "height_base")
        .groupBy("poly_id", "height_base")
        .agg(F.collect_list("subs").alias("subs"))
    )


def _banded_subruns_blob(blobs: DataFrame, num_ranges: int) -> DataFrame:
    """Blob-resident successor of :func:`_banded_subruns` (the r6
    default): stats aggregate over the blob table's pruned scalar
    min/max columns (no array re-fold, no array cache scan), broadcast
    back, and the band-split unpacks the packed runs in Python —
    z values cross the JVM boundary exactly twice, both times as one
    binary buffer memcpy."""
    stats = (blobs.groupBy("poly_id")
             .agg(F.min("run_min").alias("min_z"),
                  F.max("run_max").alias("max_z")))
    j = (blobs.join(F.broadcast(stats), "poly_id")
         .select("poly_id", "blob", "min_z", "max_z"))
    subs = j.mapInPandas(_band_subrun_kernel_blob(num_ranges), SUBRUN_SCHEMA)
    return _gather_bands(subs)


def _expand_subrun_batch(pdf):
    """Batch-expand one Arrow batch of (poly_id, height_base, subs)
    band rows into flat cell arrays: (band_of_cell, gx, gy, seg) with
    ``seg`` the per-band segment bounds (band b's cells contiguous at
    gx[seg[b]:seg[b+1]]).  ONE np.repeat for the whole batch instead of
    ~10 small numpy calls per band — the per-band expansion overhead
    was a measured term of the r6 dissolve-kernel wall."""
    subs_list = pdf["subs"].to_numpy()
    n_rows = len(subs_list)
    joined = [b"".join(chunks) for chunks in subs_list]
    ln_rows = np.fromiter((len(b) // 8 for b in joined), np.int64, count=n_rows)
    if n_rows:
        arr = np.frombuffer(b"".join(joined), dtype="<i8").astype(np.int64,
                                                                  copy=False)
    else:
        arr = np.empty(0, dtype=np.int64)
    gy0 = arr >> _SUB_GY_SHIFT
    gx0 = (arr >> _SUB_GX_SHIFT) & (_SUB_G_MAX - 1)
    ln = arr & (_SUB_LEN_MAX - 1)
    total = int(ln.sum())
    rep = np.repeat(np.arange(len(arr)), ln)
    starts0 = np.concatenate(([0], np.cumsum(ln)[:-1]))
    gx = gx0[rep] + (np.arange(total) - starts0[rep])
    gy = gy0[rep]
    row_of_sub = np.repeat(np.arange(n_rows), ln_rows)
    band = row_of_sub[rep]
    cells_per_band = np.bincount(band, minlength=n_rows).astype(np.int64)
    seg = np.concatenate(([0], np.cumsum(cells_per_band)))
    return band, gx, gy, seg


def _iter_subrun_groups(batches):
    """(poly_id, height_base, gx, gy) per band row, cells re-expanded
    from packed subruns.  collect_list order is nondeterministic, but
    every kernel consumer rasterizes into an occupancy grid first —
    order-invariant by construction."""
    for pdf in batches:
        band, gx, gy, seg = _expand_subrun_batch(pdf)
        for b, (pid, hb) in enumerate(zip(pdf["poly_id"].to_numpy(),
                                          pdf["height_base"].to_numpy())):
            yield int(pid), int(hb), gx[seg[b]:seg[b + 1]], gy[seg[b]:seg[b + 1]]


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


def _dissolve_partition_subs(batches):
    rows = []
    for pid, hb, gx, gy in _iter_subrun_groups(batches):
        rows.extend(_dissolve_group(pid, hb, gx, gy))
    yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def polygon_color_features(polygons_df: DataFrame, images_df: DataFrame,
                           num_ranges: int = NUM_RANGES,
                           index_strategy: str = "broadcast",
                           spread: bool = True,
                           pixels_df: DataFrame | None = None,
                           runs_df: DataFrame | None = None) -> DataFrame:
    """Distributed equivalent of ``group_and_union_geometries``.

    Returns one row per dissolved feature:
    (poly_id, height_base, feature_idx, n_rings, area_px, rings).

    Default shape is runs-resident (see :func:`_banded_subruns`); pass
    ``runs_df`` (an already-built — typically already-persisted —
    ``polygon_pixel_runs`` result for the same polygons) to reuse one
    rasterization across stats and dissolve; the caller then owns its
    cache lifecycle and this operator takes no lease of its own.
    ``pixels_df`` selects the pixel-shape parity twin the same way.
    """
    if pixels_df is not None:
        return _banded_cells(pixels_df, num_ranges).mapInPandas(
            _dissolve_partition, schema=FEATURE_SCHEMA
        )
    if runs_df is not None:
        return _banded_subruns(runs_df, num_ranges).mapInPandas(
            _dissolve_partition_subs, schema=FEATURE_SCHEMA
        )
    blobs = polygon_pixel_run_blobs(polygons_df, images_df,
                                    index_strategy=index_strategy,
                                    spread=spread)
    lease("color_features", blobs)
    return _banded_subruns_blob(blobs, num_ranges).mapInPandas(
        _dissolve_partition_subs, schema=FEATURE_SCHEMA
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
    from ..functions.dissolve import (_cell_keys, _dissolve_rings_keys,
                                      _quad_counts_keys)
    ck, x0, y0 = _cell_keys(gx, gy)
    polys, ring_areas = _dissolve_rings_keys(ck, x0, y0)
    n_shells = len(polys)
    n_holes = sum(len(rings) - 1 for rings in polys)
    area2 = sum(a for areas in ring_areas for a in areas)
    q1, q3, qd = _quad_counts_keys(ck)
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


def _invariants_partition_subs(batches):
    """Batched invariants: one vectorized pass per Arrow batch
    (functions.dissolve.batch_invariants — successor permutation +
    min-label doubling, no per-edge Python walk, no ring vertex
    lists).  Bands containing a NEGATIVE-area cycle fall back to the
    exact per-band ring path, because the reference hole-attachment
    semantics (holes no shell contains are dropped) need ring geometry;
    hole-free bands — the overwhelming case for contiguous elevation
    bands — never build rings at all.  Results are identical by
    construction and asserted against the per-band path in
    tests/test_polygon.py."""
    from ..functions.dissolve import batch_invariants

    cols = [f.name for f in INVARIANT_SCHEMA.fields]
    for pdf in batches:
        if not len(pdf):
            continue
        band, gx, gy, seg = _expand_subrun_batch(pdf)
        n_bands = len(pdf)
        pid = pdf["poly_id"].to_numpy()
        hbs = pdf["height_base"].to_numpy()
        shells, holes, area2, q1, q3, qd, has_neg = batch_invariants(
            band, gx, gy, n_bands, seg)
        euler4 = (q1 - q3 + 2 * qd) // 4
        euler8 = (q1 - q3 - 2 * qd) // 4
        n_holes = np.zeros(n_bands, dtype=np.int64)
        for b in np.flatnonzero(has_neg):
            r = _invariants_group(int(pid[b]), int(hbs[b]),
                                  gx[seg[b]:seg[b + 1]], gy[seg[b]:seg[b + 1]])
            area2[b] = 2 * r["area_px"]
            euler4[b] = r["euler4"]
            euler8[b] = r["euler8"]
        # sandwich check for the batched bands (the fallback asserts its
        # own inside _invariants_group)
        ok = ((euler8 <= shells - n_holes) & (shells - n_holes <= euler4)
              & (area2 % 2 == 0)) | has_neg
        if not ok.all():
            b = int(np.flatnonzero(~ok)[0])
            raise AssertionError(
                f"dissolve/quad mismatch: shells={int(shells[b])} "
                f"ring_holes={int(n_holes[b])} euler4={int(euler4[b])} "
                f"euler8={int(euler8[b])} area2={int(area2[b])}"
            )
        yield pd.DataFrame(
            {"poly_id": pid, "height_base": hbs, "area_px": area2 // 2,
             "euler4": euler4, "euler8": euler8},
            columns=cols,
        )


def polygon_color_invariants(polygons_df: DataFrame, images_df: DataFrame,
                             num_ranges: int = NUM_RANGES,
                             index_strategy: str = "broadcast",
                             spread: bool = True,
                             cells_shape: str = "blob") -> DataFrame:
    """Per-band dissolve invariants (poly_id, height_base, area_px,
    euler4, euler8) — the oracle-checkable face of the dissolve (G3).
    Same plan shape as :func:`polygon_color_features`.  The default
    rasterizes straight to packed run BLOBS (r6); ``cells_shape="runs"``
    selects the r5 runs-resident twin (JVM zs arrays),
    ``cells_shape="pixels"`` the exploded-pixel parity twin."""
    if cells_shape == "pixels":
        pixels = polygon_pixels(polygons_df, images_df,
                                index_strategy=index_strategy, spread=spread)
        lease("color_invariants", pixels)
        return _banded_cells(pixels, num_ranges).mapInPandas(
            _invariants_partition, schema=INVARIANT_SCHEMA
        )
    if cells_shape == "runs":
        runs = polygon_pixel_runs(polygons_df, images_df,
                                  index_strategy=index_strategy, spread=spread)
        lease("color_invariants", runs)
        return _banded_subruns(runs, num_ranges).mapInPandas(
            _invariants_partition_subs, schema=INVARIANT_SCHEMA
        )
    blobs = polygon_pixel_run_blobs(polygons_df, images_df,
                                    index_strategy=index_strategy, spread=spread)
    lease("color_invariants", blobs)
    return _banded_subruns_blob(blobs, num_ranges).mapInPandas(
        _invariants_partition_subs, schema=INVARIANT_SCHEMA
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

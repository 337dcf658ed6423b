"""Deterministic synthetic tile world (the sandbox's SRTM stand-in).

The reference downloads real CGIAR SRTM GeoTIFFs and shells out to
``raster2pgsql`` (reference ``server/db_import/filestreams.py:19-95``).
This sandbox has no network and no external data, so the ingest source
is a *seed-free, purely arithmetic* elevation field cut into 50x50-pixel
tiles and encoded into the exact ``input_hint`` schema::

    (image_id: string, bytes: binary, w: int32, h: int32,
     fmt: string, caption: string, phash: int64)

The elevation function is **integer arithmetic on global pixel indices**
so that the very same values are computable in ANSI SQL by the DuckDB
oracle (driver correctness contract) — see ``z_sql_expr``.

Global pixel grid: ``gx = floor((lon - WORLD_X0)/PX)``,
``gy = floor((WORLD_Y0 - lat)/PX)`` (y counts down from the north pole,
matching the upper-left-origin rasters of the reference).  Tile (tx, ty)
covers pixels ``gx in [tx*50, (tx+1)*50)``, ``gy in [ty*50, (ty+1)*50)``
— half-open seams, so every point belongs to exactly one tile.

The default test world is positioned to contain the reference test
coordinate (13.331302, 38.108433) (reference
``openelevationservice/tests/test_api_point.py:8``); the out-of-coverage
Bremen coordinate from the same test file falls outside it.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..constants import NODATA, PX, TILE_DEG, TILE_PX, WORLD_X0, WORLD_Y0
from ..functions import image_codec

# Integer elevation-field parameters (shared with the SQL oracle).
Z_A, Z_B, Z_M1 = 31, 17, 929
Z_C, Z_D, Z_M2 = 7, 13, 211
ND_A, ND_B, ND_M = 13, 7, 9973  # ~0.01% NODATA holes


def z_field(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """int16 elevation at global pixel (gx, gy); NODATA holes included."""
    gx = np.asarray(gx, dtype=np.int64)
    gy = np.asarray(gy, dtype=np.int64)
    z = (gx * Z_A + gy * Z_B) % Z_M1 + (gx * Z_C + gy * Z_D) % Z_M2
    z = z.astype(np.int16)
    hole = (gx * ND_A + gy * ND_B) % ND_M == 0
    return np.where(hole, np.int16(NODATA), z)


def z_sql_expr(gx: str, gy: str) -> str:
    """The same elevation function as ANSI SQL over integer exprs.

    Valid in both Spark SQL and DuckDB (``%`` on non-negative ints).
    """
    z = f"(({gx})*{Z_A} + ({gy})*{Z_B}) % {Z_M1} + (({gx})*{Z_C} + ({gy})*{Z_D}) % {Z_M2}"
    hole = f"((({gx})*{ND_A} + ({gy})*{ND_B}) % {ND_M} = 0)"
    return f"(CASE WHEN {hole} THEN {NODATA} ELSE {z} END)"


@dataclass(frozen=True)
class World:
    """A rectangular block of tiles: tx in [tx0, tx0+nx), ty in [ty0, ty0+ny)."""

    tx0: int = 4636
    ty0: int = 1242
    nx: int = 8
    ny: int = 8

    @property
    def min_x(self) -> float:
        return WORLD_X0 + self.tx0 * TILE_DEG

    @property
    def max_x(self) -> float:
        return WORLD_X0 + (self.tx0 + self.nx) * TILE_DEG

    @property
    def max_y(self) -> float:
        return WORLD_Y0 - self.ty0 * TILE_DEG

    @property
    def min_y(self) -> float:
        return WORLD_Y0 - (self.ty0 + self.ny) * TILE_DEG

    @property
    def n_tiles(self) -> int:
        return self.nx * self.ny

    def contains(self, lon: float, lat: float) -> bool:
        return (self.min_x <= lon < self.max_x) and (self.min_y < lat <= self.max_y)


# The default 8x8-tile world around the reference's Sicily test point.
DEFAULT_WORLD = World()


def tile_grid(tx: int, ty: int) -> np.ndarray:
    """Decoded 50x50 int16 elevation grid of tile (tx, ty)."""
    gx = tx * TILE_PX + np.arange(TILE_PX, dtype=np.int64)
    gy = ty * TILE_PX + np.arange(TILE_PX, dtype=np.int64)
    return z_field(gx[None, :], gy[:, None])


def tile_caption(tx: int, ty: int) -> str:
    """Georeferencing caption — the GeoTIFF-header stand-in (FIXTURES.md §1)."""
    ul_x = WORLD_X0 + tx * TILE_DEG
    ul_y = WORLD_Y0 - ty * TILE_DEG
    return json.dumps(
        {
            "name": f"tile_{tx:05d}_{ty:05d}",
            "ul_x": ul_x,
            "ul_y": ul_y,
            "px": PX,
            "srid": 4326,
            "nodata": NODATA,
        },
        separators=(",", ":"),
    )


def make_images_pdf(world: World = DEFAULT_WORLD, fmts: tuple[str, ...] = ("raw16", "png16")) -> pd.DataFrame:
    """The images table as pandas (driver-side; worlds are small in tests)."""
    rows = []
    for ty in range(world.ty0, world.ty0 + world.ny):
        for tx in range(world.tx0, world.tx0 + world.nx):
            grid = tile_grid(tx, ty)
            fmt = fmts[(tx + ty) % len(fmts)]
            rows.append(
                {
                    "image_id": f"tile_{tx:05d}_{ty:05d}",
                    "bytes": image_codec.encode(grid, fmt),
                    "w": TILE_PX,
                    "h": TILE_PX,
                    "fmt": fmt,
                    "caption": tile_caption(tx, ty),
                    "phash": image_codec.phash64(grid),
                }
            )
    return pd.DataFrame(rows)


IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def make_images_df(spark: SparkSession, world: World = DEFAULT_WORLD,
                   fmts: tuple[str, ...] = ("raw16", "png16"),
                   num_partitions: int | None = None) -> DataFrame:
    """Distributed images-table generator.

    Tiles are *generated on the executors* (one task per tile-row band),
    so world size scales without driver memory pressure — the ingest
    path a 10^12-image table would use, minus the object-store read.
    """
    tiles = [(tx, ty)
             for ty in range(world.ty0, world.ty0 + world.ny)
             for tx in range(world.tx0, world.tx0 + world.nx)]
    nparts = num_partitions or min(len(tiles), max(spark.sparkContext.defaultParallelism, 1))
    tile_df = spark.createDataFrame(tiles, schema="tx long, ty long").repartition(nparts)

    def gen(batches):
        for pdf in batches:
            rows = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                tx, ty = int(tx), int(ty)
                grid = tile_grid(tx, ty)
                fmt = fmts[(tx + ty) % len(fmts)]
                rows.append(
                    {
                        "image_id": f"tile_{tx:05d}_{ty:05d}",
                        "bytes": image_codec.encode(grid, fmt),
                        "w": TILE_PX,
                        "h": TILE_PX,
                        "fmt": fmt,
                        "caption": tile_caption(tx, ty),
                        "phash": image_codec.phash64(grid),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA.fields])

    return tile_df.mapInPandas(gen, schema=IMAGES_SCHEMA)


# --- query-side fixtures (pytest replay inputs; FIXTURES.md §2) -----------

REF_POINT_IN = (13.331302, 38.108433)       # tests/test_api_point.py:8
REF_POINT_OUT = (8.807514373051843, 53.0756845615249)  # :10 (Bremen)
REF_LINE = ((13.331302, 38.108433), (13.331273, 38.10849))  # tests/test_api_line.py:10-11


def make_points_pdf(world: World = DEFAULT_WORLD, n: int = 500, seed: int = 42) -> pd.DataFrame:
    """Replay points: fixture seeds + uniform bulk + 5% outside + 20% skew."""
    rng = np.random.default_rng(seed)
    lon = rng.uniform(world.min_x, world.max_x, n)
    lat = rng.uniform(world.min_y, world.max_y, n)
    n_out = n // 20
    lon[:n_out] = world.max_x + rng.uniform(1.0, 5.0, n_out)  # outside
    n_skew = n // 5
    lon[n_out:n_out + n_skew] = rng.uniform(world.min_x, world.min_x + TILE_DEG, n_skew)
    lat[n_out:n_out + n_skew] = rng.uniform(world.max_y - TILE_DEG, world.max_y, n_skew)
    pdf = pd.DataFrame({"point_id": np.arange(n, dtype=np.int64), "lon": lon, "lat": lat})
    pdf.loc[0, ["lon", "lat"]] = REF_POINT_IN
    pdf.loc[1, ["lon", "lat"]] = REF_POINT_OUT
    return pdf


def make_lines_pdf(world: World = DEFAULT_WORLD, n: int = 200, seed: int = 43) -> pd.DataFrame:
    """Replay 2-vertex lines incl. the reference golden line + degenerates."""
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(world.min_x, world.max_x, n)
    y1 = rng.uniform(world.min_y, world.max_y, n)
    x2 = x1 + rng.uniform(-3 * TILE_DEG, 3 * TILE_DEG, n)
    y2 = y1 + rng.uniform(-3 * TILE_DEG, 3 * TILE_DEG, n)
    pdf = pd.DataFrame({"line_id": np.arange(n, dtype=np.int64),
                        "x1": x1, "y1": y1, "x2": x2, "y2": y2})
    (ax, ay), (bx, by) = REF_LINE
    pdf.loc[0, ["x1", "y1", "x2", "y2"]] = [ax, ay, bx, by]
    pdf.loc[1, ["x1", "y1", "x2", "y2"]] = [ax, ay, ax, ay]  # zero-length
    return pdf

"""Tile index: images table → joinable tile-metadata DataFrame.

The reference keeps georeferencing inside PostGIS raster headers and
relies on ``ST_Intersects(rast, geom)`` envelope tests with **no
spatial index** (``raster2pgsql`` is invoked without ``-I``, reference
``server/db_import/filestreams.py:72``).  We do better by construction:
parse the caption (the GeoTIFF-header stand-in) **JVM-side** with
``from_json``, derive the tile's global grid coordinates and cell id as
pure Column arithmetic, and use that cell id as an equi-join key.

No Python runs in this builder — it is whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import NCELL_X, TILE_DEG, WORLD_X0, WORLD_Y0

CAPTION_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("ul_x", T.DoubleType()),
        T.StructField("ul_y", T.DoubleType()),
        T.StructField("px", T.DoubleType()),
        T.StructField("srid", T.IntegerType()),
        T.StructField("nodata", T.IntegerType()),
    ]
)


def tile_index(images_df: DataFrame, with_bytes: bool = False) -> DataFrame:
    """(image_id, w, h, fmt, ul_x, ul_y, px, tx, ty, cell_id, bbox...).

    ``cell_id`` is the base-resolution linear cell id; because tiles are
    grid-aligned with half-open extents, one tile == one cell and the
    point→tile spatial join becomes an exact equi-join (SURVEY.md §2.3 J1).
    """
    c = F.from_json(F.col("caption"), CAPTION_SCHEMA).alias("c")
    df = images_df.select(
        "image_id", "w", "h", "fmt",
        c.getField("ul_x").alias("ul_x"),
        c.getField("ul_y").alias("ul_y"),
        c.getField("px").alias("px"),
        c.getField("nodata").alias("nodata"),
        *(["bytes"] if with_bytes else []),
    )
    df = (
        df.withColumn("tx", F.round((F.col("ul_x") - F.lit(WORLD_X0)) / F.lit(TILE_DEG)).cast("long"))
        .withColumn("ty", F.round((F.lit(WORLD_Y0) - F.col("ul_y")) / F.lit(TILE_DEG)).cast("long"))
        .withColumn("cell_id", (F.col("ty") * F.lit(NCELL_X) + F.col("tx")).cast("long"))
        .withColumn("min_x", F.col("ul_x"))
        .withColumn("max_x", F.col("ul_x") + F.col("w") * F.col("px"))
        .withColumn("max_y", F.col("ul_y"))
        .withColumn("min_y", F.col("ul_y") - F.col("h") * F.col("px"))
    )
    return df

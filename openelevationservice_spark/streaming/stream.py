"""Structured-Streaming composition of the batch operators.

The reference is strictly request/response (SURVEY.md §2.9) — nothing
streaming is required for parity — but the batch operators are written
``mapInPandas``-first precisely so a ``readStream`` source composes.
This module provides the streaming point-elevation pipeline (a stream
of query points joined against the static tile table) and a windowed
throughput metric stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import NODATA
from ..functions.cells import cell_id_col
from ..operators.point import with_pixel_indices
from ..operators.sample import gather_z_broadcast
from ..sources.tiles import tile_index

POINTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("point_id", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def streaming_point_elevation(points_stream: DataFrame, images_df: DataFrame) -> DataFrame:
    """Stream of points → stream of (point_id, lon, lat, image_id, z).

    stream-static broadcast join (supported in append mode) + the same
    Arrow gather kernel as batch; the tile grids are broadcast once.
    """
    idx = F.broadcast(
        tile_index(images_df).select("cell_id", "image_id", "ul_x", "ul_y", "px", "w", "h")
    )
    pts = points_stream.withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat")))
    j = with_pixel_indices(pts.join(idx, "cell_id", "left"))
    out = gather_z_broadcast(j, images_df)
    z = F.when(F.col("image_id").isNotNull(),
               F.coalesce(F.col("z"), F.lit(NODATA))).otherwise(F.lit(None))
    return out.withColumn("z", z.cast("int")).select(
        "point_id", "lon", "lat", "ts", "image_id", "z"
    )


def windowed_query_counts(points_stream: DataFrame, window: str = "10 seconds",
                          watermark: str = "30 seconds") -> DataFrame:
    """Event-time tumbling-window query counts with late-data watermark."""
    return (
        points_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(F.count(F.lit(1)).alias("n_queries"))
        .select(F.col("window.start").alias("win_start"), "n_queries")
    )

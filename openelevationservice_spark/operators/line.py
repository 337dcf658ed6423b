"""LineString elevation — Spark re-expression of the reference line query.

Reference shape (``server/api/querybuilder.py:167-254``)::

    guard ST_NPoints == 2
    lineLen = hypot(bounds)                       (:197-198, bounds-based)
    frac    = min(1, coord_precision / lineLen)   (:208)
    vertices = {P1} ∪ ST_LineInterpolatePoints(line, frac) ∪ {P2}
             → ST_DumpPoints → DISTINCT           (:201-217)
    JOIN tiles ON ST_Intersects + ST_Value        (:218-221, inner)
    MakePoint(x, y, coalesce(z, -32768))          (:223-227)
    ORDER BY ST_Distance(geom, P1)                (:228-231)
    ST_MakeLine                                   (:238/243)

PostGIS ``ST_LineInterpolatePoints(line, frac)`` (repeat=true) emits
points at t = frac, 2*frac, …, n*frac with n = floor(1/frac).  All of
the densify arithmetic here is JVM Column math (``sequence`` +
``explode`` is the Spark-native table-generating operator, SURVEY.md
§2.4 A5); only the z-gather touches Python via the shared Arrow kernel.

Determinism note: the reference orders only by distance-from-start;
equidistant distinct vertices have planner-dependent order there.  We
order by (dist, x, y) so output is total — documented deviation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import COORD_PRECISION, NODATA
from ..sources.tiles import tile_index
from .point import join_tiles, with_pixel_indices
from .sample import gather_z


def densify_lines(lines_df: DataFrame) -> DataFrame:
    """(line_id, x1, y1, x2, y2) → distinct vertex rows (line_id, x, y, …).

    Exact ``min(1, coord_precision/lineLen)`` fraction semantics with
    bounds-based lineLen (reference ``querybuilder.py:197-209``);
    duplicate vertices removed like the reference's DISTINCT
    (``:217``).  Zero-length lines yield their single point (the
    degenerate case formatted as a POINT downstream,
    reference ``views.py:63-68``).
    """
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    base = (
        lines_df
        .withColumn("line_len", F.sqrt(dx * dx + dy * dy))
        .withColumn(
            "frac",
            F.when(F.col("line_len") == 0.0, F.lit(1.0)).otherwise(
                F.least(F.lit(1.0), F.lit(COORD_PRECISION) / F.col("line_len"))
            ),
        )
        .withColumn(
            "n_interp",
            F.when(F.col("line_len") == 0.0, F.lit(0))
            .otherwise(F.floor(F.lit(1.0) / F.col("frac")))
            .cast("int"),
        )
    )

    endpoints = base.select(
        "line_id", "x1", "y1",
        F.explode(
            F.array(
                F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
                F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
            )
        ).alias("v"),
    ).select("line_id", "x1", "y1", F.col("v.x").alias("x"), F.col("v.y").alias("y"))

    ks = F.when(F.col("n_interp") >= 1, F.sequence(F.lit(1), F.col("n_interp"))).otherwise(
        F.array().cast("array<int>")
    )
    t = F.col("k") * F.col("frac")
    interp = (
        base.select("line_id", "x1", "y1", "x2", "y2", "frac", F.explode(ks).alias("k"))
        .withColumn("t", t)
        .select(
            "line_id", "x1", "y1",
            F.when(F.col("t") >= 1.0, F.col("x2"))
            .otherwise(F.col("x1") + F.col("t") * (F.col("x2") - F.col("x1")))
            .alias("x"),
            F.when(F.col("t") >= 1.0, F.col("y2"))
            .otherwise(F.col("y1") + F.col("t") * (F.col("y2") - F.col("y1")))
            .alias("y"),
        )
    )

    return endpoints.unionByName(interp).dropDuplicates(["line_id", "x", "y"])


def line_vertices_elevation(lines_df: DataFrame, images_df: DataFrame,
                            how: str = "inner",
                            index_strategy: str = "broadcast",
                            gather_strategy: str = "broadcast") -> DataFrame:
    """Densified vertices with z and a deterministic order index ``seq``.

    Output: (line_id, seq, x, y, z, dist, image_id, ix, iy).
    """
    verts = densify_lines(lines_df)
    idx = tile_index(images_df)
    j = join_tiles(verts, idx, how=how, index_strategy=index_strategy,
                   lon="x", lat="y")
    j = with_pixel_indices(j, lon="x", lat="y")
    out = gather_z(j, images_df, strategy=gather_strategy)
    ddx = F.col("x") - F.col("x1")
    ddy = F.col("y") - F.col("y1")
    out = out.withColumn("dist", F.sqrt(ddx * ddx + ddy * ddy))
    w = Window.partitionBy("line_id").orderBy("dist", "x", "y")
    z = F.when(F.col("image_id").isNotNull(),
               F.coalesce(F.col("z"), F.lit(NODATA))).otherwise(F.lit(None))
    return (
        out.withColumn("z", z.cast("int"))
        .withColumn("seq", F.row_number().over(w))
        .select("line_id", "seq", "x", "y", "z", "dist", "image_id", "ix", "iy")
    )


def line_elevation(lines_df: DataFrame, images_df: DataFrame,
                   index_strategy: str = "broadcast",
                   gather_strategy: str = "broadcast") -> DataFrame:
    """Assembled 3-D lines: (line_id, n_vertices, is_degenerate_point, vertices).

    ``vertices`` is the ordered array of (x, y, z) structs —
    ``ST_MakeLine`` as an order-defined aggregation (SURVEY.md §2.4 A7).
    A single surviving vertex marks the zero-length-line fixup
    (reference ``views.py:63-68``).
    """
    v = line_vertices_elevation(lines_df, images_df,
                                index_strategy=index_strategy,
                                gather_strategy=gather_strategy)
    pt = F.struct(F.col("dist"), F.col("x"), F.col("y"), F.col("z"))
    return (
        v.groupBy("line_id")
        .agg(F.sort_array(F.collect_list(pt)).alias("pts"))
        .select(
            "line_id",
            F.size("pts").alias("n_vertices"),
            (F.size("pts") == 1).alias("is_degenerate_point"),
            F.transform(
                "pts",
                lambda p: F.struct(p.x.alias("x"), p.y.alias("y"), p.z.alias("z")),
            ).alias("vertices"),
        )
    )

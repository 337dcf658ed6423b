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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import COORD_PRECISION, NODATA
from ..sources.tiles import tile_index
from .point import join_tiles, with_pixel_indices
from .sample import gather_z


def _vertex_array() -> "F.Column":
    """Per-line vertex array: endpoints ∪ interpolated, deduped, sorted.

    The entire densify→union→DISTINCT→order pipeline of the reference
    (``querybuilder.py:201-232``) folds into **per-row array
    expressions** — ``sequence``/``transform`` generate, ``concat`` +
    ``array_distinct`` dedupe, ``array_sort`` with a (dist, x, y)
    comparator orders — so the logical plan has ZERO shuffles before
    the tile join.  Correct because DISTINCT and ORDER BY in the
    reference query are scoped to one line; per-line arrays are small
    (the reference caps lines at maximum_nodes=2000 vertices).
    """
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    line_len = F.sqrt(dx * dx + dy * dy)
    frac = F.when(line_len == 0.0, F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), F.lit(COORD_PRECISION) / line_len)
    )
    n_interp = (
        F.when(line_len == 0.0, F.lit(0))
        .otherwise(F.floor(F.lit(1.0) / frac))
        .cast("int")
    )

    def pt(x, y):
        return F.struct(x.alias("x"), y.alias("y"))

    def interp_pt(k):
        t = k * frac
        return pt(
            F.when(t >= 1.0, F.col("x2")).otherwise(F.col("x1") + t * dx),
            F.when(t >= 1.0, F.col("y2")).otherwise(F.col("y1") + t * dy),
        )

    ks = F.when(n_interp >= 1, F.sequence(F.lit(1), n_interp)).otherwise(
        F.array().cast("array<int>")
    )
    verts = F.concat(
        F.array(pt(F.col("x1"), F.col("y1")), pt(F.col("x2"), F.col("y2"))),
        F.transform(ks, interp_pt),
    )
    verts = F.array_distinct(verts)

    # order key: struct field order is the sort order for array_sort's
    # NATURAL (codegen'd) ordering — (dist, x, y) structs sort exactly
    # like the reference's ORDER BY distance-from-start with our (x, y)
    # tie-break, no interpreted comparator lambda needed.  dist is a
    # function of (x, y), so dedupe-before vs after is equivalent.
    def with_dist(v):
        ddx = v.getField("x") - F.col("x1")
        ddy = v.getField("y") - F.col("y1")
        return F.struct(
            F.sqrt(ddx * ddx + ddy * ddy).alias("dist"),
            v.getField("x").alias("x"),
            v.getField("y").alias("y"),
        )

    return F.array_sort(F.transform(verts, with_dist))


def densify_lines(lines_df: DataFrame) -> DataFrame:
    """(line_id, x1, y1, x2, y2) → distinct vertex rows (line_id, x, y, …).

    Exact ``min(1, coord_precision/lineLen)`` fraction semantics with
    bounds-based lineLen (reference ``querybuilder.py:197-209``);
    duplicate vertices removed like the reference's DISTINCT
    (``:217``), ordered by distance-from-start with a (x, y)
    tie-break, all inside per-line arrays (no shuffle).  ``seq`` is
    1-based vertex order.  Zero-length lines yield their single point
    (the degenerate case formatted as a POINT downstream, reference
    ``views.py:63-68``).
    """
    v = lines_df.select(
        "line_id", "x1", "y1",
        F.posexplode(_vertex_array()).alias("pos", "v"),
    )
    return v.select(
        "line_id", "x1", "y1",
        (F.col("pos") + 1).alias("seq"),
        F.col("v.x").alias("x"),
        F.col("v.y").alias("y"),
        F.col("v.dist").alias("dist"),
    )


def line_vertices_elevation(lines_df: DataFrame, images_df: DataFrame,
                            how: str = "inner",
                            index_strategy: str = "broadcast",
                            gather_strategy: str = "jvm",
                            grids_bc=None,
                            pix_index_df: DataFrame | None = None) -> DataFrame:
    """Densified vertices with z and a deterministic order index ``seq``.

    Output: (line_id, seq, x, y, z, dist, image_id, ix, iy).  ``seq``
    is assigned over the full deduped vertex set *before* the coverage
    join, so under ``how='inner'`` out-of-coverage vertices leave gaps
    in seq (order is unaffected; the reference emits survivors in the
    same distance order).
    """
    verts = densify_lines(lines_df)
    if gather_strategy == "jvm":
        from .sample import gather_z_jvm, pixel_index

        idx = pix_index_df if pix_index_df is not None else pixel_index(images_df)
        j = join_tiles(verts, idx, how=how, index_strategy=index_strategy,
                       lon="x", lat="y", extra_cols=("pix",))
        j = with_pixel_indices(j, lon="x", lat="y")
        j = j.select("line_id", "seq", "x", "y", "dist",
                     "image_id", "w", "h", "ix", "iy", "pix")
        out = gather_z_jvm(j).drop("w", "h")
    else:
        idx = tile_index(images_df)
        j = join_tiles(verts, idx, how=how, index_strategy=index_strategy,
                       lon="x", lat="y")
        j = with_pixel_indices(j, lon="x", lat="y")
        # dist came with the vertex structs — prune the tile metadata so
        # the Arrow batches stay narrow
        j = j.select("line_id", "seq", "x", "y", "dist", "image_id", "ix", "iy")
        out = gather_z(j, images_df, strategy=gather_strategy, grids_bc=grids_bc)
    z = F.when(F.col("image_id").isNotNull(),
               F.coalesce(F.col("z"), F.lit(NODATA))).otherwise(F.lit(None))
    return (
        out.withColumn("z", z.cast("int"))
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

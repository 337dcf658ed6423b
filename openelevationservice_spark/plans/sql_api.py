"""SQL surface: the engine's cell/pixel arithmetic as SQL functions.

SURVEY.md §2.10: the reference's only extension surface is raw SQL
``text()`` blocks; our equivalent is first-class — Spark 4 SQL scalar
UDFs (``CREATE TEMPORARY FUNCTION … RETURN <expr>``, resolved by
Catalyst and codegen'd like any Column expression, NOT python UDFs)
plus temp views, so the whole point-elevation join is expressible in
plain ``spark.sql``.  The function bodies are the exact arithmetic of
``functions/cells.py`` / ``operators/point.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..constants import NCELL_X, TILE_DEG, WORLD_X0, WORLD_Y0


def register_sql_functions(spark: SparkSession) -> None:
    """CREATE TEMPORARY FUNCTION for the cell / pixel index algebra."""
    td = repr(TILE_DEG)
    x0 = repr(WORLD_X0)
    y0 = repr(WORLD_Y0)
    stmts = [
        f"""CREATE OR REPLACE TEMPORARY FUNCTION oes_tile_x(lon DOUBLE)
            RETURNS BIGINT RETURN CAST(floor((lon - {x0}) / {td}) AS BIGINT)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION oes_tile_y(lat DOUBLE)
            RETURNS BIGINT RETURN CAST(floor(({y0} - lat) / {td}) AS BIGINT)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION oes_cell_id(lon DOUBLE, lat DOUBLE)
            RETURNS BIGINT
            RETURN oes_tile_y(lat) * {NCELL_X} + oes_tile_x(lon)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION oes_pixel_ix(lon DOUBLE, ul_x DOUBLE, px DOUBLE)
            RETURNS INT RETURN CAST(floor((lon - ul_x) / px) AS INT)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION oes_pixel_iy(lat DOUBLE, ul_y DOUBLE, px DOUBLE)
            RETURNS INT RETURN CAST(floor((ul_y - lat) / px) AS INT)""",
    ]
    for stmt in stmts:
        spark.sql(stmt)


POINT_ELEVATION_SQL = """
SELECT p.point_id, p.lon, p.lat, t.image_id,
       oes_pixel_ix(p.lon, t.ul_x, t.px) AS ix,
       oes_pixel_iy(p.lat, t.ul_y, t.px) AS iy,
       CASE WHEN t.image_id IS NOT NULL THEN
         coalesce(element_at(t.pix,
           oes_pixel_iy(p.lat, t.ul_y, t.px) * t.w
             + oes_pixel_ix(p.lon, t.ul_x, t.px) + 1), -32768)
       END AS z
FROM {points} p
LEFT JOIN {pix_index} t
  ON oes_cell_id(p.lon, p.lat) = t.cell_id
"""


def sql_point_elevation(spark: SparkSession, points_df: DataFrame,
                        images_df: DataFrame) -> DataFrame:
    """The flagship point query, written entirely in SQL over temp views.

    Same logical plan as ``operators.point.point_elevation`` (cell-id
    equi-join + JVM ``element_at`` gather) — parity is asserted in
    tests/test_sql_api.py.
    """
    from ..operators.sample import pixel_index

    register_sql_functions(spark)
    points_df.createOrReplaceTempView("oes_points")
    pixel_index(images_df).createOrReplaceTempView("oes_pix_index")
    return spark.sql(POINT_ELEVATION_SQL.format(
        points="oes_points", pix_index="oes_pix_index"
    ))

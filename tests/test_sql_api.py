"""SQL surface: SQL UDFs + spark.sql point query == DataFrame operator."""

import numpy as np
import pandas as pd

from openelevationservice_spark.functions import cells
from openelevationservice_spark.plans.sql_api import (
    register_sql_functions,
    sql_point_elevation,
)
from openelevationservice_spark.operators.point import point_elevation
from openelevationservice_spark.sources import fixtures as fx


def test_sql_functions_match_numpy(spark):
    register_sql_functions(spark)
    pts = [(13.331302, 38.108433), (-0.5, 51.2), (150.0, -33.8)]
    for lon, lat in pts:
        row = spark.sql(
            f"SELECT oes_tile_x({lon!r}) AS tx, oes_tile_y({lat!r}) AS ty, "
            f"oes_cell_id({lon!r}, {lat!r}) AS cid"
        ).collect()[0]
        cx, cy = cells.cell_xy(np.array([lon]), np.array([lat]))
        assert row["tx"] == cx[0] and row["ty"] == cy[0]
        assert row["cid"] == cells.linear_id(cx, cy)[0]


def test_sql_point_query_matches_operator(spark):
    world = fx.World(nx=3, ny=3)
    images = spark.createDataFrame(fx.make_images_pdf(world), schema=fx.IMAGES_SCHEMA)
    pdf = fx.make_points_pdf(world, n=200)
    pts = spark.createDataFrame(pdf)
    via_sql = sql_point_elevation(spark, pts, images).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    via_df = point_elevation(pts, images, how="left").toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert len(via_sql) == len(via_df) == len(pdf)
    for c in ("image_id", "z"):
        a = via_sql[c].astype(object).where(pd.notna(via_sql[c]), None)
        b = via_df[c].astype(object).where(pd.notna(via_df[c]), None)
        assert list(a) == list(b), c
    # plan shape: still a broadcast/shuffle HASH equi-join, never a cross join
    plan = sql_point_elevation(spark, pts, images)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" in plan and "CartesianProduct" not in plan

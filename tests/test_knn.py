import numpy as np
import pandas as pd
import pytest

from openelevationservice_spark.constants import NODATA, TILE_DEG
from openelevationservice_spark.operators.knn import knn_tiles
from openelevationservice_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def world():
    return fx.World(nx=3, ny=3)


@pytest.fixture(scope="module")
def images(spark, world):
    df = spark.createDataFrame(fx.make_images_pdf(world), schema=fx.IMAGES_SCHEMA)
    df.persist()
    df.count()
    return df


def test_inside_point_dist_zero(spark, world, images):
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0],
        "lon": [world.min_x + 1.5 * TILE_DEG],
        "lat": [world.max_y - 1.5 * TILE_DEG],
    }))
    out = knn_tiles(pts, images, k=1).toPandas()
    assert len(out) == 1
    assert out.dist_deg[0] == 0.0
    assert out.image_id[0] == f"tile_{world.tx0 + 1:05d}_{world.ty0 + 1:05d}"
    assert out.z[0] != NODATA


def test_offgrid_point_east_of_world(spark, world, images):
    # half a tile east of coverage → nearest tile is rightmost column
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0],
        "lon": [world.max_x + 0.5 * TILE_DEG],
        "lat": [world.max_y - 1.5 * TILE_DEG],
    }))
    out = knn_tiles(pts, images, k=3).toPandas().sort_values("rank")
    assert len(out) == 3
    assert out.iloc[0].image_id == f"tile_{world.tx0 + 2:05d}_{world.ty0 + 1:05d}"
    assert abs(out.iloc[0].dist_deg - 0.5 * TILE_DEG) < 1e-9
    # k-th neighbours are the vertical neighbours of the same column
    assert set(out.image_id[1:]) <= {
        f"tile_{world.tx0 + 2:05d}_{world.ty0 + 0:05d}",
        f"tile_{world.tx0 + 2:05d}_{world.ty0 + 2:05d}",
    }
    # sampled z comes from the clamped eastmost pixel column of that tile
    assert out.iloc[0].ix == 49


def test_point_beyond_max_rings_absent(spark, world, images):
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0],
        "lon": [world.max_x + 10 * TILE_DEG],
        "lat": [world.max_y - 1.5 * TILE_DEG],
    }))
    assert knn_tiles(pts, images, k=1, max_rings=2).count() == 0


def test_corner_point_ranks_by_distance(spark, world, images):
    # NE of the NE corner: nearest is corner tile, then its two edge
    # neighbours at equal distance (tie broken by image_id), then diagonal
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [7],
        "lon": [world.max_x + 0.25 * TILE_DEG],
        "lat": [world.max_y + 0.25 * TILE_DEG],
    }))
    out = knn_tiles(pts, images, k=4, max_rings=2).toPandas().sort_values("rank")
    assert out.iloc[0].image_id == f"tile_{world.tx0 + 2:05d}_{world.ty0:05d}"
    d = out.dist_deg.to_numpy()
    assert (np.diff(d) >= -1e-12).all()

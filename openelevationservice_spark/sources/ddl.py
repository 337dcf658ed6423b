"""Table DDL surface — the reference's ``flask create`` / ``flask drop``.

Reference ``manage.py:29-42`` creates/drops the ``oes_cgiar`` raster
table via ``db.create_all()`` / ``db.drop_all()`` (model
``db_import/models.py:15-21``).  Spark-first equivalent: a catalog
table with the image+caption schema (BASELINE.json ``input_hint``),
created with plain ``spark.sql("CREATE TABLE ... USING parquet")`` so
it lives in the session catalog / warehouse and is queryable by name.
With an Iceberg catalog on the classpath the same statements work with
``USING iceberg`` (pass ``using="iceberg"``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the input_hint schema: image+caption pairs (SURVEY.md §1.3)
TILE_TABLE_SCHEMA = (
    "image_id STRING, bytes BINARY, w INT, h INT, "
    "fmt STRING, caption STRING, phash BIGINT"
)
DEFAULT_TABLE = "oes_cgiar"  # reference models.py:16


def _check_ident(name: str) -> str:
    if not name.replace("_", "").replace(".", "").isalnum():
        raise ValueError(f"invalid table identifier: {name!r}")
    return name


def create_tiles_table(spark: SparkSession, name: str = DEFAULT_TABLE,
                       using: str = "parquet") -> None:
    """``flask create`` (manage.py:29-35): idempotent CREATE TABLE."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {_check_ident(name)} "
        f"({TILE_TABLE_SCHEMA}) USING {_check_ident(using)}"
    )


def drop_tiles_table(spark: SparkSession, name: str = DEFAULT_TABLE) -> None:
    """``flask drop`` (manage.py:38-42)."""
    spark.sql(f"DROP TABLE IF EXISTS {_check_ident(name)}")


def import_tiles(images_df: DataFrame, name: str = DEFAULT_TABLE) -> None:
    """Append an image batch into the catalog table — the raster2pgsql
    ``-a`` (append) import step (``filestreams.py:72``); tiling/padding
    is the fixture generator's job, Morton clustering the tile-index
    writer's (sources/tiles.py)."""
    images_df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash") \
        .write.mode("append").insertInto(_check_ident(name))


def read_tiles_table(spark: SparkSession, name: str = DEFAULT_TABLE) -> DataFrame:
    return spark.table(_check_ident(name))

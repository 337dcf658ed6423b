"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``openelevationservice_spark.contract`` — one
entry per operator family from SURVEY.md §2 plus the training-data
pipeline operators (dedup / similarity / text analysis); each Spark
query has a float-exact ANSI-SQL twin (see contract.py's exactness
discipline notes).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from openelevationservice_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: point-elevation replay —
    customer-derived points spatially joined to the synthetic 256-tile
    image table (decode → ST_Value-sample → coalesce)."""
    return contract.q_point_elevation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.oracle_sql())

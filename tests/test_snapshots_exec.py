import json
import os

import pytest

from pyspark.sql import functions as F

from openelevationservice_spark.plans import exec as ex
from openelevationservice_spark.sources.snapshots import SnapshotStore


@pytest.fixture
def store(tmp_path):
    return SnapshotStore(root=str(tmp_path / "snaps"))


def test_snapshot_write_and_manifest(spark, store):
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    m = store.write(df, "stage_a", params={"p": 1})
    assert m["total_rows"] == 1000
    assert sum(p["rows"] for p in m["partitions"]) == 1000
    assert all("partition_id" in p for p in m["partitions"])
    assert os.path.exists(os.path.join(m["path"], "_manifest.json"))
    back = store.read(spark, "stage_a")
    assert back.count() == 1000


def test_run_stage_resumes_on_same_params(spark, store):
    calls = []

    def build():
        calls.append(1)
        return spark.range(10)

    df1, m1 = store.run_stage(spark, "s", {"x": 1}, build)
    df2, m2 = store.run_stage(spark, "s", {"x": 1}, build)
    assert len(calls) == 1          # second call resumed, build skipped
    assert m2["resumed"] and not m1["resumed"]
    assert m2["snapshot_id"] == m1["snapshot_id"]
    df3, m3 = store.run_stage(spark, "s", {"x": 2}, build)
    assert len(calls) == 2          # params change invalidates
    assert not m3["resumed"]


def test_run_stage_lineage_inputs(spark, store):
    df, m_a = store.run_stage(spark, "a", {}, lambda: spark.range(5))
    df_b, m_b = store.run_stage(spark, "b", {}, lambda: spark.range(3),
                                inputs=[m_a["snapshot_id"]])
    assert m_b["inputs"] == [m_a["snapshot_id"]]
    # changing the input snapshot id invalidates downstream
    df_b2, m_b2 = store.run_stage(spark, "b", {}, lambda: spark.range(3),
                                  inputs=["other"])
    assert not m_b2["resumed"]


def test_salted_repartition_splits_hot_key(spark):
    df = spark.range(10000).withColumn("key", F.lit("hot"))
    salted = ex.with_salt(df, 8)
    n = salted.select("salt").distinct().count()
    assert n == 8


def test_two_phase_count(spark):
    df = spark.range(1000).withColumn("key", (F.col("id") % 3).cast("string"))
    got = {r["key"]: r["count"] for r in ex.two_phase_count(df, "key").collect()}
    assert got == {"0": 334, "1": 333, "2": 333}


def test_plan_assertions(spark):
    small = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(1000).withColumnRenamed("id", "k")
    j = big.join(F.broadcast(small), "k")
    ex.assert_broadcast_join(j)
    ex.assert_no_cartesian(j)
    with pytest.raises(AssertionError):
        ex.assert_no_cartesian(big.crossJoin(small.withColumnRenamed("k", "k2")))


def test_iceberg_flag_falls_back_without_catalog(spark, tmp_path):
    """iceberg_catalog set but no Iceberg runtime on this classpath →
    the write must fall back to the parquet snapshot and say so."""
    from openelevationservice_spark.sources.snapshots import SnapshotStore
    st = SnapshotStore(str(tmp_path / "snaps"), iceberg_catalog="nosuch")
    df = spark.range(100)
    m = st.write(df, "ice_stage", params={"p": 1})
    assert m["format"] == "parquet"
    assert m["iceberg_fallback"] is True
    assert m["iceberg_table"] is None
    assert m["iceberg_error"]  # the actual failure is recorded, not swallowed
    assert m["total_rows"] == 100
    assert st.read(spark, "ice_stage").count() == 100


def test_manifest_counts_match_footers(spark, store):
    df = spark.range(0, 777).repartition(7)
    m = store.write(df, "counts")
    assert m["total_rows"] == 777
    assert len(m["partitions"]) >= 1
    assert sum(p["rows"] for p in m["partitions"]) == 777
    assert m["iceberg_fallback"] is False


@pytest.fixture(scope="module")
def world_images(spark):
    from openelevationservice_spark.sources import fixtures as fx
    df = fx.make_images_df(spark, fx.World(nx=3, ny=3))
    df.persist()
    df.count()
    return df


def test_ddl_create_import_drop(spark, world_images):
    """S4: CREATE TABLE / append-import / DROP via spark.sql, mirroring
    the reference's flask create / raster2pgsql -a / flask drop."""
    from openelevationservice_spark.sources import ddl
    name = "oes_cgiar_test_ddl"
    ddl.drop_tiles_table(spark, name)
    ddl.create_tiles_table(spark, name)
    ddl.create_tiles_table(spark, name)          # idempotent
    ddl.import_tiles(world_images, name)
    back = ddl.read_tiles_table(spark, name)
    assert back.count() == world_images.count()
    assert set(back.columns) == {"image_id", "bytes", "w", "h",
                                 "fmt", "caption", "phash"}
    ddl.import_tiles(world_images, name)         # append semantics
    assert ddl.read_tiles_table(spark, name).count() == 2 * world_images.count()
    ddl.drop_tiles_table(spark, name)
    assert name not in [t.name for t in spark.catalog.listTables()]

"""Dump .explain("formatted") for every bench query to plans/r06/.

Usage: python BENCH/dump_plans_r06.py before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as B
from openelevationservice_spark.operators import dedup, similarity
from openelevationservice_spark.operators.color import polygon_color_invariants
from openelevationservice_spark.operators.line import line_vertices_elevation
from openelevationservice_spark.operators.multimodal import image_metadata
from openelevationservice_spark.operators.point import point_elevation
from openelevationservice_spark.operators.polygon import polygon_pixels
from openelevationservice_spark.operators.sample import pixel_index
from openelevationservice_spark.plans.session import build_session
from openelevationservice_spark.sources import fixtures as fx


def main() -> None:
    tag = sys.argv[1]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app="plans-r06", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))

    images = fx.make_images_df(spark, B.BENCH_WORLD)
    images.persist(); images.count()
    pix = pixel_index(images); pix.persist(); pix.count()
    li = B._cached(spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])
    orders = B._cached(spark, sf_dir, "orders", ["o_orderkey"])
    supplier = B._cached(spark, sf_dir, "supplier", ["s_suppkey"])
    docs = B._cached(spark, sf_dir, "documents", ["doc_id", "text"])
    emb = B._cached(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    docs_big = B._docs_big(docs).repartition(B._parts(spark))
    docs_big.persist(); docs_big.count()
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"),
                                               F.col("embedding").alias("q_vec"))
    emb_big = (emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(B.ANN_MULT - 1))))
               .select((F.col("vec_id") * B.ANN_MULT + F.col("rep")).alias("vec_id"),
                       "embedding")
               .repartition(B._parts(spark)))
    emb_big = similarity.pack_vectors(emb_big, "embedding")
    emb_big.persist(); emb_big.count()
    imgs_big = images.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(B.TILE_REPS - 1)))
    ).withColumn("image_id", F.concat_ws("#", "image_id", "rep")).drop("rep")
    imgs_big = imgs_big.repartition(B._parts(spark))
    imgs_big.persist(); imgs_big.count()

    dfs = {
        "point_replay": point_elevation(B._points_from_lineitem(li), images,
                                        pix_index_df=pix),
        "line_replay": line_vertices_elevation(B._lines_from_orders(orders), images,
                                               pix_index_df=pix),
        "polygon_dump": polygon_pixels(B._polygons_from_supplier(supplier), images),
        "tile_ingest_stats": image_metadata(imgs_big),
        "color_dissolve": polygon_color_invariants(
            B._polygons_from_supplier(supplier, B.DISSOLVE_REPLICAS), images),
        "minhash_lsh": dedup.lsh_candidate_pairs(docs_big, n_hashes=8, bands=4),
        "dedup_clusters": dedup.dedup_clusters(docs_big, n_hashes=8, bands=4),
        "ann_topk": similarity.cosine_topk(emb_big, q, k=10),
    }
    for name, df in dfs.items():
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

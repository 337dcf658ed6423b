"""Round-6 decomposition: color_dissolve + dedup_clusters stage shares.

Interleaved, fresh-plan-per-rep (bench honesty rules), noop-style
counts.  Usage:  python BENCH/profile_r06.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as B
from openelevationservice_spark.operators import dedup
from openelevationservice_spark.operators.color import (
    _banded_subruns, polygon_color_invariants)
from openelevationservice_spark.operators.polygon import (
    polygon_pixel_runs, runs_stats)
from openelevationservice_spark.plans.cache import release_all
from openelevationservice_spark.plans.session import build_session
from openelevationservice_spark.sources import fixtures as fx


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = build_session(app="profile-r06", cpus=cpus)
    sc = spark.sparkContext

    images = fx.make_images_df(spark, B.BENCH_WORLD)
    images.persist(); images.count()
    supplier = B._cached(spark, sf_dir, "supplier", ["s_suppkey"])
    docs = B._cached(spark, sf_dir, "documents", ["doc_id", "text"])
    docs_big = B._docs_big(docs).repartition(B._parts(spark))
    docs_big.persist(); docs_big.count()

    polys = lambda: B._polygons_from_supplier(supplier, B.DISSOLVE_REPLICAS)

    def runs_only():
        r = polygon_pixel_runs(polys(), images)
        noop(r)

    def runs_and_stats():
        r = polygon_pixel_runs(polys(), images)
        r.persist()
        noop(r)
        runs_stats(r).select("poly_id", "min_z", "max_z").collect()
        r.unpersist()

    def subruns_kernel():
        # stats + band-split kernel output, NO repartition/collect_list
        r = polygon_pixel_runs(polys(), images)
        r.persist()
        stats = runs_stats(r).select("poly_id", "min_z", "max_z")
        from openelevationservice_spark.operators.color import (
            SUBRUN_SCHEMA, _band_subrun_kernel)
        j = r.join(F.broadcast(stats), "poly_id")
        subs = j.mapInPandas(_band_subrun_kernel(23), SUBRUN_SCHEMA)
        noop(subs)
        r.unpersist()

    def banded():
        r = polygon_pixel_runs(polys(), images)
        r.persist()
        noop(_banded_subruns(r, 23))
        r.unpersist()

    def full():
        polygon_color_invariants(polys(), images).count()
        release_all()

    def lsh():
        dedup.lsh_candidate_pairs(docs_big, n_hashes=8, bands=4).count()

    def lsh_sig():
        dedup.minhash_signature(docs_big, n_hashes=8).agg(
            F.count(F.lit(1)), F.sum(F.element_at("sig", 1))).collect()

    def clusters():
        dedup.dedup_clusters(docs_big, n_hashes=8, bands=4).count()

    def cc_only():
        # pairs precomputed+persisted OUTSIDE timing: isolates CC + sizes
        pairs = dedup.lsh_candidate_pairs(docs_big, n_hashes=8, bands=4)
        pairs.persist(); pairs.count()
        t0 = time.perf_counter()
        cc = dedup.connected_components(pairs, docs_big.select("doc_id"), "doc_id")
        from pyspark.sql import Window
        cc.select("doc_id", "rep_id",
                  F.count(F.lit(1)).over(Window.partitionBy("rep_id"))
                  .alias("cluster_size")).count()
        dt = time.perf_counter() - t0
        pairs.unpersist()
        return dt

    probes = [
        ("dissolve: runs build", runs_only),
        ("dissolve: + stats", runs_and_stats),
        ("dissolve: + bandsplit kernel", subruns_kernel),
        ("dissolve: + exchange+collect_list", banded),
        ("dissolve: full invariants", full),
        ("minhash: signature only", lsh_sig),
        ("minhash: full lsh pairs", lsh),
        ("dedup: full clusters", clusters),
    ]
    results = {name: [] for name, _ in probes}
    results["dedup: cc+sizes off cached pairs"] = []
    for fn in [f for _, f in probes]:  # one untimed warm-up pass
        fn()
    results["dedup: cc+sizes off cached pairs"].append(cc_only())
    for _ in range(reps):
        for name, fn in probes:
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            results[name].append(time.perf_counter() - t0)
        results["dedup: cc+sizes off cached pairs"].append(cc_only())
    with open("/proc/loadavg") as f:
        load = f.read().strip()
    print(f"loadavg-at-end {load}")
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"{name:40s} min={ts[0]:6.3f} med={ts[len(ts)//2]:6.3f} all={[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

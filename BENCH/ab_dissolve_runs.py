"""Interleaved A/B: runs-resident dissolve (band-split subruns, r5)
vs the exploded-pixel twin, full invariants query at bench volume.

Usage: SPARK_GRAFT_CPUS=32 python BENCH/ab_dissolve_runs.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from openelevationservice_spark.operators.color import (  # noqa: E402
    polygon_color_invariants,
)
from openelevationservice_spark.plans.session import build_session  # noqa: E402
from openelevationservice_spark.sources import fixtures as fx  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("OES_AB_ROUNDS", "4"))
    spark = build_session(app="ab-dissolve-runs", cpus=cpus)
    images = fx.make_images_df(spark, bench.BENCH_WORLD)
    images.persist()
    images.count()
    supplier = bench._cached(spark, sf, "supplier", ["s_suppkey"])
    polys = bench._polygons_from_supplier(supplier, bench.DISSOLVE_REPLICAS)

    variants = {
        "pixels": lambda: polygon_color_invariants(
            polys, images, cells_shape="pixels").count(),
        "subruns": lambda: polygon_color_invariants(polys, images).count(),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for fn in variants.values():
        fn()  # warm-up
    for _ in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    spark.stop()
    print(json.dumps({
        "cpus": cpus,
        "min_sec": {k: round(min(v), 3) for k, v in times.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

"""Decompose color_dissolve's wall time by swapping the python kernel
inside the REAL pipeline plan (pixel dump → stats → band columns →
explicit-count exchange → sorted stream → kernel), interleaved minima.

Variants:
  jvm_only  — banded.count(): the plan up to (excluding) the python stage
  transfer  — kernel consumes Arrow batches, no grouping, no compute
  stream    — + sorted-group streaming (pandas slicing), no np compute
  quads     — stream + quad_counts per group
  trace     — stream + dissolve_pixels_rings per group
  full      — the shipped invariants kernel (trace + quads + asserts)

Usage: SPARK_GRAFT_CPUS=32 python BENCH/profile_dissolve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

import bench  # noqa: E402
from openelevationservice_spark.functions.dissolve import (  # noqa: E402
    dissolve_pixels_rings, quad_counts,
)
from openelevationservice_spark.operators import color  # noqa: E402
from openelevationservice_spark.plans.session import build_session  # noqa: E402
from openelevationservice_spark.sources import fixtures as fx  # noqa: E402

COUNT_SCHEMA = "poly_id long, height_base long, area_px long, euler4 long, euler8 long"


def _iter_sorted_groups(batches):
    """The r2-r4 sorted-group streamer (kept here as the historical
    comparator — production moved to per-band collect_list rows)."""
    import numpy as np
    pending = []
    cur_key = None
    for pdf in batches:
        if not len(pdf):
            continue
        pid = pdf["poly_id"].to_numpy()
        hb = pdf["height_base"].to_numpy()
        change = np.flatnonzero((pid[1:] != pid[:-1]) | (hb[1:] != hb[:-1])) + 1
        bounds = np.concatenate(([0], change, [len(pdf)]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            key = (pid[s], hb[s])
            if cur_key is not None and key != cur_key:
                yield pending[0] if len(pending) == 1 else pd.concat(pending, ignore_index=True)
                pending = []
            cur_key = key
            pending.append(pdf.iloc[s:e])
    if pending:
        yield pending[0] if len(pending) == 1 else pd.concat(pending, ignore_index=True)


def _k_transfer(batches):
    n = 0
    for pdf in batches:
        n += len(pdf)
    yield pd.DataFrame({"poly_id": [n], "height_base": [0], "area_px": [0],
                        "euler4": [0], "euler8": [0]})


def _group_rows(g):
    return {"poly_id": int(g["poly_id"].iloc[0]),
            "height_base": int(g["height_base"].iloc[0]),
            "area_px": len(g), "euler4": 0, "euler8": 0}


def _k_stream(batches):
    rows = [_group_rows(g) for g in _iter_sorted_groups(batches)]
    yield pd.DataFrame(rows, columns=["poly_id", "height_base", "area_px",
                                      "euler4", "euler8"])


def _k_quads(batches):
    rows = []
    for g in _iter_sorted_groups(batches):
        r = _group_rows(g)
        q1, q3, qd = quad_counts(g["gx"].to_numpy(), g["gy"].to_numpy())
        r["euler4"] = (q1 - q3 + 2 * qd) // 4
        rows.append(r)
    yield pd.DataFrame(rows, columns=["poly_id", "height_base", "area_px",
                                      "euler4", "euler8"])


def _k_trace(batches):
    rows = []
    for g in _iter_sorted_groups(batches):
        r = _group_rows(g)
        polys, areas = dissolve_pixels_rings(g["gx"].to_numpy(), g["gy"].to_numpy())
        r["area_px"] = sum(a for ar in areas for a in ar) // 2
        rows.append(r)
    yield pd.DataFrame(rows, columns=["poly_id", "height_base", "area_px",
                                      "euler4", "euler8"])


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("OES_AB_ROUNDS", "3"))
    spark = build_session(app="prof-dissolve", cpus=cpus)
    images = fx.make_images_df(spark, bench.BENCH_WORLD)
    images.persist()
    images.count()
    supplier = bench._cached(spark, sf, "supplier", ["s_suppkey"])
    polys = bench._polygons_from_supplier(supplier, bench.DISSOLVE_REPLICAS)

    def banded_plan():
        from openelevationservice_spark.operators.polygon import polygon_pixels
        from openelevationservice_spark.plans.cache import lease
        pixels = polygon_pixels(polys, images)
        lease("prof_dissolve", pixels)
        stats = color.polygon_stats(pixels)
        banded = color.with_height_base(pixels, stats)
        return (banded.select("poly_id", "height_base", "gx", "gy")
                .repartition(color._dissolve_partitions(banded),
                             "poly_id", "height_base")
                .sortWithinPartitions("poly_id", "height_base"))

    def banded_packed():
        """3-column shape: (poly_id, height_base, gxy) with gx,gy packed
        into one long — fewer per-value Arrow/shuffle writes."""
        from pyspark.sql import functions as F
        from openelevationservice_spark.operators.polygon import polygon_pixels
        from openelevationservice_spark.plans.cache import lease
        pixels = polygon_pixels(polys, images)
        lease("prof_dissolve", pixels)
        stats = color.polygon_stats(pixels)
        banded = color.with_height_base(pixels, stats)
        gxy = (F.col("gx").cast("long") * F.lit(4294967296) + F.col("gy")).alias("gxy")
        return (banded.select("poly_id", "height_base", gxy)
                .repartition(color._dissolve_partitions(banded),
                             "poly_id", "height_base")
                .sortWithinPartitions("poly_id", "height_base"))

    def _k_packed_full(batches):
        import numpy as np
        rows = []
        for g in _iter_sorted_groups(batches):
            arr = g["gxy"].to_numpy()
            gx = arr >> 32
            gy = arr & 0xFFFFFFFF
            polys_, areas = dissolve_pixels_rings(gx, gy)
            q1, q3, qd = quad_counts(gx, gy)
            rows.append({"poly_id": int(g["poly_id"].iloc[0]),
                         "height_base": int(g["height_base"].iloc[0]),
                         "area_px": sum(a for ar in areas for a in ar) // 2,
                         "euler4": (q1 - q3 + 2 * qd) // 4,
                         "euler8": (q1 - q3 - 2 * qd) // 4})
        yield pd.DataFrame(rows, columns=["poly_id", "height_base", "area_px",
                                          "euler4", "euler8"])

    def banded_agg():
        """One row per band: groupBy(poly_id, height_base) with
        collect_list(gxy) — 23k array rows instead of 9.86M scalar rows
        across both the exchange's final side and the Arrow boundary."""
        from pyspark.sql import functions as F
        from openelevationservice_spark.operators.polygon import polygon_pixels
        from openelevationservice_spark.plans.cache import lease
        pixels = polygon_pixels(polys, images)
        lease("prof_dissolve", pixels)
        stats = color.polygon_stats(pixels)
        banded = color.with_height_base(pixels, stats)
        gxy = (F.col("gx").cast("long") * F.lit(4294967296) + F.col("gy")).alias("gxy")
        return (banded.select("poly_id", "height_base", gxy)
                .repartition(color._dissolve_partitions(banded),
                             "poly_id", "height_base")
                .groupBy("poly_id", "height_base")
                .agg(F.collect_list("gxy").alias("cells")))

    def _k_agg_full(batches):
        import numpy as np
        rows = []
        for pdf in batches:
            for pid, hb, cells in zip(pdf["poly_id"].to_numpy(),
                                      pdf["height_base"].to_numpy(),
                                      pdf["cells"].to_numpy()):
                arr = np.asarray(cells, dtype=np.int64)
                gx = arr >> 32
                gy = arr & 0xFFFFFFFF
                polys_, areas = dissolve_pixels_rings(gx, gy)
                q1, q3, qd = quad_counts(gx, gy)
                rows.append({"poly_id": int(pid), "height_base": int(hb),
                             "area_px": sum(a for ar in areas for a in ar) // 2,
                             "euler4": (q1 - q3 + 2 * qd) // 4,
                             "euler8": (q1 - q3 - 2 * qd) // 4})
        yield pd.DataFrame(rows, columns=["poly_id", "height_base", "area_px",
                                          "euler4", "euler8"])

    def banded_agg_partial():
        """groupBy WITHOUT pre-repartition: map-side partial collect_list
        gathers cells into arrays before the exchange, so the shuffle
        ships bulk array bytes (memcpy) instead of 9.86M per-row field
        writes; a cheap post-agg repartition restores the explicit task
        count for the python stage."""
        from pyspark.sql import functions as F
        from openelevationservice_spark.operators.polygon import polygon_pixels
        from openelevationservice_spark.plans.cache import lease
        pixels = polygon_pixels(polys, images)
        lease("prof_dissolve", pixels)
        stats = color.polygon_stats(pixels)
        banded = color.with_height_base(pixels, stats)
        gxy = (F.col("gx").cast("long") * F.lit(4294967296) + F.col("gy")).alias("gxy")
        return (banded.select("poly_id", "height_base", gxy)
                .groupBy("poly_id", "height_base")
                .agg(F.collect_list("gxy").alias("cells"))
                .repartition(color._dissolve_partitions(banded),
                             "poly_id", "height_base"))

    variants = {
        "jvm_only": lambda: banded_plan().count(),
        "aggp_full": lambda: banded_agg_partial().mapInPandas(_k_agg_full, COUNT_SCHEMA).count(),
        "transfer": lambda: banded_plan().mapInPandas(_k_transfer, COUNT_SCHEMA).count(),
        "stream": lambda: banded_plan().mapInPandas(_k_stream, COUNT_SCHEMA).count(),
        "quads": lambda: banded_plan().mapInPandas(_k_quads, COUNT_SCHEMA).count(),
        "trace": lambda: banded_plan().mapInPandas(_k_trace, COUNT_SCHEMA).count(),
        "full": lambda: color.polygon_color_invariants(polys, images).count(),
        "packed3_full": lambda: banded_packed().mapInPandas(_k_packed_full, COUNT_SCHEMA).count(),
        "agg_full": lambda: banded_agg().mapInPandas(_k_agg_full, COUNT_SCHEMA).count(),
        "agg_jvm": lambda: banded_agg().count(),
    }
    only = os.environ.get("OES_PROF_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for name, fn in variants.items():
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

"""Interleaved A/B: cosine_topk's mapInArrow kernel (buffer-view
unpack, arrow_impl="batch") vs the mapInPandas twin, over the SAME
packed-binary corpus at the scaling ann volume.  Usage:

    OES_BENCH_ANN_MULT=800 SPARK_GRAFT_CPUS=2 python BENCH/ab_ann_arrow.py

The corpus is cached once (both variants read the identical cached
plan); every timed rep rebuilds its query plan.  Prints one JSON line
with per-variant minima and the row-count equality check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from openelevationservice_spark.operators import similarity  # noqa: E402
from openelevationservice_spark.plans.session import build_session  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "2"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("OES_AB_ROUNDS", "3"))
    mult = bench.ANN_MULT
    spark = build_session(app="ab-ann-arrow", cpus=cpus)
    emb = bench._cached(spark, sf, "embeddings", ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"),
                                               F.col("embedding").alias("q_vec"))
    big = (emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
           .select((F.col("vec_id") * mult + F.col("rep")).alias("vec_id"),
                   "embedding")
           .repartition(bench._parts(spark)))
    big = similarity.pack_vectors(big, "embedding")
    big.persist()
    big.count()

    variants = {"pandas": "pandas", "batch": "batch"}
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts = {}
    for name, impl in variants.items():  # warm-up (JIT + python workers)
        counts[name] = similarity.cosine_topk(big, q, k=10, arrow_impl=impl).count()
    for _ in range(rounds):
        for name, impl in variants.items():
            t0 = time.perf_counter()
            similarity.cosine_topk(big, q, k=10, arrow_impl=impl).count()
            times[name].append(time.perf_counter() - t0)
    assert len(set(counts.values())) == 1, counts
    spark.stop()
    print(json.dumps({
        "cpus": cpus,
        "ann_mult": mult,
        "rounds": rounds,
        "rows": counts["batch"],
        "min_sec": {k: round(min(v), 3) for k, v in times.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

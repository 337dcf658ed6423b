"""Decompose minhash_lsh (lsh_candidate_pairs) into its three stages,
interleaved minima at one core count:

  shingle  — explode word shingles + md5 base hash (pure codegen, no
             exchange): the scan term
  signature — + the ONE groupBy(doc_id) exchange with n permutation
             mins (map-side partial agg)
  full     — + banding, (band, hash) bucket groupBy, sorted-list pair
             explode + distinct

Usage: OES_BENCH_MINHASH_REPLICAS=8 SPARK_GRAFT_CPUS=2 python BENCH/profile_minhash.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from openelevationservice_spark.operators import dedup  # noqa: E402
from openelevationservice_spark.plans.session import build_session  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "2"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("OES_AB_ROUNDS", "3"))
    spark = build_session(app="prof-minhash", cpus=cpus)
    docs = bench._cached(spark, sf, "documents", ["doc_id", "text"])
    docs_big = bench._docs_big(docs).repartition(bench._parts(spark))
    docs_big.persist()
    n_docs = docs_big.count()

    def shingle_plan():
        sh = docs_big.select(
            F.col("doc_id"),
            F.explode(dedup.word_shingles(F.col("text"), 3)).alias("sh"))
        return sh.select("doc_id", dedup.shingle_base_hash(F.col("sh")).alias("_x"))

    variants = {
        "shingle": lambda: shingle_plan().agg(F.count(F.lit(1)), F.sum("_x")).collect(),
        "signature": lambda: dedup.minhash_signature(docs_big, n_hashes=8).count(),
        "full": lambda: dedup.lsh_candidate_pairs(docs_big, n_hashes=8, bands=4).count(),
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
        "n_docs": n_docs,
        "min_sec": {k: round(min(v), 3) for k, v in times.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

"""Interleaved A/B: dedup_clusters driver union-find fast path vs the
distributed label-propagation loop, at the scaling corpus (x8 word-
namespaced replicas).  Usage:

    OES_BENCH_MINHASH_REPLICAS=8 SPARK_GRAFT_CPUS=2 python BENCH/ab_cc_fastpath.py

Prints one JSON line with per-variant minima (fresh plan per rep —
same-instance re-collect would silently reuse shuffles).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reads OES_BENCH_* env at import)
from openelevationservice_spark.operators import dedup  # noqa: E402
from openelevationservice_spark.plans.session import build_session  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "2"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("OES_AB_ROUNDS", "3"))
    spark = build_session(app="ab-cc", cpus=cpus)
    docs = bench._cached(spark, sf, "documents", ["doc_id", "text"])
    docs_big = bench._docs_big(docs)
    docs_big = docs_big.repartition(bench._parts(spark))
    docs_big.persist()
    n_docs = docs_big.count()

    variants = {
        "driver_uf": dict(driver_max_pairs=dedup.CC_DRIVER_MAX_PAIRS),
        "distributed": dict(driver_max_pairs=0),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts = {}
    # warm-up both variants once (JIT steady state), then interleave
    for name, kw in variants.items():
        counts[name] = dedup.dedup_clusters(docs_big, n_hashes=8, bands=4, **kw).count()
    for _ in range(rounds):
        for name, kw in variants.items():
            t0 = time.perf_counter()
            dedup.dedup_clusters(docs_big, n_hashes=8, bands=4, **kw).count()
            times[name].append(time.perf_counter() - t0)
    assert len(set(counts.values())) == 1, counts
    spark.stop()
    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "rows_out": counts["driver_uf"],
        "min_sec": {k: round(min(v), 3) for k, v in times.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()

"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side
``zip_with``/``aggregate`` fold — no Python), and an LSH-bucketed
variant as the scale path (random-hyperplane signs computed once per
batch in an Arrow pandas UDF, then bucket-local brute force — the
candidate join is an equi-join on the bucket key, never a cross join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity_col(a, b):
    """cos(a, b) as a Column — sequential fold, deterministic order."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(corpus_df: DataFrame, queries_df: DataFrame, k: int = 3,
                corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                query_id: str = "q_id", query_vec: str = "q_vec") -> DataFrame:
    """Exact brute-force top-k: (q_id, rank, vec_id, sim).

    The query side is broadcast (it is small by construction); the scan
    over the corpus is embarrassingly parallel, the only shuffle is the
    final per-query top-k window.
    """
    vec_d = F.transform(F.col(corpus_vec), lambda x: x.cast("double"))
    qvec_d = F.transform(F.col(query_vec), lambda x: x.cast("double"))
    c = corpus_df.select(F.col(corpus_id), vec_d.alias("_cv"))
    q = queries_df.select(F.col(query_id), qvec_d.alias("_qv"))
    j = c.crossJoin(F.broadcast(q))
    j = j.withColumn("sim", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding",
                    n_planes: int = 8, seed: int = 42,
                    bucket_col: str = "bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id — one Arrow UDF, vectorized matmul."""
    @F.pandas_udf(T.IntegerType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (n, dim)
        planes = _hyperplanes(mat.shape[1], n_planes, seed)  # (p, dim)
        signs = (mat @ planes.T) > 0  # (n, p)
        return pd.Series((signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32))

    return df.withColumn(bucket_col, bucket(F.col(vec_col)))


def lsh_ann_topk(corpus_df: DataFrame, queries_df: DataFrame, k: int = 3,
                 n_planes: int = 8, seed: int = 42, probe_bits: int = 1,
                 corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                 query_id: str = "q_id", query_vec: str = "q_vec") -> DataFrame:
    """Approximate top-k: bucket-equi-join + bucket-local brute force.

    ``probe_bits`` = multi-probe: each query also probes buckets at
    Hamming distance 1 in the first ``probe_bits`` sign bits (recall
    knob).  Candidate volume ~ corpus/2^p per probe — scale path.
    """
    c = with_lsh_bucket(
        corpus_df.select(corpus_id, corpus_vec), corpus_vec, n_planes, seed
    )
    q = with_lsh_bucket(
        queries_df.select(query_id, F.col(query_vec)), query_vec, n_planes, seed
    )
    probes = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(probe_bits)
    ]
    q = q.withColumn("probe", F.explode(F.array(*probes)))
    vec_d = F.transform(F.col(corpus_vec), lambda x: x.cast("double"))
    qvec_d = F.transform(F.col(query_vec), lambda x: x.cast("double"))
    j = (
        c.select(corpus_id, vec_d.alias("_cv"), F.col("bucket").alias("cbucket"))
        .join(F.broadcast(q.select(query_id, qvec_d.alias("_qv"), F.col("probe").alias("cbucket"))),
              "cbucket")
    )
    j = j.withColumn("sim", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "sim")
    )

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


# --- IVF (inverted-file) ANN — coarse-quantizer scale path -----------------

def ivf_train_centroids(corpus_df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", n_centroids: int = 16,
                        iters: int = 5, sample_n: int = 4096) -> np.ndarray:
    """Train the IVF coarse quantizer: numpy k-means on a deterministic
    sample (ordered-by-id head).

    The quantizer is tiny (k x dim floats) and training it driver-side
    on a bounded sample is the standard IVF shape — at 10^12 rows the
    sample is still ``sample_n``; only assignment is distributed.
    Initialization is the first ``n_centroids`` sample rows (seed-free,
    deterministic); empty clusters are re-seeded from the row with the
    worst quantization error.
    """
    pdf = (corpus_df.select(id_col, vec_col).orderBy(id_col)
           .limit(sample_n).toPandas())
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, dim)
    x_n = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = x_n[:n_centroids].copy()
    for _ in range(iters):
        sims = x_n @ cent.T                       # cosine on unit vectors
        assign = sims.argmax(axis=1)
        err = 1.0 - sims[np.arange(len(x_n)), assign]
        for c in range(n_centroids):
            members = x_n[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / np.linalg.norm(m)
            else:
                cent[c] = x_n[err.argmax()]
                err[err.argmax()] = -1.0
    return cent


def ivf_assign(df: DataFrame, centroids: np.ndarray, vec_col: str,
               nprobe: int = 1, list_col: str = "ivf_list") -> DataFrame:
    """Attach the ``nprobe`` nearest inverted-list ids (one Arrow matmul
    per batch; exploded so the join below is a plain equi-join)."""
    cent = centroids  # closure-captured; broadcast with the UDF

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def lists(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ cent.T                       # (n, k)
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    return df.withColumn(list_col, F.explode(lists(F.col(vec_col))))


def ivf_topk(corpus_df: DataFrame, queries_df: DataFrame, k: int = 3,
             n_centroids: int = 16, nprobe: int = 4, iters: int = 5,
             corpus_id: str = "vec_id", corpus_vec: str = "embedding",
             query_id: str = "q_id", query_vec: str = "q_vec",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k: corpus rows live in exactly one inverted
    list; each query probes its ``nprobe`` nearest lists and brute-forces
    only those lists (equi-join on list id — candidate volume ~
    nprobe/k of the corpus).  ``nprobe == n_centroids`` degenerates to
    exact brute force.
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            corpus_df, corpus_vec, corpus_id, n_centroids, iters
        )
    vec_d = F.transform(F.col(corpus_vec), lambda x: x.cast("double"))
    qvec_d = F.transform(F.col(query_vec), lambda x: x.cast("double"))
    c = ivf_assign(
        corpus_df.select(corpus_id, vec_d.alias("_cv")), centroids, "_cv", nprobe=1
    )
    q = ivf_assign(
        queries_df.select(query_id, qvec_d.alias("_qv")), centroids, "_qv", nprobe=nprobe
    )
    j = c.join(F.broadcast(q), "ivf_list")
    j = j.withColumn("sim", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "sim")
    )

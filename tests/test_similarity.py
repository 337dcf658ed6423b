import numpy as np
import pandas as pd
import pytest

from openelevationservice_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def corpus_pdf():
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    return pd.DataFrame({
        "vec_id": np.arange(200, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
    })


@pytest.fixture(scope="module")
def corpus(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf, schema="vec_id long, embedding array<float>")
    df.persist()
    df.count()
    return df


def numpy_topk(corpus_pdf, qvec, k):
    mat = np.stack([np.array(v, dtype=np.float64) for v in corpus_pdf["embedding"]])
    q = np.array(qvec, dtype=np.float64)
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((corpus_pdf["vec_id"], -sims))
    return [int(corpus_pdf["vec_id"][i]) for i in order[:k]]


def test_brute_force_topk_matches_numpy(spark, corpus, corpus_pdf):
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1], "q_vec": [corpus_pdf["embedding"][5],
                                                corpus_pdf["embedding"][17]]}),
        schema="q_id long, q_vec array<float>",
    )
    got = sim.cosine_topk(corpus, queries, k=5).toPandas()
    for q_id, src in [(0, 5), (1, 17)]:
        want = numpy_topk(corpus_pdf, corpus_pdf["embedding"][src], 5)
        sub = got[got.q_id == q_id].sort_values("rank")
        assert list(sub.vec_id) == want
        assert sub.iloc[0].vec_id == src          # self is nearest
        assert sub.iloc[0].sim == pytest.approx(1.0)


def test_lsh_ann_finds_self(spark, corpus, corpus_pdf):
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0], "q_vec": [corpus_pdf["embedding"][42]]}),
        schema="q_id long, q_vec array<float>",
    )
    got = sim.lsh_ann_topk(corpus, queries, k=3, n_planes=6, probe_bits=2).toPandas()
    assert len(got) >= 1
    assert got.sort_values("rank").iloc[0].vec_id == 42  # same bucket as itself


def test_lsh_recall_reasonable(spark, corpus, corpus_pdf):
    qids = [3, 30, 77, 123]
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": qids, "q_vec": [corpus_pdf["embedding"][i] for i in qids]}),
        schema="q_id long, q_vec array<float>",
    )
    exact = sim.cosine_topk(corpus, queries, k=3).toPandas()
    approx = sim.lsh_ann_topk(corpus, queries, k=3, n_planes=4, probe_bits=3).toPandas()
    hits = 0
    for q in qids:
        want = set(exact[exact.q_id == q].vec_id)
        got = set(approx[approx.q_id == q].vec_id)
        hits += len(want & got)
    assert hits / (3 * len(qids)) >= 0.5  # recall@3 over half with 4 planes + probes


def test_ivf_full_probe_is_exact(spark, corpus, corpus_pdf):
    """nprobe == n_centroids degenerates to exact brute force."""
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1], "q_vec": [corpus_pdf["embedding"][5],
                                                corpus_pdf["embedding"][17]]}),
        schema="q_id long, q_vec array<float>",
    )
    got = sim.ivf_topk(corpus, queries, k=5, n_centroids=8, nprobe=8).toPandas()
    exact = sim.cosine_topk(corpus, queries, k=5).toPandas()
    g = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    e = exact.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert (g.vec_id == e.vec_id).all()
    assert np.allclose(g.sim, e.sim)


def test_ivf_partial_probe_recall(spark, corpus, corpus_pdf):
    """nprobe=4/8 lists: top-1 must survive (the nearest neighbor's list
    is probed with overwhelming odds on this data), top-5 recall >= 0.6."""
    qs = [5, 17, 42, 99, 123]
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": list(range(len(qs))),
                      "q_vec": [corpus_pdf["embedding"][i] for i in qs]}),
        schema="q_id long, q_vec array<float>",
    )
    got = sim.ivf_topk(corpus, queries, k=5, n_centroids=8, nprobe=4).toPandas()
    hits = total = top1 = 0
    for qi, src in enumerate(qs):
        truth = numpy_topk(corpus_pdf, corpus_pdf["embedding"][src], 5)
        mine = got[got.q_id == qi].sort_values("rank").vec_id.tolist()
        top1 += mine[0] == truth[0]
        hits += len(set(mine) & set(truth))
        total += 5
    assert top1 == len(qs)
    assert hits / total >= 0.6

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from openelevationservice_spark.functions import image_codec as ic
from openelevationservice_spark.operators import multimodal, textops
from openelevationservice_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog run to the park for a while", "en"),
        (1, "der hund ist nicht auf der straße und das ist gut", "de"),
        (2, "le chat est dans la maison et les oiseaux pour toujours", "fr"),
        (3, "xyzzy qwerty asdf", "??"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    df.persist()
    df.count()
    return df


def test_lang_id(spark, docs):
    got = textops.lang_scores(docs).toPandas().set_index("doc_id")
    assert got.loc[0, "pred_lang"] == "en"
    assert got.loc[1, "pred_lang"] == "de"
    assert got.loc[2, "pred_lang"] == "fr"


def test_quality_features(spark, docs):
    got = textops.quality_features(docs).toPandas().set_index("doc_id")
    r = got.loc[0]
    text = "the cat and the dog run to the park for a while"
    assert r.q_n_chars == len(text)
    assert r.q_n_tokens == len(text.split(" "))
    assert r.q_n_stopwords == sum(w in textops.STOPWORDS["en"] for w in text.split(" "))
    assert 0 < r.q_score <= 1.0
    assert got.loc[3, "q_score"] < got.loc[0, "q_score"]  # junk scores lower


def test_fingerprint_deterministic(spark, docs):
    a = textops.fingerprint(docs).toPandas().set_index("doc_id")
    b = textops.fingerprint(docs).toPandas().set_index("doc_id")
    assert (a["fp"].fillna("∅") == b["fp"].fillna("∅")).all()
    assert a.loc[3, "fp"] is None  # <5 words → no 5-gram shingles → NULL fp
    assert a.loc[0, "n_shingles"] == len(set(
        " ".join("the cat and the dog run to the park for a while".split(" ")[i:i + 5])
        for i in range(8)
    ))


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(fx.make_images_pdf(fx.World(nx=2, ny=2)),
                                 schema=fx.IMAGES_SCHEMA)


def test_image_metadata(spark, images):
    got = multimodal.image_metadata(images).toPandas()
    assert len(got) == 4
    assert (got.w == 50).all() and (got.h == 50).all()
    ref = fx.make_images_pdf(fx.World(nx=2, ny=2))
    m = got.merge(ref[["image_id", "phash"]], on="image_id", suffixes=("", "_ref"))
    assert (m.phash == m.phash_ref).all()


def test_resize_block_mean(spark, images):
    got = multimodal.resize(images, factor=5).toPandas()
    assert (got.w == 10).all() and (got.h == 10).all()
    row = got.iloc[0]
    g = ic.decode(row["bytes"], "raw16", 10, 10)
    tx = int(row.image_id.split("_")[1])
    ty = int(row.image_id.split("_")[2])
    full = fx.tile_grid(tx, ty)
    want = full.reshape(10, 5, 10, 5).mean(axis=(1, 3)).astype(np.int16)
    assert (g == want).all()


def test_stub_format_raises_at_execution(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a"], "bytes": [b"xx"], "fmt": ["jpeg"],
                      "w": [1], "h": [1]}))
    plan = multimodal.image_metadata(df)  # plan-time OK
    with pytest.raises(Exception, match="NotImplementedError|native libs"):
        plan.collect()


def test_frame_sample_stub_schema(spark):
    empty = spark.createDataFrame(pd.DataFrame({"video_id": pd.Series([], dtype="str"),
                                                "bytes": pd.Series([], dtype=object)}),
                                  schema="video_id string, bytes binary")
    out = multimodal.frame_sample(empty)
    assert [f.name for f in out.schema.fields] == ["video_id", "frame_idx", "frame"]
    assert out.count() == 0


def test_roundtrip_invariant_all_ok(spark, images):
    got = multimodal.roundtrip_invariant(images).toPandas()
    assert got.ok.all() and got.phash_match.all() and got.caption_ok.all()


def test_audio_features_pcm16(spark):
    """Audio plumbing: pcm16 frames → RMS/peak rows; compressed fmt raises."""
    import numpy as np
    import pandas as pd
    from openelevationservice_spark.operators.multimodal import audio_features

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr          # 1 second
    wave = (np.sin(2 * np.pi * 440 * t) * 10000).astype("<i2")
    pdf = pd.DataFrame({
        "audio_id": ["a1"], "bytes": [wave.tobytes()],
        "sample_rate": [sr], "fmt": ["pcm16"],
    })
    df = spark.createDataFrame(pdf, schema="audio_id string, bytes binary, sample_rate int, fmt string")
    out = audio_features(df, frame_ms=25).toPandas().sort_values("frame_idx")
    spf = sr * 25 // 1000
    assert len(out) == sr // spf
    # sine RMS ≈ amplitude/sqrt(2) within a few percent per frame
    assert np.allclose(out.rms, 10000 / np.sqrt(2), rtol=0.15)
    assert (out.peak <= 10000).all() and (out.peak > 9000).all()

    bad = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["a2"], "bytes": [b"xx"],
                      "sample_rate": [sr], "fmt": ["mp3"]}),
        schema="audio_id string, bytes binary, sample_rate int, fmt string")
    import pytest
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception):
        audio_features(bad).collect()

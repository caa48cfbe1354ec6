import pyspark.sql.functions as F
import pytest

from docopenie_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog. It is a fine day for the park, and the team is happy to be out in the sun with friends."),
            (2, "el la de que los el la de que los"),
            (3, "xxxx"),
        ],
        "doc_id bigint, text string",
    )


def test_profile_columns_and_values(docs):
    rows = {r.doc_id: r for r in textstats.profile(docs, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1.n_tokens == 30
    assert r1.n_pieces > r1.n_tokens  # punctuation counted separately
    assert r1.lang_pred == "en"
    assert 0.0 < r1.stopword_ratio < 1.0
    assert r1.quality >= 0.5
    assert rows[2].lang_pred == "es"
    assert rows[3].lang_pred == "und"
    assert rows[3].quality < 0.5


def test_fingerprint_ws_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "a b c"), (3, "a b d")], "doc_id bigint, text string"
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_rolling_fingerprints_overlap(spark):
    df = spark.createDataFrame(
        [
            (1, "shared prefix content here then tail one"),
            (2, "shared prefix content here then tail two"),
            (3, "entirely different body of words throughout"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: set(r.fp) for r in df.select(
        "doc_id", textstats.rolling_fingerprints("text").alias("fp")).collect()}
    overlap_12 = len(out[1] & out[2]) / len(out[1] | out[2])
    overlap_13 = len(out[1] & out[3]) / len(out[1] | out[3])
    assert overlap_12 > 0.5 > overlap_13


def test_multimodal_fake_features(spark):
    media = multimodal.synthetic_media(spark, 12)
    out = multimodal.extract_features(media, dim=8, fake=True)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.features) == 8
        assert all(0.0 <= x <= 1.0 for x in r.features)
    # deterministic: same payload → same features
    again = {r.media_id: r.features for r in multimodal.extract_features(media, dim=8, fake=True).collect()}
    assert {r.media_id: r.features for r in rows} == again


def test_multimodal_stub_raises(spark):
    media = multimodal.synthetic_media(spark, 3)
    out = multimodal.extract_features(media, fake=False)
    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    with _pt.raises(Exception):
        out.collect()


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, 9)
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert rows and all(r.frame_ts_ms % 1000 == 0 for r in rows)
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0-based

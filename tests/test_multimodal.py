"""Multimodal plumbing tests: schema, content addressing, stubbed decode
(real Spark plan, deterministic fake features), frame-sampling plan."""

import pytest
from pyspark.sql import functions as F

from information_retrieval_images_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.make_fake_media(spark, n=16)


def test_content_address_matches_md5(spark, media):
    import hashlib

    pdf = media.select("media_id", "payload").toPandas()
    for r in pdf.itertuples():
        assert r.media_id == hashlib.md5(bytes(r.payload)).hexdigest()


def test_extract_features_stub_raises_without_fake(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        mm.extract_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "imaging/audio" in str(exc.value)


def test_extract_features_fake_deterministic(spark, media):
    a = mm.extract_features(media, deterministic_fake=True).toPandas().set_index("media_id")
    b = mm.extract_features(media, deterministic_fake=True).toPandas().set_index("media_id")
    assert (a["feat_dim"] == mm.FEATURE_DIM).all()
    # image rows only (kind filter pushed); deterministic across runs
    n_images = media.where(F.col("kind") == "image").count()
    assert len(a) == n_images
    for mid in a.index:
        assert list(a.loc[mid, "feature"]) == list(b.loc[mid, "feature"])


def test_frame_sample_plan(spark, media):
    plan = mm.frame_sample_plan(media, every_ms=1000).toPandas()
    n_videos = media.where(F.col("kind") == "video").count()
    assert len(plan) == n_videos * 6  # 0..5000 ms inclusive
    assert set(plan["sample_ms"]) == {0, 1000, 2000, 3000, 4000, 5000}

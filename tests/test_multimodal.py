"""Multimodal plumbing: schema, Arrow batch shapes, fan-out, dedup buckets.

The codecs are stubs (container has no PIL/ffmpeg); what these tests pin
down is the Spark-side contract — mapInPandas signatures, deterministic
outputs, 1->N frame fan-out, phash band-join candidate generation."""

import pyspark.sql.functions as F
import pytest

from inform_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"https://site0.test/assets/img-{i}.png", f"doc-{i % 3}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "media_ref string, doc_id string")
    return mm.synthesize_media(docs).cache()


def test_media_schema_and_bytes(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in mm.MEDIA.fields
    ]
    r = media.filter(F.col("media_ref").endswith("img-0.png")).first()
    assert bytes(r["content"]).startswith(b"FAKEPNG:")
    assert r["format"] == "png"


def test_image_features_deterministic(spark, media):
    f1 = {r["media_ref"]: r for r in mm.image_features(media).collect()}
    f2 = {r["media_ref"]: r for r in mm.image_features(media, partitions=3).collect()}
    assert set(f1) == set(f2) and len(f1) == 20
    for ref in f1:
        assert f1[ref]["phash"] == f2[ref]["phash"]
        assert f1[ref]["decode_ok"] == "stub"
        assert 64 <= f1[ref]["width"] <= 1024


def test_decode_error_row_not_exception(spark):
    docs = spark.createDataFrame(
        [("https://x.test/a.png", "d0")], "media_ref string, doc_id string"
    )
    broken = mm.synthesize_media(docs).withColumn(
        "content", F.lit(None).cast("binary")
    )
    rows = mm.image_features(broken).collect()
    assert len(rows) == 1 and rows[0]["decode_ok"] == "error"
    assert rows[0]["width"] is None


def test_resize_caps_length(media):
    out = mm.resize_stub(media, max_px=4).collect()
    assert all(r["content_len"] <= 16 for r in out)


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames_stub(media, every_ms=500, n_frames=3)
    rows = frames.filter(F.col("media_ref").endswith("img-1.png")).orderBy(
        "frame_idx"
    ).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["ts_ms"] for r in rows] == [0, 500, 1000]
    assert rows[0]["frame"] is not None


def test_phash_near_dup_buckets(spark):
    # hand-built phashes: a~b differ in 2 bits (same 3 of 4 bands);
    # c differs everywhere
    rows = [
        ("a", 0x1111_2222_3333_4444),
        ("b", 0x1111_2222_3333_4447),  # 2 low bits flipped
        ("c", 0x0F0F_F0F0_0F0F_F0F0),
    ]
    feats = spark.createDataFrame(rows, "media_ref string, phash long")
    pairs = mm.near_dup_by_phash(feats, hamming_max=4).collect()
    assert [(p["a"], p["b"], p["hamming"]) for p in pairs] == [("a", "b", 2)]

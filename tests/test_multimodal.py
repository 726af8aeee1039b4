"""Multimodal operator tests: binary-column plumbing, Arrow-batched
fake decode, fan-out frame sampling, pure-JVM binary stats."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructType

from rivulus_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    rows = [(i, f"blob-{i}-payload".encode()) for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_pack_media_schema(media):
    packed = media.select(
        multimodal.pack_media(F.col("content"), "image", "image/png",
                              F.lit("s3://bucket/x")).alias("media"))
    f = dict((fld.name, fld.dataType) for fld in
             packed.schema["media"].dataType.fields)
    assert isinstance(f["content"], BinaryType)
    meta = dict((fld.name, fld.dataType.typeName())
                for fld in f["meta"].fields)
    assert meta == {"media_type": "string", "mime": "string",
                    "source_uri": "string"}


def test_decode_images_fake_matches_hashlib(media):
    out = {r.doc_id: r for r in multimodal.decode_images(media).collect()}
    for i in range(8):
        h = hashlib.md5(f"blob-{i}-payload".encode()).hexdigest()
        w = int(h[0:4], 16) % 1920 + 1
        ht = int(h[4:8], 16) % 1080 + 1
        assert out[i].width == w
        assert out[i].height == ht
        assert out[i].n_pixels == w * ht
        assert out[i].mean_luma == pytest.approx(
            (int(h[8:12], 16) % 256) / 255.0)


def test_decode_images_real_raises(media):
    with pytest.raises(Exception, match="codec not available"):
        multimodal.decode_images(media, decode="real").collect()


def test_frame_sample_fanout(media):
    frames = multimodal.sample_video_frames(media, every_n=3)
    got = frames.groupBy("doc_id").count().collect()
    for r in got:
        blob = f"blob-{r.doc_id}-payload".encode()
        h = hashlib.md5(blob).hexdigest()
        n_frames = int(h[12:14], 16) % 30 + 1
        assert r["count"] == len(range(0, n_frames, 3))
    # frame payload round-trips as the original bytes
    one = frames.filter(F.col("doc_id") == 0).first()
    assert bytes(one.frame) == b"blob-0-payload"
    assert isinstance(frames.schema["frame"].dataType, BinaryType)
    assert isinstance(frames.schema["frame_idx"].dataType, LongType)


def test_binary_stats_jvm_only(media):
    out = {r.doc_id: r for r in multimodal.binary_stats(media).collect()}
    blob = b"blob-3-payload"
    assert out[3].n_bytes == len(blob)
    assert out[3].sha256 == hashlib.sha256(blob).hexdigest()
    # no Python stage in the plan: BatchEvalPython/ArrowEvalPython absent
    explained = multimodal.binary_stats(media)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in explained


def test_decode_audio_fake_matches_hashlib(media):
    out = {r.doc_id: r for r in multimodal.decode_audio(media).collect()}
    rates = (8000, 16000, 22050, 44100)
    for i in range(8):
        h = hashlib.md5(f"blob-{i}-payload".encode()).hexdigest()
        rate = rates[int(h[14:16], 16) % 4]
        n = int(h[16:21], 16) % (1 << 20) + 1
        r = out[i]
        assert r.sample_rate == rate
        assert r.n_samples == n
        assert r.duration_us == n * 1_000_000 // rate
        assert 0.0 <= r.rms < 1.0


def test_decode_audio_real_raises(media):
    with pytest.raises(Exception, match="codec not available"):
        multimodal.decode_audio(media, decode="real").collect()


def test_plan_resize_fits_box_never_upscales(spark):
    from rivulus_spark.operators import multimodal

    feats = spark.createDataFrame(
        [(1, 1920, 1080), (2, 100, 50), (3, 512, 512), (4, 3, 4000)],
        "doc_id long, width long, height long")
    out = {r.doc_id: r for r in
           multimodal.plan_resize(feats, 512, 512).collect()}
    # downscale preserves aspect within the box
    assert (out[1].out_w, out[1].out_h) == (512, 288)
    assert out[1].is_noop is False
    # small images pass through untouched
    assert (out[2].out_w, out[2].out_h, out[2].is_noop) == (100, 50, True)
    assert (out[3].out_w, out[3].out_h, out[3].is_noop) == (512, 512, True)
    # extreme aspect ratio clamps to >= 1, never 0
    assert out[4].out_w == 1 and out[4].out_h == 512

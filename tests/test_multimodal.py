"""Multimodal binary-column plumbing (SURVEY §2 op 30).

The media libs are absent in this environment, so blobs use the
deterministic MMRW fake container; what these tests pin is the *Spark*
contract — schemas, row-count semantics, Arrow batch shapes, byte-exact
content — which is codec-independent.
"""

import math
import struct

import pytest
from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    mm.media_batch_conf(spark, max_records_per_batch=3)  # force multi-batch
    df = mm.synth_media_table(spark, n=8, frames=4).persist()
    df.count()
    return df


def test_synth_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 8


def test_decode_attaches_meta(media):
    out = mm.decode_media(media)
    assert out.count() == 8  # 1 row in → 1 row out
    rows = {r["media_id"]: r["meta"] for r in out.collect()}
    for i in range(8):
        m = rows[i]
        assert m["mime"] == "application/x-mmrw"
        assert m["width"] == 8 + i % 3 and m["height"] == 6 + i % 2
        assert m["n_frames"] == 1 + (i % 4)
        # container size = header + frames × w×h×c
        assert m["n_bytes"] == mm.HEADER_SIZE + m["n_frames"] * m["width"] * m["height"] * 3


def test_resize_byte_exact(media):
    out = mm.resize_images(mm.decode_media(media), out_w=4, out_h=2)
    for r in out.collect():
        w, h, c, fr = mm._decode_header(bytes(r["content"]))
        assert (w, h, c) == (4, 2, 3)
        assert len(r["content"]) == mm.HEADER_SIZE + fr * 4 * 2 * 3
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 2


def test_resize_nearest_neighbor_identity(spark):
    # resizing to the same dims must be a byte-identical round-trip
    df = mm.synth_media_table(spark, n=2, frames=1)
    src = {r["media_id"]: bytes(r["content"]) for r in df.collect()}
    for r in mm.resize_images(df, out_w=8, out_h=6).collect():
        w, h, _, _ = mm._decode_header(src[r["media_id"]])
        if (w, h) == (8, 6):
            assert bytes(r["content"]) == src[r["media_id"]]


def test_sample_frames_explodes(media):
    every = 2
    out = mm.sample_frames(media, every_n=every)
    got = out.groupBy("media_id").count().collect()
    for r in got:
        n_frames = 1 + (r["media_id"] % 4)
        assert r["count"] == math.ceil(n_frames / every)
    # each sampled frame is a valid single-frame container
    one = out.where(F.col("media_id") == 3).orderBy("frame_index").collect()
    assert [r["frame_index"] for r in one] == [0, 2]
    for r in one:
        _, _, _, fr = mm._decode_header(bytes(r["frame"]))
        assert fr == 1


def test_features_deterministic_unit_norm(media):
    out = mm.media_features(media, dim=16)
    assert out.count() == 8
    a = {r["media_id"]: r["embedding"] for r in out.collect()}
    b = {r["media_id"]: r["embedding"] for r in mm.media_features(media, dim=16).collect()}
    for i in range(8):
        assert len(a[i]) == 16
        assert a[i] == b[i]  # deterministic across runs
        assert abs(sum(v * v for v in a[i]) - 1.0) < 1e-5


def test_features_feed_ann(spark, media):
    # the fake embeddings satisfy the same array<float> contract the ANN
    # operators consume — plumbing end-to-end: blob → feature → top-k
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import similarity

    feats = mm.media_features(media).select(
        F.col("media_id").alias("doc_id"), F.col("embedding")
    )
    q = feats.where(F.col("doc_id") == 0).select("embedding")
    top = similarity.cosine_topk(feats, "doc_id", "embedding", q, k=3).collect()
    assert top[0]["doc_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-9


def test_real_codec_is_clearly_stubbed(spark):
    df = mm.synth_media_table(spark, n=1)
    with pytest.raises(Exception) as ei:
        mm.decode_media(df, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_bad_magic_rejected(spark):
    bad = [(0, struct.pack("<4sHHHH", b"XXXX", 1, 1, 1, 1), None)]
    df = spark.createDataFrame(bad, mm.MEDIA_SCHEMA)
    with pytest.raises(Exception):
        mm.decode_media(df).collect()

"""Multimodal plumbing: opaque binary columns, Arrow-batched decode stub."""

from __future__ import annotations

import pytest

from big_data_assignment_2_spark.operators.multimodal import (
    decode_image, decode_media, frame_sample, media_from_documents,
    media_metadata, repartition_by_bytes)
from big_data_assignment_2_spark.sources.io import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents")).cache()


def test_metadata_pure_expressions(media):
    rows = media_metadata(media).collect()
    assert len(rows) == 500
    r = next(x for x in rows if x["n_bytes"] > 0)
    assert len(r["digest"]) == 32 and len(r["magic"]) == 8
    assert r["media_type"] in ("image", "audio", "video")


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)


def test_decode_media_deterministic(spark, media):
    out1 = sorted(tuple(r) for r in decode_media(media, fake=True).collect())
    out2 = sorted(tuple(r) for r in decode_media(media, fake=True).collect())
    assert out1 == out2
    widths = {r[3] for r in out1}
    assert all(64 <= w < 256 for w in widths)


def test_frame_sample_only_video(spark, media):
    decoded = decode_media(media, fake=True)
    fs = frame_sample(decoded, every_n=10)
    vids = decoded.filter("media_type = 'video'").count()
    assert fs.select("media_id").distinct().count() == vids
    assert fs.filter("frame_idx % 10 != 0").count() == 0


def test_repartition_by_bytes(media):
    out = repartition_by_bytes(media, target_partition_bytes=10_000)
    assert out.rdd.getNumPartitions() >= 2

"""MP4 MJPEG frame demux (operators/multimodal.py r9): sample-table
resolution is byte-exact, multi-chunk stsc/stco maps work, non-MJPEG
formats stay honestly stubbed, and the Spark mapInPandas path matches the
in-process decode."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_assignment_2_spark.operators.multimodal import (
    decode_jpeg, decode_payload, demux_mp4_frames, jpeg_bytes,
    jpeg_flat_blocks_frame, mp4_bytes, mp4_mjpeg_bytes)


def _frames(doc_id: int) -> list[bytes]:
    return [jpeg_bytes(jpeg_flat_blocks_frame(doc_id, f))
            for f in range(1 + doc_id % 3)]


def test_demux_byte_exact_single_chunk():
    for did in (0, 7, 23, 104):
        frames = _frames(did)
        px = jpeg_flat_blocks_frame(did, 0)
        payload = mp4_mjpeg_bytes(frames, px.shape[1], px.shape[0])
        assert demux_mp4_frames(payload) == frames


def test_demux_multi_chunk_and_short_last_chunk():
    """frames_per_chunk=2 over 3 frames forces a two-entry stsc map with
    a short final chunk — the run-length walk must still resolve every
    sample."""
    frames = _frames(23)          # 3 frames
    assert len(frames) == 3
    px = jpeg_flat_blocks_frame(23, 0)
    for fpc in (1, 2, 3):
        payload = mp4_mjpeg_bytes(frames, px.shape[1], px.shape[0],
                                  frames_per_chunk=fpc)
        assert demux_mp4_frames(payload) == frames


def test_demuxed_frames_decode_to_fixture():
    for did in (5, 16):
        px0 = jpeg_flat_blocks_frame(did, 0)
        payload = mp4_mjpeg_bytes(_frames(did), px0.shape[1], px0.shape[0])
        for f, frame in enumerate(demux_mp4_frames(payload)):
            dec = decode_jpeg(frame)
            assert np.array_equal(dec["pixels"],
                                  jpeg_flat_blocks_frame(did, f))


def test_non_mjpeg_format_raises():
    frames = _frames(7)
    px = jpeg_flat_blocks_frame(7, 0)
    payload = mp4_mjpeg_bytes(frames, px.shape[1], px.shape[0])
    pos = payload.rindex(b"stsd")        # format field: payload+12 of stsd
    patched = payload[:pos + 16] + b"avc1" + payload[pos + 20:]
    with pytest.raises(NotImplementedError, match="avc1"):
        demux_mp4_frames(patched)


def test_corrupt_and_metadata_only_inputs():
    with pytest.raises(ValueError):
        demux_mp4_frames(b"\x00\x00\x00\x18ftypisom")     # truncated
    with pytest.raises(ValueError, match="no track with a sample table"):
        demux_mp4_frames(mp4_bytes(64, 48, 2000))          # no stbl
    with pytest.raises(ValueError):
        demux_mp4_frames(b"RIFF....WAVE")                  # not BMFF


def test_decode_payload_dispatches_mp4():
    """Dispatch: MJPEG MP4 -> first-frame geometry + frame count;
    metadata-only MP4 -> tkhd geometry with 0 samples."""
    px = jpeg_flat_blocks_frame(9, 0)
    payload = mp4_mjpeg_bytes(_frames(9), px.shape[1], px.shape[0])
    m = decode_payload(payload)
    assert (m["width"], m["height"]) == (px.shape[1], px.shape[0])
    assert m["n_samples"] == len(_frames(9))
    meta_only = decode_payload(mp4_bytes(64, 48, 2000))
    assert (meta_only["width"], meta_only["height"]) == (64, 48)
    assert meta_only["n_samples"] == 0


def test_demux_on_spark(spark, sf_dir):
    """mapInPandas end-to-end at sf0.001: every frame row equals the
    direct in-process demux+decode."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.multimodal import (
        demux_media_mp4, generate_media_mp4_mjpeg)

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter((F.col("doc_id") % 29) == 0))
    rows = demux_media_mp4(generate_media_mp4_mjpeg(docs)).collect()
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    expected = {}
    for did in ids:
        for f in range(1 + did % 3):
            px = jpeg_flat_blocks_frame(did, f)
            expected[(str(did), f)] = (px.shape[1], px.shape[0],
                                       int(px.astype(np.int64).sum()))
    got = {(r["media_id"], r["frame_idx"]):
           (r["width"], r["height"], r["pix_sum"]) for r in rows}
    assert got == expected


def test_demux_co64_offsets():
    """64-bit chunk-offset tables (co64, the >4 GiB layout) must demux
    byte-identically to stco."""
    frames = _frames(23)
    px = jpeg_flat_blocks_frame(23, 0)
    for fpc in (0, 2):
        payload = mp4_mjpeg_bytes(frames, px.shape[1], px.shape[0],
                                  frames_per_chunk=fpc, use_co64=True)
        assert b"co64" in payload and b"stco" not in payload
        assert demux_mp4_frames(payload) == frames

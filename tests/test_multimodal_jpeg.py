"""Baseline JPEG codec (fifth real codec): round-trip exactness on the
flat-block fixture, bounded loss on general content, Huffman/structure
edge cases, and the Spark-side Arrow pipeline.

The flat-block contract: under a unity quantization table a constant 8x8
block's FDCT is a single integer DC coefficient (8*(v-128)); every AC is
float noise that rounds to zero, and the IDCT of the lone DC restores v
in every pixel — so encode→decode is BIT-exact, which is what lets the
mm_jpeg_decode oracle recompute pixel sums arithmetically.
"""

import numpy as np
import pytest

from big_data_assignment_2_spark.operators.multimodal import (
    decode_jpeg, decode_payload, jpeg_bytes, jpeg_flat_blocks)


def test_flat_blocks_roundtrip_bit_exact():
    for did in (0, 1, 7, 13, 123, 9999, 54321):
        px = jpeg_flat_blocks(did)
        m = decode_jpeg(jpeg_bytes(px))
        assert (m["width"], m["height"]) == (px.shape[1], px.shape[0])
        assert m["n_channels"] == 1
        assert (m["pixels"] == px).all()


def test_general_content_bounded_loss():
    # Gradient + noise exercises every (run,size) symbol class; with the
    # unity quant table the only loss is coefficient rounding, which is
    # spatially bounded by sum(|dS|)*max|basis| — a few grey levels.
    rng = np.random.default_rng(0)
    px = (np.arange(24)[:, None] * 7 + np.arange(40)[None, :] * 3
          + rng.integers(0, 30, (24, 40))).astype(np.uint8)
    m = decode_jpeg(jpeg_bytes(px))
    assert np.abs(m["pixels"].astype(int) - px.astype(int)).max() <= 4


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    m = decode_jpeg(jpeg_bytes(px))
    assert m["pixels"].shape == (13, 21)
    assert np.abs(m["pixels"].astype(int) - px.astype(int)).max() <= 4


def test_impulse_exercises_zrl_and_eob():
    # A single corner impulse forces long AC zero runs (ZRL) and an EOB
    # in the surrounding blocks; an impulse's AC spectrum is non-integer
    # so q=1 rounding may cost one grey level, no more.
    px = np.zeros((16, 16), np.uint8)
    px[7, 7] = 255
    px[15, 0] = 128
    m = decode_jpeg(jpeg_bytes(px))
    assert np.abs(m["pixels"].astype(int) - px.astype(int)).max() <= 1


def test_nonunity_quant_table_decodes_and_is_lossy():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    q = np.clip(np.arange(1, 65) * 2, 1, 255)
    m = decode_jpeg(jpeg_bytes(px, quant=q))
    assert m["pixels"].shape == (16, 24)
    # coarser table -> real loss (proves dequantize actually multiplies)
    assert np.abs(m["pixels"].astype(int) - px.astype(int)).max() > 0


def test_dc_prediction_spans_blocks():
    # Monotone flat blocks give strictly positive then negative DC
    # diffs; exact recovery proves the predictor chain.
    vals = np.array([[10, 250], [250, 10]], dtype=np.uint8)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    m = decode_jpeg(jpeg_bytes(px))
    assert (m["pixels"] == px).all()


def test_truncated_and_foreign_payloads_raise():
    px = jpeg_flat_blocks(5)
    payload = jpeg_bytes(px)
    with pytest.raises(ValueError):
        decode_jpeg(payload[:20])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_payload_dispatches_jpeg():
    px = jpeg_flat_blocks(3)
    meta = decode_payload(jpeg_bytes(px))
    assert (meta["width"], meta["height"]) == (px.shape[1], px.shape[0])


def test_byte_stuffing_roundtrip():
    # An entropy byte of 0xFF must be stuffed with 0x00 by the writer and
    # unstuffed by the reader — tested at the bit layer directly (the
    # flat fixtures' entropy streams are mostly zero bits and may never
    # produce 0xFF organically).
    from big_data_assignment_2_spark.operators.multimodal import (
        _BitReader, _BitWriter)

    wtr = _BitWriter()
    wtr.write(0xFF, 8)
    wtr.write(0xA5, 8)
    buf = wtr.flush()
    assert buf == b"\xff\x00\xa5"          # stuffed on disk
    rdr = _BitReader(buf)
    assert rdr.read(8) == 0xFF and rdr.read(8) == 0xA5  # unstuffed back
    # A bare 0xFF followed by a non-zero byte is a marker, not data.
    with pytest.raises(ValueError):
        _BitReader(b"\xff\xd9").read(8)


def test_spark_pipeline_arrow_batches(spark):
    from big_data_assignment_2_spark.operators.multimodal import (
        decode_media_jpeg, generate_media_jpeg)

    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    out = {r["media_id"]: r for r in
           decode_media_jpeg(generate_media_jpeg(docs)).collect()}
    assert len(out) == 60
    for did in (0, 17, 59):
        px = jpeg_flat_blocks(did)
        r = out[str(did)]
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["pix_sum"] == int(px.sum())

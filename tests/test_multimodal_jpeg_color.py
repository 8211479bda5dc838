"""4:4:4 color JPEG codec (r9): gray-through-color bit-exactness, true
color tolerance, per-component table selection, and the Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_assignment_2_spark.operators.multimodal import (
    decode_jpeg, jpeg_bytes, jpeg_bytes_color, jpeg_flat_blocks)


def test_gray_rgb_bit_exact_through_color_path():
    """R=G=B flat blocks: chroma lands exactly on 128, so the full color
    machinery (interleave, chroma predictors, YCbCr round trip) must
    reproduce every byte."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    gray = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    rgb = np.repeat(gray[..., None], 3, axis=-1)
    d = decode_jpeg(jpeg_bytes_color(rgb))
    assert d["n_channels"] == 3
    assert (d["width"], d["height"]) == (24, 32)
    assert np.array_equal(d["pixels"], rgb)


def test_true_color_tolerance_unity_quant():
    """Arbitrary RGB content is lossy only through DCT rounding + the
    color matrix round trip: max per-channel error must stay tiny under
    unity quantization."""
    rng = np.random.default_rng(3)
    for shape in ((24, 40, 3), (13, 19, 3), (8, 8, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        d = decode_jpeg(jpeg_bytes_color(img))
        assert (d["width"], d["height"]) == (shape[1], shape[0])
        err = np.abs(d["pixels"].astype(int) - img.astype(int)).max()
        assert err <= 4, err


def test_chroma_quant_table_is_honoured():
    """A coarse chroma table must distort a saturated-color image much
    more than the luma-only path — proving the decoder reads the SECOND
    quant table for components 2/3 rather than reusing table 0."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[..., 0] = 200          # strongly chromatic: red field
    coarse = np.full(64, 50, dtype=np.int64)
    fine = decode_jpeg(jpeg_bytes_color(img))
    rough = decode_jpeg(jpeg_bytes_color(img, quant_chroma=coarse))
    err_fine = np.abs(fine["pixels"].astype(int) - img.astype(int)).max()
    err_rough = np.abs(rough["pixels"].astype(int) - img.astype(int)).max()
    assert err_fine <= 4
    assert err_rough > err_fine


def test_grayscale_encoder_unchanged():
    """The r9 refactor (shared _encode_block) must keep the 1-component
    path bit-identical: fixture images still round-trip exactly."""
    for did in (0, 3, 42, 107):
        px = jpeg_flat_blocks(did)
        d = decode_jpeg(jpeg_bytes(px))
        assert d["n_channels"] == 1
        assert np.array_equal(d["pixels"], px)


def test_color_rejects_bad_shapes():
    with pytest.raises(ValueError):
        jpeg_bytes_color(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg_bytes_color(np.zeros((8, 8, 4), dtype=np.uint8))


def test_color_decode_on_spark(spark, sf_dir):
    """mapInPandas end-to-end: every row equals 3x the grayscale fixture
    arithmetic (gray-RGB exactness contract)."""
    from big_data_assignment_2_spark.operators.multimodal import (
        decode_media_jpeg_color, generate_media_jpeg_color)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id % 17 = 0")
    rows = decode_media_jpeg_color(generate_media_jpeg_color(docs)).collect()
    assert rows
    for r in rows:
        px = jpeg_flat_blocks(int(r["media_id"]))
        assert r["n_channels"] == 3
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["pix_sum"] == 3 * int(px.astype(np.int64).sum())


# --- 4:2:0 subsampled path -------------------------------------------------


def test_420_gray_macroblocks_bit_exact():
    from big_data_assignment_2_spark.operators.multimodal import (
        jpeg_bytes_420, jpeg_flat_macroblocks)

    for did in (0, 7, 23, 104):
        g = jpeg_flat_macroblocks(did)
        rgb = np.repeat(g[..., None], 3, axis=-1)
        d = decode_jpeg(jpeg_bytes_420(rgb))
        assert d["n_channels"] == 3
        assert (d["width"], d["height"]) == (g.shape[1], g.shape[0])
        assert np.array_equal(d["pixels"], rgb)


def test_420_smooth_gradient_tolerance():
    from big_data_assignment_2_spark.operators.multimodal import \
        jpeg_bytes_420

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(xx * 3) % 256, (yy * 2) % 256,
                    ((xx + yy) * 2) % 256], -1).astype(np.uint8)
    d = decode_jpeg(jpeg_bytes_420(img))
    err = np.abs(d["pixels"].astype(int) - img.astype(int)).max()
    assert err <= 8, err


def test_420_subsampling_really_happens():
    """Sharp per-pixel chroma detail must come back WORSE through 4:2:0
    than through 4:4:4 (proof the chroma planes really are half-res),
    while pure-luma detail survives both equally."""
    from big_data_assignment_2_spark.operators.multimodal import \
        jpeg_bytes_420

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    e444 = np.abs(decode_jpeg(jpeg_bytes_color(img))["pixels"].astype(int)
                  - img.astype(int)).mean()
    e420 = np.abs(decode_jpeg(jpeg_bytes_420(img))["pixels"].astype(int)
                  - img.astype(int)).mean()
    assert e420 > 4 * e444
    # 4:2:0 payload is smaller: 6 blocks per 4 luma blocks vs 12.
    assert len(jpeg_bytes_420(img)) < len(jpeg_bytes_color(img))


def test_unsupported_sampling_raises():
    """Sampling factors beyond {1,2} must still raise — the r10 generic
    MCU loop covers 4:4:4/4:2:0/4:2:2/4:4:0, not 4:1:1-style factors."""
    from big_data_assignment_2_spark.operators.multimodal import \
        jpeg_bytes_420

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    payload = jpeg_bytes_420(img)
    i = payload.index(b"\xff\xc0")          # SOF0: ...ncomp, then comps
    patched = bytearray(payload)
    assert patched[i + 11] == 0x22
    patched[i + 11] = 0x41                  # luma 4x1 -> 4:1:1
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(patched))


def test_420_on_spark(spark, sf_dir):
    from big_data_assignment_2_spark.operators.multimodal import (
        decode_media_jpeg_color, generate_media_jpeg_420,
        jpeg_flat_macroblocks)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id % 23 = 0")
    rows = decode_media_jpeg_color(generate_media_jpeg_420(docs)).collect()
    assert rows
    for r in rows:
        g = jpeg_flat_macroblocks(int(r["media_id"]))
        assert (r["width"], r["height"]) == (g.shape[1], g.shape[0])
        assert r["pix_sum"] == 3 * int(g.astype(np.int64).sum())


# --- 4:2:2 (r10) -----------------------------------------------------------

def test_422_flat_rect_bit_exact():
    """Gray flat 8x16 rectangles round-trip bit-exactly through the
    horizontally-subsampled path under unity quant tables."""
    from big_data_assignment_2_spark.operators.multimodal import (
        jpeg_bytes_422, jpeg_flat_rects_422)

    for did in (0, 11, 37):
        g = jpeg_flat_rects_422(did)
        img = np.repeat(g[..., None], 3, axis=-1)
        out = decode_jpeg(jpeg_bytes_422(img))
        assert out["n_channels"] == 3
        assert (out["pixels"] == img).all()


def test_422_preserves_vertical_chroma_detail():
    """4:2:2 halves chroma horizontally ONLY: color varying by ROW
    (vertical detail) survives exactly on flat-rect content, while the
    same detail varying by COLUMN is averaged away — the axis asymmetry
    that distinguishes it from 4:2:0."""
    from big_data_assignment_2_spark.operators.multimodal import \
        jpeg_bytes_422

    # per-ROW alternating color: every 1x2 horizontal chroma box is
    # constant, so 4:2:2 loses nothing beyond DCT rounding…
    img_v = np.zeros((16, 16, 3), dtype=np.uint8)
    img_v[0::2] = (255, 0, 0)
    img_v[1::2] = (0, 0, 255)
    out_v = decode_jpeg(jpeg_bytes_422(img_v))["pixels"]
    err_v = np.abs(out_v.astype(int) - img_v.astype(int)).mean()

    # …while per-COLUMN alternation straddles every box: chroma averages
    # away and the error must be clearly larger.
    img_h = np.zeros((16, 16, 3), dtype=np.uint8)
    img_h[:, 0::2] = (255, 0, 0)
    img_h[:, 1::2] = (0, 0, 255)
    out_h = decode_jpeg(jpeg_bytes_422(img_h))["pixels"]
    err_h = np.abs(out_h.astype(int) - img_h.astype(int)).mean()
    assert err_h > 4 * max(err_v, 1e-9)


def test_422_payload_smaller_than_444_bigger_than_420():
    """Block budget sanity: per 16x16 area 4:4:4 writes 12 blocks, 4:2:2
    writes 8, 4:2:0 writes 6 — payload sizes must order accordingly on
    identical dense content."""
    from big_data_assignment_2_spark.operators.multimodal import (
        jpeg_bytes_420, jpeg_bytes_422, jpeg_bytes_color)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    n444 = len(jpeg_bytes_color(img))
    n422 = len(jpeg_bytes_422(img))
    n420 = len(jpeg_bytes_420(img))
    assert n420 < n422 < n444


def test_422_with_dri_roundtrip():
    from big_data_assignment_2_spark.operators.multimodal import (
        jpeg_bytes_422, jpeg_flat_rects_422)

    g = jpeg_flat_rects_422(42)
    img = np.repeat(g[..., None], 3, axis=-1)
    payload = jpeg_bytes_422(img, restart_interval=2)
    assert b"\xff\xdd" in payload
    out = decode_jpeg(payload)
    assert (out["pixels"] == img).all()

"""Progressive JPEG (SOF2, T.81 Annex G — r11): the multi-scan encoder/
decoder pair must be bit-exact against the BASELINE decode of the same
pixels under the same quant tables, because progression only re-orders
entropy coding — the quantized coefficients are identical by
construction.  Random content exercises every AC path: EOBn runs,
ZRL-in-refinement, deferred correction bits, newly-significant runs."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_assignment_2_spark.operators.multimodal import (
    decode_jpeg, jpeg_bytes, jpeg_bytes_420, jpeg_bytes_progressive,
    jpeg_flat_blocks)


def test_sof2_marker_and_scan_count():
    payload = jpeg_bytes_progressive(jpeg_flat_blocks(3))
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") == 6          # gray 6-scan script


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_gray_random_bit_exact_vs_baseline(seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(8, 70), rng.randint(8, 70)
    px = rng.randint(0, 256, (h, w), dtype=np.uint8)
    q = None if seed % 2 == 0 else \
        (1 + (np.arange(64) % 7)).astype(np.int64)
    base = decode_jpeg(jpeg_bytes(px, quant=q))
    prog = decode_jpeg(jpeg_bytes_progressive(px, quant_luma=q))
    assert prog["n_channels"] == 1
    assert (prog["width"], prog["height"]) == (base["width"],
                                               base["height"])
    assert np.array_equal(prog["pixels"], base["pixels"])


@pytest.mark.parametrize("shape", [(24, 40, 3), (34, 50, 3), (17, 9, 3)])
def test_color_420_bit_exact_vs_baseline(shape):
    """Color progressive = 4:2:0 planes + interleaved DC scan +
    non-interleaved per-component AC scans over the COMPONENT block grid
    (odd sizes make it differ from the MCU-padded grid on luma)."""
    rng = np.random.RandomState(sum(shape))
    px = rng.randint(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(jpeg_bytes_420(px))
    prog = decode_jpeg(jpeg_bytes_progressive(px))
    assert prog["n_channels"] == 3
    assert np.array_equal(prog["pixels"], base["pixels"])


def test_flat_fixture_lossless():
    """Flat blocks under unity quant round-trip bit-exactly through the
    progressive path — the mm_jpeg_progressive oracle contract."""
    for i in (0, 7, 123, 4999):
        px = jpeg_flat_blocks(i)
        out = decode_jpeg(jpeg_bytes_progressive(px))
        assert np.array_equal(out["pixels"], px)
        assert int(out["pixels"].sum()) == int(px.astype(np.int64).sum())


def test_negative_dc_and_refinement_identity():
    """Dark images (negative level-shifted DC) exercise the arithmetic
    right shift + refinement OR identity on negative predictors."""
    px = np.full((16, 24), 3, dtype=np.uint8)
    out = decode_jpeg(jpeg_bytes_progressive(px))
    assert np.array_equal(out["pixels"], px)


def test_spark_query_roundtrip(spark, sf_dir):
    from big_data_assignment_2_spark.operators.multimodal import (
        decode_media_jpeg, generate_media_jpeg_progressive)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    rows = decode_media_jpeg(
        generate_media_jpeg_progressive(docs)).collect()
    assert len(rows) == 20
    for r in rows:
        i = int(r["media_id"])
        px = jpeg_flat_blocks(i)
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["pix_sum"] == int(px.astype(np.int64).sum())

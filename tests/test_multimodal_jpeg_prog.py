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


def _dht_seg(cls: int, tid: int, symbols: list[int], length: int) -> bytes:
    import struct

    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([(cls << 4) | tid] + counts + list(symbols))
    return struct.pack(">HH", 0xFFC4, len(body) + 2) + body


def _build_prog_with_interscan_dht(px: "np.ndarray") -> bytes:
    """A 3-scan grayscale progressive JPEG whose AC table id 0 is
    REDEFINED by a DHT segment BETWEEN the two AC scans (scan 2 encoded
    with table A, scan 3 with a different table B under the same id) —
    the standard libjpeg layout where per-scan table snapshots matter.
    A decoder resolving table ids after the whole marker walk would
    decode scan 2 with table B and produce garbage or errors."""
    import struct

    from big_data_assignment_2_spark.operators.multimodal import (
        _BitWriter, _JPEG_AC_PROG_SYMBOLS, _JPEG_DC_SYMBOLS, _ProgAcState,
        _enc_ac_first, _huff_canonical, _jpeg_mag_bits, _quantized_zz_blocks)

    h, w = px.shape
    pby, pbx = -(-h // 8), -(-w // 8)
    plane = np.pad(px.astype(np.float64),
                   ((0, pby * 8 - h), (0, pbx * 8 - w)), mode="edge") - 128.0
    qmat = np.ones((8, 8), dtype=np.int64)
    coefs = _quantized_zz_blocks(plane, qmat, pby, pbx)

    dc_tab = _huff_canonical(_JPEG_DC_SYMBOLS, 4)
    syms_a = list(_JPEG_AC_PROG_SYMBOLS)
    syms_b = list(reversed(_JPEG_AC_PROG_SYMBOLS))   # same codes, other map
    ac_a = _huff_canonical(syms_a, 9)
    ac_b = _huff_canonical(syms_b, 9)

    bw = _BitWriter()
    prev = 0
    for zz in coefs:                                  # DC scan, Ah=0 Al=0
        diff = zz[0] - prev
        prev = zz[0]
        size, bits = _jpeg_mag_bits(diff) if diff else (0, 0)
        code, n = dc_tab[size]
        bw.write(code, n)
        if size:
            bw.write(bits, size)
    dc_data = bw.flush()

    def ac_scan(ss: int, se: int, tab) -> bytes:
        bw = _BitWriter()
        st = _ProgAcState(bw, tab)
        for zz in coefs:
            _enc_ac_first(st, zz, ss, se, 0)
        st.emit_eobrun()
        return bw.flush()

    ac1 = ac_scan(1, 5, ac_a)
    ac2 = ac_scan(6, 63, ac_b)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(ss: int, se: int) -> bytes:
        return bytes([1, 1, 0x00, ss, se, 0x00])

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, _JPEG_DC_SYMBOLS, 4)
    out += _dht_seg(1, 0, syms_a, 9)                  # AC id 0 := A
    out += seg(0xFFDA, sos(0, 0)) + dc_data
    out += seg(0xFFDA, sos(1, 5)) + ac1               # encoded with A
    out += _dht_seg(1, 0, syms_b, 9)                  # REDEFINE AC id 0 := B
    out += seg(0xFFDA, sos(6, 63)) + ac2              # encoded with B
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("seed", [0, 5])
def test_interscan_dht_redefinition(seed):
    """r12 (round-11 advice): each scan must decode with the Huffman
    tables as defined at ITS OWN SOS — a DHT between scans redefining a
    table id must not leak backward into the earlier scan."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    base = decode_jpeg(jpeg_bytes(px))
    out = decode_jpeg(_build_prog_with_interscan_dht(px))
    assert np.array_equal(out["pixels"], base["pixels"])


def test_ac_table_defined_only_after_first_ac_scan_raises():
    """Fail-loud contract: a scan whose AC table is not yet defined at
    its SOS raises instead of silently using a later definition."""
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    payload = _build_prog_with_interscan_dht(px)
    # Strip the FIRST AC DHT (table A): scan 2's table is now undefined
    # at its SOS even though a later DHT defines id 0.
    first_dht = payload.index(b"\xff\xc4")
    second_dht = payload.index(b"\xff\xc4", first_dht + 2)
    import struct
    ln = struct.unpack_from(">H", payload, second_dht + 2)[0]
    stripped = payload[:second_dht] + payload[second_dht + 2 + ln:]
    with pytest.raises(ValueError, match="undefined at scan's SOS"):
        decode_jpeg(stripped)

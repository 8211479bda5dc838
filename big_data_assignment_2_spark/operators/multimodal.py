"""Multimodal (image/audio/video) column plumbing (extension — not in
reference; required by the north-star brief).

Media are opaque ``binary`` columns + typed metadata.  The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing — is real and tested.  The codec layer is REAL for
formats the standard library can parse — BMP images and WAV audio
(:func:`decode_payload`, byte-level struct/RIFF parsing, certified
cross-engine by the ``mm_decode_real`` oracle row) — and honestly
stubbed for library-bound formats (JPEG/PNG/MP4 raise
``NotImplementedError``; no image/video libraries exist in this
container).  ``decode_image(fake=True)`` keeps the deterministic fake
for exercising pipeline shape with arbitrary payload bytes.

Scale notes: media blobs make rows wide — the loader repartitions by byte
budget, not row count (``target_partition_bytes``), so Arrow batches stay
bounded; metadata extraction (sizes, hashes, magic sniffing) is pure column
expressions and never touches Python.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("payload", BinaryType()),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build an opaque-binary media table from the documents corpus (the
    container ships no real media; payload bytes are the utf-8 text).  The
    pipeline downstream treats payloads as genuinely opaque."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata over opaque payloads — pure column expressions:
    byte size, content digest, 4-byte magic prefix (hex)."""
    return media.select(
        "media_id", "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.lower(F.substring(F.hex("payload"), 1, 8)).alias("magic"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """STUB codec. Real decode needs PIL/ffmpeg (absent here).

    With ``fake=True`` returns deterministic dimensions derived from the
    payload so tests can exercise the full pipeline shape.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in "
            "this environment; pass fake=True for the deterministic stub")
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 30)


def decode_media(media: DataFrame, batch_size: int = 256,
                 fake: bool = True) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas`` — the canonical shape for a
    Python-library step: batches arrive as pandas DataFrames, the codec runs
    per payload, and only typed metadata (not pixels) returns to the JVM."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
            })

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    media.sparkSession.conf.set(conf_key, str(batch_size))
    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


# --- real codecs (round 4) -------------------------------------------------
# BMP and WAV are fully decodable with the standard library (struct/wave) —
# no PIL/ffmpeg needed — so the codec step is REAL for these formats; the
# fake path above remains for exercising pipeline shape with arbitrary
# bytes, and genuinely library-bound formats (JPEG/PNG/MP4) still raise.

def bmp_bytes(width: int, height: int, seed: bytes) -> bytes:
    """A valid 24-bit bottom-up BMP: 54-byte header + padded pixel rows
    (pixel content = repeated seed bytes; only the geometry matters)."""
    import struct

    row = ((3 * width + 3) // 4) * 4
    size = 54 + row * height
    header = (struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            row * height, 2835, 2835, 0, 0))
    seed = seed or b"\x7f"
    px = (seed * (row * height // len(seed) + 1))[: row * height]
    return header + px


def wav_bytes(n_samples: int, sample_rate: int,
              frames: bytes | None = None) -> bytes:
    """A valid mono 16-bit PCM WAV (44-byte RIFF header); ``frames``
    defaults to silence."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames if frames is not None
                      else b"\x00\x00" * n_samples)
    return buf.getvalue()


def synth_waveform(doc_id: int, n_samples: int) -> "object":
    """Deterministic int16 test waveform, s_i = ((7·id + 13·i) mod 201) −
    100 — reproducible arithmetically by an external oracle."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    return ((doc_id * 7 + 13 * i) % 201 - 100).astype("<i2")


def decode_payload(payload: bytes) -> dict:
    """REAL codec dispatch on magic bytes.  BMP → (width, height); WAV →
    (n_channels, sample_rate, n_samples).  Anything else raises — decoding
    JPEG/PNG/MP4 requires libraries absent from this environment."""
    import io
    import struct
    import wave

    if payload[:2] == b"BM":
        width, height = struct.unpack_from("<ii", payload, 18)
        return {"width": int(width), "height": abs(int(height)),
                "n_channels": None, "sample_rate": None, "n_samples": None}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload), "rb") as w:
            return {"width": None, "height": None,
                    "n_channels": w.getnchannels(),
                    "sample_rate": w.getframerate(),
                    "n_samples": w.getnframes()}
    raise NotImplementedError(
        f"no stdlib codec for magic {payload[:4]!r}; JPEG/PNG/MP4 need "
        "image/video libraries not present in this environment")


def generate_media_real(docs: DataFrame, batch_size: int = 256) -> DataFrame:
    """Synthesize a media table with REAL payload bytes: even doc_ids get a
    BMP whose geometry, odd doc_ids a WAV whose sample count/rate, are
    deterministic functions of (doc_id, n_chars) — so an external oracle
    can recompute the expected decode output without parsing bytes."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": []}
            for did, text, n_chars in zip(pdf["doc_id"], pdf["text"],
                                          pdf["n_chars"]):
                did = int(did)
                rows["media_id"].append(str(did))
                if did % 2 == 0:
                    rows["media_type"].append("image")
                    rows["payload"].append(bmp_bytes(
                        8 + did % 32, 8 + did % 17, text.encode()[:16]))
                else:
                    n = 100 + int(n_chars)
                    rows["media_type"].append("audio")
                    rows["payload"].append(wav_bytes(
                        n, 8000 * (1 + did % 2),
                        synth_waveform(did, n).tobytes()))
            yield pd.DataFrame(rows)

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    docs.sparkSession.conf.set(conf_key, str(batch_size))
    return docs.select("doc_id", "text", "n_chars").mapInPandas(
        gen, MEDIA_SCHEMA)


REAL_DECODED_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
])


def decode_media_real(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched REAL decode: stdlib BMP/WAV parsers inside
    ``mapInPandas``; only typed metadata returns to the JVM."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [decode_payload(bytes(p)) for p in pdf["payload"]]
            out = {"media_id": pdf["media_id"],
                   "media_type": pdf["media_type"],
                   "n_bytes": [len(p) for p in pdf["payload"]]}
            for k in ("width", "height", "n_channels", "sample_rate",
                      "n_samples"):
                out[k] = pd.array([m[k] for m in metas], dtype="Int32")
            yield pd.DataFrame(out)

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    media.sparkSession.conf.set(conf_key, str(batch_size))
    return media.mapInPandas(decode_batches, REAL_DECODED_SCHEMA)


def resize_bmp(payload: bytes, target: int = 224) -> bytes:
    """REAL pixel resize: parse the BMP, nearest-neighbor-sample the pixel
    grid to the aspect-preserving target (same floor(x+0.5) arithmetic as
    :func:`resize_plan`), re-encode a valid BMP.  Pure numpy indexing —
    the actual pixel op, not a plan."""
    import struct

    import numpy as np

    meta = decode_payload(payload)
    w, h = meta["width"], meta["height"]
    if w is None:
        raise ValueError("not a BMP payload")
    row = ((3 * w + 3) // 4) * 4
    px = (np.frombuffer(payload, np.uint8, count=row * h, offset=54)
          .reshape(h, row)[:, : 3 * w].reshape(h, w, 3))
    scale = float(target) / max(w, h)
    nw = max(1, int(np.floor(w * scale + 0.5)))
    nh = max(1, int(np.floor(h * scale + 0.5)))
    yi = np.minimum((np.arange(nh) * (h / nh)).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(nw) * (w / nw)).astype(np.int64), w - 1)
    out = px[yi][:, xi]
    orow = ((3 * nw + 3) // 4) * 4
    padded = np.zeros((nh, orow), np.uint8)
    padded[:, : 3 * nw] = out.reshape(nh, 3 * nw)
    header = (struct.pack("<2sIHHI", b"BM", 54 + orow * nh, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, nw, nh, 1, 24, 0,
                            orow * nh, 2835, 2835, 0, 0))
    return header + padded.tobytes()


def resize_media_exec(media: DataFrame, target: int = 224,
                      batch_size: int = 256) -> DataFrame:
    """Execute the pixel resize on every image row (Arrow-batched) and
    re-DECODE the produced bytes — emitting the parsed output geometry, so
    a green oracle row proves the pixel op wrote well-formed BMPs of
    exactly the planned dimensions."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            outs = [decode_payload(resize_bmp(bytes(p), target))
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [0] * len(outs),
                "width": pd.array([o["width"] for o in outs], dtype="Int32"),
                "height": pd.array([o["height"] for o in outs], dtype="Int32"),
                "n_channels": pd.array([None] * len(outs), dtype="Int32"),
                "sample_rate": pd.array([None] * len(outs), dtype="Int32"),
                "n_samples": pd.array([None] * len(outs), dtype="Int32"),
            })

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    media.sparkSession.conf.set(conf_key, str(batch_size))
    return (media.filter(F.col("media_type") == "image")
            .mapInPandas(run, REAL_DECODED_SCHEMA)
            .select("media_id", F.col("width").alias("out_width"),
                    F.col("height").alias("out_height")))


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("n_samples", IntegerType()),
    StructField("sum_sq", LongType()),
    StructField("rms", DoubleType()),
])


def audio_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """REAL DSP on real bytes: parse each WAV's PCM frames with the stdlib
    codec, compute energy features with vectorized numpy (sum of squares,
    RMS) — the transcription-pipeline feature-extraction shape, with
    actual signal math instead of a model stub.  Integer sum_sq is exact;
    RMS is floor-truncated to 6 dp for cross-engine hashing: both engines
    compute the identical IEEE double (exact ints → division → correctly
    rounded sqrt), but Python's round() is half-even while DuckDB's is
    half-away, so a value landing exactly on a 6-dp half boundary would
    diverge under round(); floor(x·1e6)/1e6 is the same function in both
    (round-4 ADVICE)."""
    import io
    import math
    import wave

    import numpy as np
    import pandas as pd

    def feat(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "sum_sq": [], "rms": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    frames = w.readframes(w.getnframes())
                s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                ss = int((s * s).sum())
                # The floor(sqrt(ss/n)*1e6)/1e6 parity argument below
                # requires ss exact in a double: DuckDB converts ss to
                # double BEFORE dividing, which double-rounds once
                # ss >= 2^53 while Python's int/int stays exact
                # (round-5 ADVICE: enforce the precondition, don't
                # assume it).
                assert ss < 2 ** 53, (
                    f"sum_sq {ss} exceeds 2^53; cross-engine rms parity "
                    "precondition broken")
                out["media_id"].append(mid)
                out["n_samples"].append(len(s))
                out["sum_sq"].append(ss)
                out["rms"].append(
                    math.floor(math.sqrt(ss / len(s)) * 1e6) / 1e6
                    if len(s) else 0.0)
            yield pd.DataFrame(out)

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    media.sparkSession.conf.set(conf_key, str(batch_size))
    return (media.filter(F.col("media_type") == "audio")
            .mapInPandas(feat, AUDIO_FEATURES_SCHEMA))


def repartition_by_bytes(media: DataFrame, target_partition_bytes: int = 128 << 20,
                         size_col_bytes: int | None = None) -> DataFrame:
    """Partition a media table by byte budget: estimate total payload bytes,
    choose a partition count that keeps each under target size."""
    total = media.select(F.sum(F.octet_length("payload"))).first()[0] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return media.repartition(n)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode sampled frame indices —
    downstream per-frame decode would join back to payloads."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (decoded.filter(F.col("media_type") == "video")
            .select("media_id",
                    F.explode(idx).alias("frame_idx")))


def resize_plan(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize + letterbox arithmetic for image rows —
    the planning half of a preprocessing resize (the pixel op itself would
    run next to the codec).  `floor(x + 0.5)` rather than round() because
    the two engines disagree on round-half semantics for doubles.
    Pure column expressions."""
    w, h = F.col("width"), F.col("height")
    scale = F.lit(float(target)) / F.greatest(w, h)
    new_w = F.greatest(F.lit(1), F.floor(w * scale + 0.5)).cast("int")
    new_h = F.greatest(F.lit(1), F.floor(h * scale + 0.5)).cast("int")
    return (decoded.filter(F.col("media_type") == "image")
            .select("media_id", "width", "height",
                    new_w.alias("new_width"), new_h.alias("new_height"),
                    F.floor((F.lit(target) - new_w) / 2).cast("int")
                    .alias("pad_left"),
                    F.floor((F.lit(target) - new_h) / 2).cast("int")
                    .alias("pad_top")))


def audio_chunks(media: DataFrame, chunk_bytes: int = 4096) -> DataFrame:
    """Fixed-size chunk boundaries for audio rows (the windowing step of a
    transcription/feature pipeline): explode (chunk_idx, offset, length)
    from the payload size — per-chunk decode would `substr` the payload
    next to the codec.  Column expressions only."""
    n = F.octet_length("payload")
    n_chunks = F.ceil(n.cast("double") / chunk_bytes).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (media.filter(F.col("media_type") == "audio")
            .select("media_id", n.alias("n_bytes"),
                    F.explode(idx).alias("chunk_idx"))
            .select("media_id", "chunk_idx",
                    (F.col("chunk_idx") * chunk_bytes).alias("offset"),
                    F.least(F.lit(chunk_bytes),
                            F.col("n_bytes") - F.col("chunk_idx") * chunk_bytes)
                    .alias("length")))


EMBED_DIM = 4

EMBED_SCHEMA = StructType(
    [StructField("media_id", StringType())]
    + [StructField(f"f{i}", DoubleType()) for i in range(EMBED_DIM)])


def fake_embed(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Feature-extraction shape (CLIP-style embedding stand-in): an
    Arrow-batched ``mapInPandas`` step that maps each payload to a small
    float vector.  The real model is stubbed with a deterministic
    md5-derived projection (digest bytes scaled to [0, 1]) so the full
    Python-UDF plumbing — batch iteration, vector-typed output columns,
    JVM round-trip — is exercised AND SQL-oracle-checkable."""
    import hashlib

    import pandas as pd

    def embed_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            digs = [hashlib.md5(p or b"").digest() for p in pdf["payload"]]
            out = {"media_id": pdf["media_id"]}
            for i in range(EMBED_DIM):
                out[f"f{i}"] = [round(d[i] / 255.0, 6) for d in digs]
            yield pd.DataFrame(out)

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    media.sparkSession.conf.set(conf_key, str(batch_size))
    return media.mapInPandas(embed_batches, EMBED_SCHEMA)

"""Multimodal (image/audio/video) column plumbing (extension — not in
reference; required by the north-star brief).

Media are opaque ``binary`` columns + typed metadata.  The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing — is real and tested; the actual codec step is STUBBED
(`decode_image`) because no image/audio libraries exist in this container:
it raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake decode (dimensions derived from the payload
hash) so the pipeline shape can be exercised end-to-end.

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

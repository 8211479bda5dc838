"""Multimodal family declared queries + oracles (operators/multimodal.py).

The media table is derived in-flight from the documents corpus (payload =
utf-8 text bytes, treated as opaque downstream).  Metadata extraction is
pure column expressions; the decode step runs the deterministic fake codec
through real mapInPandas plumbing — and because the fake derives dimensions
from the md5 digest, even IT has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (decode_media, frame_sample,
                                    media_from_documents, media_metadata)
from ..sources.io import load_table

_MEDIA_CTE = """
media AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
         encode(text) AS payload
  FROM documents)
"""

# The fake codec: md5 digest bytes 0..2 → (width, height, n_frames).
_DECODE_CTE = f"""
{_MEDIA_CTE},
digests AS (
  SELECT media_id, media_type, octet_length(payload) AS n_bytes,
         md5(payload::VARCHAR) AS d
  FROM media),
decoded AS (
  SELECT media_id, media_type, n_bytes,
         CAST(64 + CAST('0x' || substr(d, 1, 2) AS INTEGER) % 192 AS INTEGER) AS width,
         CAST(64 + CAST('0x' || substr(d, 3, 2) AS INTEGER) % 192 AS INTEGER) AS height,
         CAST(1 + CAST('0x' || substr(d, 5, 2) AS INTEGER) % 30 AS INTEGER) AS n_frames
  FROM digests)
"""


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_metadata(media_from_documents(docs))


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_from_documents(docs), fake=True)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(decode_media(media_from_documents(docs), fake=True),
                        every_n=10)


QUERIES = {
    "mm_media_metadata": q_media_metadata,
    "mm_media_decode": q_media_decode,
    "mm_frame_sample": q_frame_sample,
}

ORACLES = {
    "mm_media_metadata": f"""
WITH {_MEDIA_CTE}
SELECT media_id, media_type, octet_length(payload) AS n_bytes,
       md5(payload::VARCHAR) AS digest,
       lower(substr(hex(payload), 1, 8)) AS magic
FROM media
""",
    "mm_media_decode": f"""
WITH {_DECODE_CTE}
SELECT media_id, media_type, n_bytes, width, height, n_frames FROM decoded
""",
    "mm_frame_sample": f"""
WITH {_DECODE_CTE}
SELECT media_id, unnest(range(0, n_frames, 10)) AS frame_idx
FROM decoded WHERE media_type = 'video'
""",
}

"""Multimodal declared queries (SURVEY §2.10).

The feature-extraction path runs through real ``mapInPandas`` plumbing
(Arrow batches over a binary column); the oracle recomputes the same
byte-level features in SQL. The fixture text is ASCII, so UTF-8 byte
values equal codepoints and the SQL ascii()-based recomputation is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import FRAME_BYTES, FRAME_STRIDE, extract_features, media_from_documents
from ..sources.parquet import scan_table
from . import query


@query(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id AS media_id,
           'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(CASE WHEN n_chars = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS INT)
             AS first_byte,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(text, ''),
                                         c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> a + b) AS byte_sum,
           CAST((octet_length(encode(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS INT)
             AS n_frames,
           CAST(((octet_length(encode(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES}
                 + {FRAME_STRIDE - 1}) // {FRAME_STRIDE} AS INT) AS n_sampled_frames
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (SURVEY §2.10): documents → binary media table
    → Arrow-batched mapInPandas feature extraction. The binary column is
    dropped at the operator boundary, so only small feature rows leave
    the stage; no shuffle anywhere in the plan."""
    media = media_from_documents(scan_table(spark, sf_dir, "documents"))
    return extract_features(media)

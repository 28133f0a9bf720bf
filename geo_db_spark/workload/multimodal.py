"""Multimodal-column workload entries over `documents`.

The binary-payload corpus is derived deterministically from document
text (operators/multimodal.py: the decode itself is stubbed — no media
libs in this container — but schema, partitioning and Arrow batch
plumbing are real). Metadata and frame-sampling are pure functions of
the payload bytes, so they get FULL DuckDB oracles (the corpus is
ASCII, so byte == codepoint); the mapInPandas feature extractor is the
genuinely non-SQL-expressible path and is registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    with_binary_payload,
)
from geo_db_spark.session import tune


def mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata of the binary corpus — filterable without touching
    payload bytes (the 100 TB rule: meta in its own struct column)."""
    tune(spark)
    media = with_binary_payload(load(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


ORACLE_MM_META = """
SELECT doc_id,
       'image/fake' AS media_type,
       CAST(length(text) % 640 + 1 AS INT) AS width,
       CAST(length(text) % 480 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per 64-byte offset of each
    payload, produced by Arrow-batched mapInPandas (1 row -> many)."""
    tune(spark)
    media = with_binary_payload(load(spark, sf_dir, "documents"))
    return frame_sample(media, every_n_bytes=64)


ORACLE_MM_FRAMES = """
WITH f AS (
  SELECT doc_id, text,
         CAST(unnest(range((octet_length(encode(text)) + 63) // 64)) AS INT) AS frame_idx
  FROM documents
)
SELECT doc_id, frame_idx,
       CAST(ascii(substr(text, frame_idx * 64 + 1, 1)) AS INT) AS frame_byte
FROM f
"""


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (the model-forward-pass shape):
    per-doc byte-statistics vector. Registered WITHOUT an oracle — the
    float32 batch math is the non-SQL-expressible Pandas path; the
    driver's rows-only check covers it.

    The raw array column is reduced to canonicalizable scalars here
    (ADVICE r2: pandas can't factorize ndarray cells, so returning the
    array made the rows-only check crash — a digest verifies the same
    computation AND actually runs). Rounding to 2 decimals absorbs
    float32 summation jitter; the exact element values are pinned by
    tests/test_multimodal.py against numpy."""
    tune(spark)
    media = with_binary_payload(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    feat_sum = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return feats.select(
        "doc_id",
        F.size("features").alias("n_features"),
        F.round(feat_sum, 2).alias("feat_sum"),
        F.round(F.element_at("features", 1).cast("double"), 2).alias("feat_first"),
    )


def mm_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing under the FULL oracle: keep every 2nd payload
    byte via Arrow-batched mapInPandas, return size + digest of the
    resized payload (never the payload itself). The corpus is ASCII so
    DuckDB reproduces the byte slice with substr arithmetic."""
    tune(spark)
    from geo_db_spark.operators.multimodal import downsample_payload

    media = with_binary_payload(load(spark, sf_dir, "documents"))
    return downsample_payload(media, factor=2).select(
        "doc_id", "n_bytes_out", "resized_md5"
    )


ORACLE_MM_DOWNSAMPLE = """
SELECT doc_id,
       CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS n_bytes_out,
       md5(array_to_string(
           list_transform(range(0, octet_length(encode(text)), 2),
                          i -> substr(text, CAST(i + 1 AS INT), 1)), '')) AS resized_md5
FROM documents
"""


QUERIES = {
    "mm_downsample": mm_downsample,
    "mm_media_meta": mm_media_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_feature_extract": mm_feature_extract,
}

ORACLES = {
    "mm_downsample": ORACLE_MM_DOWNSAMPLE,
    "mm_media_meta": ORACLE_MM_META,
    "mm_frame_sample": ORACLE_MM_FRAMES,
    # mm_feature_extract intentionally absent: rows-only check
}

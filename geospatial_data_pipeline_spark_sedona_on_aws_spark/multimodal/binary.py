"""Multimodal-column plumbing (north-star extension, BASELINE.json): treat
image/audio/video payloads as opaque `binary` columns with typed metadata and
run decode / feature-extract through Arrow-batched mapInPandas.

The container has no image/audio libraries, so the *decode* step is stubbed
(NotImplementedError behind an import-try, plus a deterministic fake used by
tests); the Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and oracle-checked on byte-level features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "n_bytes long, content_hash string"
)

def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the typed binary-media frame from a text column (stand-in for
    real image/audio bytes — same schema, partitioning, and encode path)."""
    return df.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )

def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Real decoder entry point. Image/audio libs are not in this container;
    plug PIL/librosa/etc. here on a real cluster."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; use fake_decode for deterministic tests"
        ) from None
    raise NotImplementedError("real decoder not wired yet")

def fake_decode(payload: bytes) -> dict:
    """Deterministic fake decode: byte-level features standing in for
    decoded-media features (dimensions, duration, ...)."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "byte_sum_mod": sum(payload) % 997,
    }

def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the Arrow batch
    shape real decoders need (one pandas batch of bytes objects per call)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
            })

    return media.mapInPandas(
        run,
        schema="doc_id long, media_type string, n_bytes long, "
               "first_byte long, byte_sum_mod long",
    )

def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: documents → binary payload → mapInPandas features."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(attach_binary_payload(docs))

# Byte-level oracle: documents.text is ASCII in the testdata, so UTF-8 byte
# features have closed forms (strlen = bytes, ascii of first char).
MULTIMODAL_FEATURES_ORACLE = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
       CAST(list_aggregate(list_transform(string_split(text, ''),
           c -> CAST(ascii(c) AS BIGINT)), 'sum') % 997 AS BIGINT) AS byte_sum_mod
FROM documents
"""

# ------------------------------------------------- resize / frame sampling

RESIZE_BYTES = 128    # stand-in for image resize target (bytes kept)
FRAME_BYTES = 64      # stand-in frame size for frame sampling
SAMPLE_EVERY = 4      # keep every 4th frame

def resize_payload(media: DataFrame) -> DataFrame:
    """mapInPandas 'resize': truncate each payload to RESIZE_BYTES and report
    the kept-byte checksum — the exact batch/shape/partitioning a real image
    resize (PIL thumbnail) plugs into; the byte math is the deterministic
    stand-in for decoded pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kept = pdf["payload"].map(lambda b: b[:RESIZE_BYTES])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "resized_bytes": kept.map(len),
                "resized_sum_mod": kept.map(lambda b: sum(b) % 997),
            })

    return media.mapInPandas(
        run, schema="doc_id long, resized_bytes long, resized_sum_mod long"
    )

def frame_sample(media: DataFrame) -> DataFrame:
    """mapInPandas frame sampling: split each payload into FRAME_BYTES-sized
    frames, keep every SAMPLE_EVERY-th (video keyframe sampling shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [payload[i:i + FRAME_BYTES]
                          for i in range(0, len(payload), FRAME_BYTES)]
                sampled = frames[::SAMPLE_EVERY]
                rows.append((doc_id, len(frames), len(sampled),
                             sum(len(f) for f in sampled)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_frames", "n_sampled", "sampled_bytes"])

    return media.mapInPandas(
        run,
        schema="doc_id long, n_frames long, n_sampled long, sampled_bytes long",
    )

def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_payload(attach_binary_payload(docs))

def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return frame_sample(attach_binary_payload(docs))

MULTIMODAL_RESIZE_ORACLE = f"""
SELECT doc_id,
       CAST(least(strlen(text), {RESIZE_BYTES}) AS BIGINT) AS resized_bytes,
       CAST(COALESCE(list_aggregate(list_transform(
           string_split(substring(text, 1, {RESIZE_BYTES}), ''),
           c -> CAST(ascii(c) AS BIGINT)), 'sum'), 0) % 997 AS BIGINT) AS resized_sum_mod
FROM documents
"""

MULTIMODAL_FRAME_SAMPLE_ORACLE = f"""
WITH m AS (
    SELECT doc_id, strlen(text) AS n,
           CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
    FROM documents
)
SELECT doc_id, n_frames,
       CAST(CASE WHEN n_frames = 0 THEN 0
            ELSE (n_frames - 1) // {SAMPLE_EVERY} + 1 END AS BIGINT) AS n_sampled,
       CAST(COALESCE(list_aggregate(list_transform(
           range(0, n_frames::INT, {SAMPLE_EVERY}),
           k -> least({FRAME_BYTES}, n - {FRAME_BYTES} * k)), 'sum'), 0)
           AS BIGINT) AS sampled_bytes
FROM m
"""

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs via
``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_features`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces deterministic byte-level features.
Everything around it — the binary schema, the metadata struct, the Arrow
batch shape, the partition-parallel UDF plumbing — is real and tested,
so swapping in a real decoder (PIL/ffmpeg) is a one-function change.

At 100 TB: binary payloads stay columnar in parquet, the UDF streams
Arrow batches (never materializes a partition), and feature extraction is
a map-only stage — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, media BINARY, media_type STRING, "
    "meta STRUCT<source: STRING, declared_len: BIGINT>"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "first_byte INT, fake_width INT, fake_height INT"
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Wrap the documents table's text as a fake binary media column with
    a typed metadata struct — the plumbing fixture for the decode path."""
    return df.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.col("source").alias("source"), F.col("n_chars").alias("declared_len")
        ).alias("meta"),
    )


def decode_image_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary media.

    Real decode is not available in this environment; ``fake=True``
    computes deterministic byte-level pseudo-features with the exact same
    UDF signature, batch shape, and output schema a real decoder would use.
    """
    if not fake:
        raise NotImplementedError(
            "image decode needs PIL/libvips — not present in this container; "
            "use fake=True for the deterministic byte-feature stub"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            n_bytes = blobs.map(len)
            first = blobs.map(lambda b: int(b[0]) if len(b) else -1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                }
            )

    return media_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id BIGINT, media BINARY, media_type STRING, "
    "out_width INT, out_height INT, n_bytes BIGINT"
)

FRAME_SCHEMA = (
    "doc_id BIGINT, frame_index INT, frame_offset BIGINT, "
    "frame_n_bytes BIGINT, frame BINARY"
)


def resize_images(media_df: DataFrame, width: int = 224, height: int = 224,
                  fake: bool = True) -> DataFrame:
    """Resize stage with the production plumbing (Arrow-batched map-only
    mapInPandas, binary in → binary out, schema carries target dims).

    Real resize needs PIL/libvips — absent here, so ``fake=True`` emits a
    deterministic byte-level stand-in (the payload truncated/cycled to
    width*height bytes); the UDF signature and batch shape are exactly
    what a real decoder drops into."""
    if not fake:
        raise NotImplementedError(
            "image resize needs PIL/libvips — not present in this container; "
            "use fake=True for the deterministic stub"
        )
    target = width * height

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["media"].map(
                lambda b: (b * (target // max(len(b), 1) + 1))[:target]
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": resized,
                "media_type": pdf["media_type"],
                "out_width": width,
                "out_height": height,
                "n_bytes": resized.map(len),
            })

    return media_df.mapInPandas(go, schema=RESIZE_SCHEMA)


def sample_frames(media_df: DataFrame, n_frames: int = 4,
                  fake: bool = True) -> DataFrame:
    """Frame-sampling stage: one media row fans out to ``n_frames`` frame
    rows — the row-explosion shape video decode has at scale (map-only;
    output rows stay in the input partition, no shuffle).

    ``fake=True`` slices the payload into ``n_frames`` equal byte chunks
    (rows with fewer than ``n_frames`` bytes are skipped) instead of
    ffmpeg-decoding; offsets/lengths are real arithmetic over the real
    bytes, so the plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "frame sampling needs ffmpeg — not present in this container; "
            "use fake=True for the deterministic byte-chunk stub"
        )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_index": [], "frame_offset": [],
                   "frame_n_bytes": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                step = len(blob) // n_frames
                if step == 0:
                    continue
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_offset"].append(i * step)
                    out["frame_n_bytes"].append(step)
                    out["frame"].append(blob[i * step:(i + 1) * step])
            yield pd.DataFrame(out)

    return media_df.mapInPandas(go, schema=FRAME_SCHEMA)

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

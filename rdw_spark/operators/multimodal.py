"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs via
``mapInPandas``.

Decode status (round 12): PPM/PGM, uncompressed BMP, and 8-bit
non-interlaced PNG decode is REAL — :func:`decode_images` and
:func:`resize_images_real` run the pure numpy/stdlib codec in
``functions.imagecodec`` (zlib is stdlib; the PNG scanline filters are
implemented there), emitting exact-integer luma features and a 64-bit
average-hash for image near-dup dedup. RIFF/WAVE PCM audio decode is
REAL too — :func:`decode_audio` runs ``functions.wavcodec`` (8/16-bit
PCM, exact-integer energy/peak/zero-crossing features). Multi-frame
GIF decode (LZW implemented in ``functions.gifcodec``) is REAL —
:func:`sample_frames_real` fans media rows out to per-frame luma/ahash
rows. Only codecs that genuinely need native libraries stay stubbed:
JPEG (libjpeg) in the legacy ``decode_image_features(fake=True)``
byte-stub, compressed audio (mp3/ogg/flac) and true video containers
(mp4/webm, ffmpeg) in ``sample_frames``. The plumbing — binary schema,
metadata struct, Arrow batch shape — is shared, so a native decoder
remains a one-function swap.

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
            "this legacy stub has no real path — use decode_images() for "
            "REAL PPM/PGM/BMP/PNG decode (pure numpy/stdlib codec); only "
            "JPEG still needs libjpeg, absent in this container"
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
            "this legacy stub has no real path — use resize_images_real() "
            "for REAL nearest-neighbor resize of codec-supported formats"
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


DECODE_SCHEMA = (
    "doc_id BIGINT, fmt STRING, width INT, height INT, channels INT, "
    "n_pixels BIGINT, luma_sum BIGINT, ahash_hex STRING, error STRING"
)


def decode_images(
    media_df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    on_error: str = "keep",
) -> DataFrame:
    """REAL image decode for the no-native-library formats — PPM/PGM,
    uncompressed BMP, 8-bit non-interlaced PNG — via the pure
    numpy/stdlib codec in ``functions.imagecodec`` (zlib inflate + the
    five PNG scanline filters included). Emits per image: format,
    dimensions, channels, and two parity-exact features — the integer
    luma sum (consumers divide by ``n_pixels`` for mean brightness; the
    integers are engine/partition-invariant where a float mean is not)
    and the 64-bit average-hash perceptual fingerprint as 16 hex chars
    (group on it, or hamming-compare, for near-duplicate IMAGE dedup —
    the visual twin of the text fingerprint path). JPEG/video remain
    stubbed (libjpeg/ffmpeg genuinely absent).

    ``on_error``: 'keep' emits the row with NULL features and the
    message in ``error``; 'skip' drops undecodable rows; 'fail' raises.

    Scale shape: map-only Arrow-batched ``mapInPandas`` — binary stays
    columnar, batches stream, no shuffle."""
    if on_error not in ("keep", "skip", "fail"):
        raise ValueError(f"on_error must be keep|skip|fail, got {on_error!r}")
    from ..functions import imagecodec as IC

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "fmt", "width", "height",
                                   "channels", "n_pixels", "luma_sum",
                                   "ahash_hex", "error")}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    img = IC.decode_image(bytes(blob))
                    g = IC.to_gray(img)
                    out["doc_id"].append(doc_id)
                    out["fmt"].append(IC.sniff_format(bytes(blob)))
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["channels"].append(img.shape[2])
                    out["n_pixels"].append(int(g.size))
                    out["luma_sum"].append(int(g.sum(dtype="uint64")))
                    out["ahash_hex"].append(f"{IC.ahash64(img):016x}")
                    out["error"].append(None)
                except ValueError as e:
                    if on_error == "fail":
                        raise
                    if on_error == "skip":
                        continue
                    out["doc_id"].append(doc_id)
                    out["fmt"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["n_pixels"].append(None)
                    out["luma_sum"].append(None)
                    out["ahash_hex"].append(None)
                    out["error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(go, schema=DECODE_SCHEMA)


def resize_images_real(
    media_df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL nearest-neighbor resize for codec-supported formats: decode
    (``functions.imagecodec``), index-sample to (height, width) with the
    exact integer grid ``src_i = (dst_i · src_n) DIV dst_n``, re-encode
    as PPM (P6; P5 for 1–2 channel inputs) — deterministic bytes out,
    no float resampling. Undecodable rows are DROPPED (use
    :func:`decode_images` with on_error='keep' to audit them first);
    the fake byte-stub path for arbitrary blobs stays in
    :func:`resize_images`. Map-only, no shuffle."""
    if width < 1 or height < 1:
        raise ValueError(f"bad target size {width}x{height}")
    import numpy as np

    from ..functions import imagecodec as IC

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media": [], "media_type": [],
                   "out_width": [], "out_height": [], "n_bytes": []}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    img = IC.decode_image(bytes(blob))
                except ValueError:
                    continue
                ys = (np.arange(height) * img.shape[0]) // height
                xs = (np.arange(width) * img.shape[1]) // width
                small = img[np.ix_(ys, xs)]
                if small.shape[2] >= 3:
                    enc = IC.encode_ppm(small[:, :, :3])
                    mt = "image/x-portable-pixmap"
                else:
                    enc = IC.encode_ppm(small[:, :, 0])
                    mt = "image/x-portable-graymap"
                out["doc_id"].append(doc_id)
                out["media"].append(enc)
                out["media_type"].append(mt)
                out["out_width"].append(width)
                out["out_height"].append(height)
                out["n_bytes"].append(len(enc))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(go, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id BIGINT, sample_rate INT, n_channels INT, n_frames BIGINT, "
    "energy BIGINT, peak INT, zero_crossings BIGINT, "
    "fingerprint_hex STRING, error STRING"
)


def decode_audio(
    media_df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    on_error: str = "keep",
) -> DataFrame:
    """REAL audio decode for RIFF/WAVE PCM (8-bit unsigned / 16-bit
    signed, any channel count) via the pure numpy/stdlib codec in
    ``functions.wavcodec`` — the audio twin of :func:`decode_images`.
    Emits exact-integer features over the channel-mixed signal: frame
    count, energy ``Σx²`` (int64-safe to ~2e9 frames), peak ``max|x|``,
    the zero-crossing count (sign flips with zeros carrying the
    previous sign — the silence/speech activity proxy), and the 64-bit
    energy-delta fingerprint as 16 hex chars (``wav_fingerprint`` —
    group/band on it for audio near-dup dedup, the ahash64 of the
    audio path). Compressed
    audio (mp3/ogg/flac) genuinely needs native codecs and is not
    handled here.

    ``on_error``: 'keep' emits the row with NULL features and the
    message in ``error``; 'skip' drops; 'fail' raises.

    Scale shape: map-only Arrow-batched ``mapInPandas``; no shuffle."""
    if on_error not in ("keep", "skip", "fail"):
        raise ValueError(f"on_error must be keep|skip|fail, got {on_error!r}")
    from ..functions import wavcodec as WC

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "n_channels",
                                   "n_frames", "energy", "peak",
                                   "zero_crossings", "fingerprint_hex",
                                   "error")}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    samples, rate = WC.decode_wav(bytes(blob))
                    f = WC.wav_features(samples)
                    out["doc_id"].append(doc_id)
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(samples.shape[1])
                    out["n_frames"].append(f["n_frames"])
                    out["energy"].append(f["energy"])
                    out["peak"].append(f["peak"])
                    out["zero_crossings"].append(f["zero_crossings"])
                    out["fingerprint_hex"].append(
                        f"{WC.wav_fingerprint(samples):016x}")
                    out["error"].append(None)
                except ValueError as e:
                    if on_error == "fail":
                        raise
                    if on_error == "skip":
                        continue
                    out["doc_id"].append(doc_id)
                    for k in ("sample_rate", "n_channels", "n_frames",
                              "energy", "peak", "zero_crossings",
                              "fingerprint_hex"):
                        out[k].append(None)
                    out["error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(go, schema=AUDIO_SCHEMA)


FRAME_REAL_SCHEMA = (
    "doc_id BIGINT, frame_index INT, n_frames_total INT, width INT, "
    "height INT, luma_sum BIGINT, ahash_hex STRING, error STRING"
)


def sample_frames_real(
    media_df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    media_col: str = "media",
    on_error: str = "keep",
) -> DataFrame:
    """REAL frame sampling over multi-frame GIF (LZW decode in
    ``functions.gifcodec``): pick ``n_frames`` evenly by the exact
    integer grid ``src = (i · total) DIV n`` and emit per sampled frame
    the dimensions, exact-integer luma sum, and ahash64 perceptual
    fingerprint (near-dup keys across frames catch static/looping
    videos — a standard training-data screen). One media row fans out
    to ≤ n_frames rows, map-only, no shuffle — the row-explosion shape
    video decode has at scale. Animations with fewer frames than
    ``n_frames`` emit each frame once (no repeats). True video codecs
    (mp4/webm) still need ffmpeg and stay stubbed in
    :func:`sample_frames`.

    ``on_error``: 'keep' emits one row with NULL features and the
    message; 'skip' drops; 'fail' raises."""
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    if on_error not in ("keep", "skip", "fail"):
        raise ValueError(f"on_error must be keep|skip|fail, got {on_error!r}")
    from ..functions import gifcodec as GC
    from ..functions import imagecodec as IC

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_index",
                                   "n_frames_total", "width", "height",
                                   "luma_sum", "ahash_hex", "error")}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    raw = bytes(blob)
                    # two-phase: block-walk for the frame count, then
                    # LZW-decode ONLY the sampled indices — 4 of 200
                    # frames costs 4 decodes, not 200
                    total = GC.gif_frame_count(raw)
                    picks = sorted({(i * total) // n_frames
                                    for i in range(n_frames)})
                    frames = dict(zip(picks, GC.decode_gif(
                        raw, only=set(picks))))
                except ValueError as e:
                    if on_error == "fail":
                        raise
                    if on_error == "skip":
                        continue
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(None)
                    out["n_frames_total"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["luma_sum"].append(None)
                    out["ahash_hex"].append(None)
                    out["error"].append(str(e))
                    continue
                for fi in picks:
                    img = frames[fi]
                    g = IC.to_gray(img)
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(fi)
                    out["n_frames_total"].append(total)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["luma_sum"].append(int(g.sum(dtype="uint64")))
                    out["ahash_hex"].append(f"{IC.ahash64(img):016x}")
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(go, schema=FRAME_REAL_SCHEMA)

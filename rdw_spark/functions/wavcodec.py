"""Pure numpy/stdlib WAV codec — REAL decode for RIFF/WAVE PCM audio
(8-bit unsigned and 16-bit signed, any channel count). Together with
``imagecodec`` this un-stubs the multimodal decode path for every
container-decodable format; compressed audio (mp3/ogg/flac) genuinely
needs native codecs and stays stubbed in ``operators.multimodal``.

Deterministic byte arithmetic throughout: same blob → same sample
matrix → same features on every engine, partition, and run.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_wav(blob: bytes) -> bool:
    return blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV blob to ``(samples, sample_rate)`` where samples
    is (n_frames, n_channels) int32 — 8-bit unsigned is re-centered to
    signed (v − 128), 16-bit little-endian passes through. Raises
    ValueError on non-PCM or truncated input — every corruption mode
    (incl. struct.error on short chunks) is normalized to ValueError so
    the operators' keep/skip/fail policy holds on dirty data."""
    try:
        return _decode_wav_inner(blob)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt WAV blob: {e}") from e


def _decode_wav_inner(blob: bytes) -> tuple[np.ndarray, int]:
    if not sniff_wav(blob):
        raise ValueError("not a RIFF/WAVE blob")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(blob):
        cid = blob[i:i + 4]
        size = struct.unpack_from("<I", blob, i + 4)[0]
        body = blob[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated WAV fmt chunk")
    audio_fmt, n_ch, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt)
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format {audio_fmt} (need PCM)")
    if n_ch < 1:
        raise ValueError("bad WAV channel count 0")
    if bits == 8:
        raw = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    elif bits == 16:
        usable = len(data) - (len(data) % 2)
        raw = np.frombuffer(data[:usable], "<i2").astype(np.int32)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (need 8/16)")
    frames = len(raw) // n_ch
    return raw[: frames * n_ch].reshape(frames, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """PCM WAV encoder (the test/fixture twin of :func:`decode_wav`).
    ``samples`` is (n_frames, n_channels) int; 8-bit re-centers to
    unsigned on write."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    if bits == 8:
        payload = (a.astype(np.int32) + 128).clip(0, 255).astype(
            np.uint8).tobytes()
    elif bits == 16:
        payload = a.astype("<i2").tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    align = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * align, align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload
              + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_features(samples: np.ndarray) -> dict:
    """Exact-integer audio features over the channel-mixed signal
    (sum across channels — integer, no float resample): frame count,
    energy ``sum(x²)``, peak ``max|x|``, and the zero-crossing count
    (sign flips between consecutive mixed samples, zeros carrying the
    previous sign — the deterministic convention)."""
    mix = samples.sum(axis=1, dtype=np.int64)
    n = int(mix.size)
    if n == 0:
        return {"n_frames": 0, "energy": 0, "peak": 0, "zero_crossings": 0}
    sgn = np.sign(mix)
    # zeros inherit the previous nonzero sign (leading zeros drop)
    nz = sgn != 0
    idx = np.where(nz, np.arange(n), -1)
    np.maximum.accumulate(idx, out=idx)
    carried = np.where(idx >= 0, sgn[np.maximum(idx, 0)], 0)
    flips = int(np.sum((carried[1:] * carried[:-1]) < 0))
    # int64 energy envelope: |mix| ≤ ch·32768, squares ≤ ~4.3e9 for
    # stereo 16-bit, so sums stay in int64 up to ~2e9 frames (>6h audio)
    return {
        "n_frames": n,
        "energy": int(np.sum(mix * mix, dtype=np.int64)),
        "peak": int(np.max(np.abs(mix))),
        "zero_crossings": flips,
    }


def wav_fingerprint(samples: np.ndarray, bits: int = 64) -> int:
    """Energy-delta audio fingerprint — the audio twin of
    ``imagecodec.ahash64``: split the channel-mixed signal into
    ``bits + 1`` windows on the exact integer grid
    ``w_i = (i · n) DIV (bits + 1)``, take each window's integer energy
    ``Σx²``, and emit one bit per adjacent pair (1 when energy rose) —
    the sign-of-delta shape classic audio fingerprints (Haitsma–Kalker
    family) reduce to without a spectral transform. Bit-stable across
    engines/partitions (pure integer comparisons); near-identical
    recordings (small noise, level shifts that preserve dynamics) hash
    close in Hamming distance, so group or band on it for audio
    near-dup dedup. Signals shorter than ``bits + 1`` frames tile
    cyclically (the small-image ahash convention)."""
    if bits < 1:
        raise ValueError(f"bits must be >= 1, got {bits}")
    mix = samples.sum(axis=1, dtype=np.int64)
    n = int(mix.size)
    if n == 0:
        return 0
    if n < bits + 1:
        mix = np.tile(mix, (bits + 1 + n - 1) // n)
        n = int(mix.size)
    bounds = (np.arange(bits + 2, dtype=np.int64) * n) // (bits + 1)
    sq = mix * mix
    cum = np.concatenate([[0], np.cumsum(sq, dtype=np.int64)])
    energies = cum[bounds[1:]] - cum[bounds[:-1]]
    out = 0
    for i in range(bits):
        out = (out << 1) | int(energies[i + 1] > energies[i])
    return out

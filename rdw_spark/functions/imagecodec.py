"""Pure numpy/stdlib image codec — REAL decode for the formats that need
no native library: PPM/PGM (P5/P6), uncompressed BMP (24/32-bit), and
8-bit non-interlaced PNG (zlib is in the Python stdlib; the five PNG
scanline filters are implemented here). This un-stubs the multimodal
decode path for lossless pipeline formats; compressed codecs that need
libjpeg/ffmpeg (JPEG, video) remain stubbed in ``operators.multimodal``.

Everything is deterministic byte arithmetic: same blob → same array →
same features on every engine, partition, and run. No Spark imports —
this module is plain numpy so the Arrow-batched UDFs in
``operators.multimodal`` can call it per blob.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type → channel count (8-bit, non-paletted)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(blob: bytes) -> str | None:
    """Magic-byte format sniff for the formats this codec decodes."""
    if blob[:8] == PNG_SIG:
        return "png"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] in (b"P5", b"P6"):
        return "pnm"
    return None


def decode_image(blob: bytes) -> np.ndarray:
    """Decode a supported blob to an (H, W, C) uint8 array (C in
    {1, 2, 3, 4}, W and H >= 1). Raises ValueError on unsupported or
    corrupt input — EVERY corruption mode, including truncated headers
    (struct.error), broken deflate streams (zlib.error), and short
    buffers (IndexError), is normalized to ValueError here so the
    operators' ``except ValueError`` keep/skip/fail policy actually
    holds on dirty data."""
    fmt = sniff_format(blob)
    try:
        if fmt == "png":
            img = _decode_png(blob)
        elif fmt == "bmp":
            img = _decode_bmp(blob)
        elif fmt == "pnm":
            img = _decode_pnm(blob)
        else:
            raise ValueError(
                "unsupported image format (need PNG/BMP/PPM/PGM)")
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt {fmt or 'image'} blob: {e}") from e
    if img.shape[0] < 1 or img.shape[1] < 1:
        raise ValueError(f"degenerate image dims {img.shape[:2]}")
    return img


# ---------------------------------------------------------------------------
# PNM (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------

def _pnm_tokens(blob: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers, honoring
    ``#`` comments, returning (values, offset-after-last-token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        if i >= len(blob):
            raise ValueError("truncated PNM header")
        c = blob[i:i + 1]
        if c == b"#":
            while i < len(blob) and blob[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(blob) and not blob[j:j + 1].isspace():
                j += 1
            tok = blob[i:j]
            if not tok.isdigit():
                raise ValueError(f"bad PNM header token {tok!r}")
            vals.append(int(tok))
            i = j
    return vals, i


def _decode_pnm(blob: bytes) -> np.ndarray:
    channels = 3 if blob[:2] == b"P6" else 1
    (w, h, maxval), i = _pnm_tokens(blob, 3, 2)
    if maxval != 255:
        # a maxval < 255 PNM is legal but its values would need 255/maxval
        # rescaling to be intensities — rejected rather than silently
        # producing wrong luma/ahash (the interlaced-PNG treatment)
        raise ValueError(f"unsupported PNM maxval {maxval} (need 255)")
    i += 1  # exactly one whitespace byte after maxval per spec
    need = w * h * channels
    data = blob[i:i + need]
    if len(data) < need:
        raise ValueError("truncated PNM payload")
    return np.frombuffer(data, np.uint8).reshape(h, w, channels)


def encode_ppm(arr: np.ndarray) -> bytes:
    """P6/P5 encoder (the test/fixture twin of :func:`_decode_pnm`)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c == 1:
        return b"P5 %d %d 255\n" % (w, h) + a.tobytes()
    if c == 3:
        return b"P6 %d %d 255\n" % (w, h) + a.tobytes()
    raise ValueError(f"PPM supports 1 or 3 channels, got {c}")


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit, BITMAPINFOHEADER+)
# ---------------------------------------------------------------------------

def _decode_bmp(blob: bytes) -> np.ndarray:
    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", blob, 18)
    bitcount = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0 or bitcount not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bitcount={bitcount}, compression={compression})")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    bottom_up = h > 0
    h = abs(h)
    c = bitcount // 8
    stride = (w * c + 3) & ~3
    need = stride * h
    raw = blob[data_off:data_off + need]
    if len(raw) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, : w * c]
    img = rows.reshape(h, w, c)
    if bottom_up:
        img = img[::-1]
    # BGR(A) → RGB(A)
    if c == 3:
        img = img[:, :, ::-1]
    else:
        img = img[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PNG (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced)
# ---------------------------------------------------------------------------

def _decode_png(blob: bytes) -> np.ndarray:
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = None
    channels = None
    idat = bytearray()
    while i + 8 <= len(blob):
        length = struct.unpack_from(">I", blob, i)[0]
        ctype = blob[i + 4:i + 8]
        body = blob[i + 8:i + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + body + crc
    if w is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG payload size mismatch")
    scan = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = scan[:, 0]
    out = np.zeros((h, stride), np.uint8)
    bpp = channels
    for y in range(h):
        line = scan[y, 1:].copy()
        up = out[y - 1] if y else np.zeros(stride, np.uint8)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + up
        elif f == 1:  # Sub — a per-channel running sum, vectorized
            cols = line.reshape(-1, bpp)
            out[y] = (np.cumsum(cols.astype(np.int64), axis=0) % 256
                      ).astype(np.uint8).reshape(stride)
        elif f in (3, 4):  # Average / Paeth need (left, up) — plain-int
            # scalar loop (np scalar wrapping per pixel dominated batch
            # decode before; ints are ~20x cheaper)
            row = out[y]
            lv = line.tolist()
            uv = up.tolist()
            rv = [0] * stride
            for x in range(stride):
                left = rv[x - bpp] if x >= bpp else 0
                u = uv[x]
                if f == 3:
                    rv[x] = (lv[x] + (left + u) // 2) & 0xFF
                else:
                    ul = uv[x - bpp] if x >= bpp else 0
                    p = left + u - ul
                    pa = abs(p - left)
                    pb = abs(p - u)
                    pc = abs(p - ul)
                    pred = (left if pa <= pb and pa <= pc
                            else (u if pb <= pc else ul))
                    rv[x] = (lv[x] + pred) & 0xFF
            row[:] = rv
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, channels)


def encode_png_gray(arr: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 everywhere) — the
    test/fixture twin of :func:`_decode_png`."""
    a = np.asarray(arr, np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_png_gray takes an (H, W) array")
    h, w = a.shape
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def to_gray(img: np.ndarray) -> np.ndarray:
    """(H, W) uint8 luma: integer BT.601-ish weights (77, 150, 29)/256 —
    exact integer arithmetic, engine-independent."""
    if img.shape[2] == 1:
        return img[:, :, 0]
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def ahash64(img: np.ndarray, grid: int = 8) -> int:
    """Average-hash perceptual fingerprint: grid×grid block means of the
    luma plane, thresholded at their mean, packed row-major into an int
    (64 bits at grid=8) — the classic near-duplicate image key. Block
    means use integer sums over an exact block partition (each pixel in
    exactly one block), so the hash is bit-stable everywhere."""
    g = to_gray(img)
    h, w = g.shape
    if h < grid or w < grid:
        # tile small images up to the grid rather than failing
        g = np.tile(g, ((grid + h - 1) // h, (grid + w - 1) // w))
        h, w = g.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    # block sums via two reduceat passes (vectorized — a per-block
    # Python loop dominates batch decoding otherwise)
    rowsum = np.add.reduceat(g.astype(np.int64), ys[:-1], axis=0)
    sums = np.add.reduceat(rowsum, xs[:-1], axis=1)
    counts = (np.diff(ys)[:, None] * np.diff(xs)[None, :]).astype(np.int64)
    # compare block_sum * total_count vs total_sum * block_count — exact
    # integer cross-multiplication, no float means (int64-safe: sums ≤
    # 255·h·w and counts ≤ h·w, so the products stay < 2^63 for any
    # image under ~3.8e8 total pixels per axis product)
    total_sum = int(sums.sum())
    total_cnt = int(counts.sum())
    bits = (sums * total_cnt) > (counts * total_sum)
    return int(np.packbits(bits.ravel()).view(">u8")[0]) if grid == 8 \
        else int("".join("1" if b else "0"
                         for b in bits.ravel()), 2)

"""Pure numpy/stdlib GIF codec — REAL multi-frame decode (GIF87a/89a,
LZW decompression implemented here) so the video-shaped frame-sampling
path runs on real bytes. Subset contract, stated plainly:

- Frames are rendered INDEPENDENTLY onto the logical screen filled with
  the background color — no inter-frame disposal compositing (a frame
  sampler wants per-frame pixels, not an animation player's canvas
  state). Transparency indices render as the palette color.
- Interlaced images are rejected (the fixture encoder never emits them).

Deterministic byte arithmetic throughout; the encoder emits a valid
LZW stream using a clear code before every symbol (no compression, no
dictionary growth — constant code size), which every decoder accepts.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_gif(blob: bytes) -> bool:
    return blob[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF-variant LZW: variable code width, LSB-first bit packing,
    clear/end control codes, dictionary capped at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # base table built once; reset truncates back to it — O(entries
    # added since the last clear), not O(alphabet) (streams that clear
    # often, like this module's fixture encoder, would otherwise spend
    # the whole decode rebuilding root tables)
    base_len = clear + 2
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    def reset() -> int:
        del table[base_len:]
        return min_code_size + 1

    width = reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out)


def gif_frame_count(blob: bytes) -> int:
    """Number of image blocks, by walking block structure only — no LZW
    work (what a sampler needs to pick frame indices before decoding)."""
    return _walk_gif(blob, only=frozenset())[1]


def decode_gif(blob: bytes,
               only: "set[int] | frozenset[int] | None" = None
               ) -> list[np.ndarray]:
    """Decode image blocks to (H, W, 3) uint8 frames on the logical
    screen (background-filled, no disposal compositing). ``only``
    restricts LZW decode + rendering to those frame indices (ascending
    order in the result) — other frames are block-walked and skipped,
    so sampling 4 of 200 frames pays 4 decodes, not 200. Every
    corruption mode (struct.error/IndexError/...) surfaces as
    ValueError so the operators' error policy holds."""
    frames, _n = _walk_gif(blob, only)
    if only is None and not frames:
        raise ValueError("GIF contains no image blocks")
    return frames


def _walk_gif(blob, only):
    try:
        return _walk_gif_inner(blob, only)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt GIF blob: {e}") from e


def _walk_gif_inner(blob: bytes, only) -> tuple[list[np.ndarray], int]:
    if not sniff_gif(blob):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[i:i + 3 * n], np.uint8).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("truncated global color table")
        i += 3 * n
    frames: list[np.ndarray] = []
    n_images = 0
    while i < len(blob):
        b0 = blob[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks, skip
            i += 2
            while i < len(blob) and blob[i] != 0:
                i += 1 + blob[i]
            i += 1
        elif b0 == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", blob, i + 1)
            i += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(blob[i:i + 3 * n], np.uint8).reshape(n, 3)
                i += 3 * n
            if pal is None:
                raise ValueError("GIF image with no color table")
            min_code = blob[i]
            i += 1
            wanted = only is None or n_images in only
            data = bytearray()
            while i < len(blob) and blob[i] != 0:
                sz = blob[i]
                if wanted:
                    data += blob[i + 1:i + 1 + sz]
                i += 1 + sz
            i += 1
            if wanted:  # unwanted frames are block-walked, never LZW'd
                idx = np.frombuffer(
                    _lzw_decode(min_code, bytes(data), iw * ih), np.uint8)
                if idx.size < iw * ih:
                    raise ValueError("truncated GIF frame")
                if int(idx.max(initial=0)) >= pal.shape[0]:
                    raise ValueError("GIF index out of palette range")
                rect = pal[idx.reshape(ih, iw)]
                canvas = np.empty((h, w, 3), np.uint8)
                canvas[:] = (gct[bg] if gct is not None
                             and bg < gct.shape[0] else 0)
                canvas[iy:iy + ih, ix:ix + iw] = rect[: h - iy, : w - ix]
                frames.append(canvas)
            n_images += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if n_images == 0:
        raise ValueError("GIF contains no image blocks")
    return frames, n_images


def encode_gif(frames_idx: list[np.ndarray], palette: np.ndarray) -> bytes:
    """Multi-frame GIF encoder over palette-index frames (each (H, W)
    uint8) with one global color table — the fixture twin of
    :func:`decode_gif`. The LZW stream emits a clear code before every
    symbol: zero compression, constant code width, universally valid."""
    pal = np.asarray(palette, np.uint8)
    npal = pal.shape[0]
    bits = max(2, int(npal - 1).bit_length())
    size = 1 << bits
    if pal.shape[0] < size:
        pal = np.vstack([pal, np.zeros((size - npal, 3), np.uint8)])
    h, w = frames_idx[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    clear = 1 << bits
    end = clear + 1
    width = bits + 1
    for fr in frames_idx:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        if int(fr.max(initial=0)) >= npal:
            raise ValueError("index out of palette")
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(bits)  # LZW min code size
        acc = 0
        nbits = 0
        stream = bytearray()
        # clear BEFORE every symbol: the decoder resets each time, so
        # its table never grows and its code width stays at bits+1 —
        # matching this fixed-width writer
        syms = [x for v in fr.ravel() for x in (clear, int(v))] + [end]
        for sym in syms:
            acc |= sym << nbits
            nbits += width
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        for off in range(0, len(stream), 255):
            chunk = stream[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)

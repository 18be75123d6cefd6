"""Pure-stdlib PNG pixel codec (zlib + numpy) — makes the one honest stub
in the multimodal surface real for a public format.

The reference environment has no Pillow; PNG needs none: the container is
length-prefixed chunks with CRC32s (stdlib ``zlib.crc32``), the pixel
stream is DEFLATE (stdlib ``zlib.decompress``), and the per-scanline
filters are byte arithmetic (numpy). Decoder scope (rejections are
explicit ``PngError``s, never wrong pixels):

- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette, 8-bit), 4
  (gray+alpha), 6 (RGBA)
- interlace 0 only (Adam7 rejected)
- chunk CRCs verified; truncated/corrupt streams raise

Filter reconstruction is vectorized where the recurrence allows: None and
Up are whole-row numpy; Sub is a per-channel modular cumsum (the
``recon[x] = filt[x] + recon[x-bpp]`` recurrence is linear, so cumsum mod
256 solves it in one op); Average and Paeth are sequential in x by
definition (nonlinear predictor on the left neighbor) and run as a
per-pixel-column loop over the row — O(width) python steps on the rows
that use them. Spark-side cost note: this runs inside mapInPandas over
image ROWS; the mandate bans per-Spark-row Python, not per-pixel work
inside a codec kernel (same position as the audio LUT decoders).

Encoder: minimal, for round-trip tests and small report images —8-bit
gray/RGB/RGBA, per-row filter selectable (exercises every decoder filter
path), fixed zlib level for determinism.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed/unsupported PNG — decode refused, never wrong pixels."""


def _chunks(raw: bytes):
    if not raw.startswith(_MAGIC):
        raise PngError("bad magic")
    i = len(_MAGIC)
    n = len(raw)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", raw[i : i + 4])
        ctype = raw[i + 4 : i + 8]
        end = i + 8 + length
        if end + 4 > n:
            raise PngError(f"truncated chunk {ctype!r}")
        data = raw[i + 8 : end]
        (crc,) = struct.unpack(">I", raw[end : end + 4])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"crc mismatch in {ctype!r}")
        yield ctype, data
        i = end + 4
        if ctype == b"IEND":
            return
    raise PngError("no IEND")


#: Decode refusal threshold: h*w above this raises PngError instead of
#: allocating (64 Mpx ~= 256 MB RGBA — far above any validation-report
#: image, far below an executor-OOM allocation). Untrusted payloads must
#: degrade to decode_ok=False, never take the worker down.
MAX_PIXELS = 1 << 26


def decode_png(raw: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels);
    channels per color type (palette expands to 3). Raises PngError on
    anything malformed or out of scope.

    Bomb-safe by construction: the claimed dimensions are capped at
    ``max_pixels`` BEFORE any allocation, and the IDAT inflate is bounded
    at the exact byte count the IHDR implies — a decompression bomb stops
    at that bound (``decompressobj`` + ``max_length``) and is refused; it
    is never materialized."""
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(raw):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) != 13:
        raise PngError("missing/short IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth}")
    if ctype_i not in _CHANNELS:
        raise PngError(f"unsupported color type {ctype_i}")
    if comp != 0 or filt != 0:
        raise PngError("nonstandard compression/filter method")
    if interlace != 0:
        raise PngError("interlaced (Adam7) not supported")
    if w == 0 or h == 0:
        raise PngError("zero dimension")
    if w * h > max_pixels:
        raise PngError(f"image {w}x{h} exceeds max_pixels={max_pixels}")
    if not idat:
        raise PngError("no IDAT")
    bpp = _CHANNELS[ctype_i]  # bytes per pixel (8-bit depth)
    stride = w * bpp
    expected = h * (stride + 1)
    dec = zlib.decompressobj()
    try:
        # inflate at most expected+1 bytes: a bomb is detected one byte
        # past the IHDR-implied size without ever being materialized
        stream = dec.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    if len(stream) != expected:
        raise PngError(
            f"pixel stream is {'>' if len(stream) > expected else ''}"
            f"{len(stream)} bytes, expected {expected}"
        )
    flt = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride + 1)
    filters = flt[:, 0]
    if (filters > 4).any():
        raise PngError(f"bad filter byte {int(filters.max())}")
    data = flt[:, 1:].astype(np.int32)  # room for modular arithmetic
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        row = data[y]
        if f == 0:  # None
            cur = row.copy()
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub: linear recurrence -> per-channel modular cumsum
            cur = row.reshape(w, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif f == 3:  # Average: left is sequential, above vectorized
            cur = np.empty(stride, dtype=np.int32)
            cur[:bpp] = (row[:bpp] + prev[:bpp] // 2) & 0xFF
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] = (
                    row[x : x + bpp]
                    + (cur[x - bpp : x] + prev[x : x + bpp]) // 2
                ) & 0xFF
        else:  # 4 Paeth
            cur = np.empty(stride, dtype=np.int32)
            cur[:bpp] = (row[:bpp] + prev[:bpp]) & 0xFF  # a=c=0 -> paeth=b
            for x in range(bpp, stride, bpp):
                a = cur[x - bpp : x]
                b = prev[x : x + bpp]
                c = prev[x - bpp : x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                cur[x : x + bpp] = (row[x : x + bpp] + pred) & 0xFF
        recon[y] = cur
        prev = cur
    px = recon.astype(np.uint8).reshape(h, w, bpp)
    if ctype_i == 3:
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            raise PngError("palette image without valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= len(pal):
            raise PngError("palette index out of range")
        px = pal[idx]
    return px


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(px: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 (h, w) or (h, w, {1,3,4}) -> PNG bytes. ``filter_type`` applies
    to every scanline (0-4) — deliberately selectable so tests exercise
    every decoder reconstruction path."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise PngError(f"unsupported channel count {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise PngError(f"bad filter type {filter_type}")
    flat = px.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    out_rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        left = np.zeros(stride, dtype=np.int32)
        left[ch:] = row[:-ch]
        upleft = np.zeros(stride, dtype=np.int32)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            f = row
        elif filter_type == 1:
            f = row - left
        elif filter_type == 2:
            f = row - prev
        elif filter_type == 3:
            f = row - (left + prev) // 2
        else:
            f = row - _paeth_pred(left, prev, upleft)
        out_rows.append(bytes([filter_type]) + (f & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype_b
            + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows), level)
    return _MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")

"""From-scratch PNG codec — stdlib ``zlib`` + numpy, no PIL.

Decode scope (documented, checked, raises outside it): color types 0
(grayscale, 1/2/4/8/16-bit), 2 (RGB, 8/16), 3 (palette, 1/2/4/8-bit,
PLTE + optional tRNS alpha — expanded to RGB/RGBA on decode), 4
(gray+alpha, 8/16), 6 (RGBA, 8/16); all five scanline filters
(None/Sub/Up/Average/Paeth); Adam7 interlaced inputs decode
pass-by-pass (r5). That covers every PNG this engine writes and
crawled palette/16-bit/interlaced PNGs. Encode stays 8-bit
non-interlaced types 0/2/6.

Same build-it-from-the-spec approach as ``sources/dicom.py`` (PS3.10
parser): the wire format is public (RFC 2083), the container gives us
real pixels for the multimodal stages without adding image libraries to
the image.

Decode cost: one ``zlib.decompress`` + a per-row unfilter pass. None/Up
rows are fully vectorized; Sub/Average/Paeth rows carry a within-row
dependency so they run a per-pixel-column loop — fine for the thumbnail /
feature-extraction grain these stages run at (the actor-pool stage holds
no state beyond the codec, so throughput scales with ``concurrency``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class UnsupportedPng(ValueError):
    """Valid PNG, but outside this codec's documented scope."""


class BadPng(ValueError):
    """Not a PNG / corrupt structure."""


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise BadPng("missing PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise BadPng(f"truncated {ctype!r} chunk")
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise BadPng(f"CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise BadPng("no IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


_ALLOWED_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


# Adam7 pass geometry: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """(h, stride+1) filtered bytes -> (h, stride) uint8 scanline bytes."""
    height = raw.shape[0]
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)  # headroom for the filter arithmetic
    out = np.zeros((height, stride), np.int64)
    for y in range(height):
        f, cur = int(filters[y]), rows[y]
        prev = out[y - 1] if y else np.zeros(stride, np.int64)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 1:  # Sub — within-row dependency
            line = out[y]
            line[:bpp] = cur[:bpp]
            for x in range(bpp, stride):
                line[x] = (cur[x] + line[x - bpp]) & 0xFF
        elif f == 3:  # Average
            line = out[y]
            line[:bpp] = (cur[:bpp] + prev[:bpp] // 2) & 0xFF
            for x in range(bpp, stride):
                line[x] = (cur[x] + (line[x - bpp] + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            line = out[y]
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise BadPng(f"filter type {f}")
    return out.astype(np.uint8)


def _samples(img8: np.ndarray, bit_depth: int, width: int, ch: int) -> np.ndarray:
    """(h, stride) scanline bytes -> (h, width*ch) samples (uint8, or
    uint16 for 16-bit inputs)."""
    height, stride = img8.shape
    if bit_depth == 16:
        hi = img8[:, 0::2].astype(np.uint16)
        lo = img8[:, 1::2].astype(np.uint16)
        return ((hi << 8) | lo)[:, : width * ch]
    if bit_depth < 8:
        # sub-byte samples: MSB-first within each scanline byte (ch == 1)
        bits = np.unpackbits(img8, axis=1)
        per = bit_depth
        n_samp = stride * 8 // per
        grouped = bits[:, : n_samp * per].reshape(height, n_samp, per)
        weights = (1 << np.arange(per - 1, -1, -1)).astype(np.int64)
        return (grouped * weights).sum(axis=2)[:, :width].astype(np.uint8)
    return img8[:, : width * ch]


def decode_png(data: bytes) -> np.ndarray:
    """-> pixel array: uint8 or uint16 (16-bit inputs), shape (h, w) for
    grayscale, (h, w, ch) otherwise. Palette images (color type 3) come
    back EXPANDED to RGB uint8 — RGBA when a tRNS chunk adds alpha.
    Adam7 interlaced images decode pass-by-pass (r5)."""
    width = height = None
    color_type = bit_depth = None
    interlace = 0
    idat = bytearray()
    plte = trns = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if color_type not in _ALLOWED_DEPTHS:
                raise UnsupportedPng(f"color type {color_type}")
            if bit_depth not in _ALLOWED_DEPTHS[color_type]:
                raise UnsupportedPng(
                    f"bit depth {bit_depth} for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise BadPng(f"interlace method {interlace}")
            if comp or filt:
                raise BadPng("unknown compression/filter method")
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise BadPng("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color_type == 3:
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise BadPng("no IHDR")
    if color_type == 3 and plte is None:
        raise BadPng("palette image without PLTE")
    ch = _CHANNELS[color_type]
    bits_px = ch * bit_depth
    bpp = max(1, bits_px // 8)  # filter byte offset
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise BadPng(f"IDAT inflate failed: {e}") from None
    samp_t = np.uint16 if bit_depth == 16 else np.uint8

    if not interlace:
        stride = (width * bits_px + 7) // 8
        if len(raw) != height * (stride + 1):
            raise BadPng("decompressed size mismatch")
        rawm = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
        idx = _samples(_unfilter(rawm, stride, bpp), bit_depth, width, ch)
    else:
        idx = np.zeros((height, width * ch), samp_t)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            stride = (wp * bits_px + 7) // 8
            need = hp * (stride + 1)
            if pos + need > len(raw):
                raise BadPng("decompressed size mismatch (interlaced)")
            rawm = np.frombuffer(
                raw[pos : pos + need], np.uint8
            ).reshape(hp, stride + 1)
            pos += need
            sub = _samples(_unfilter(rawm, stride, bpp), bit_depth, wp, ch)
            rows = y0 + dy * np.arange(hp)
            colpix = x0 + dx * np.arange(wp)
            cols = (colpix[:, None] * ch + np.arange(ch)).ravel()
            idx[np.ix_(rows, cols)] = sub
        if pos != len(raw):
            raise BadPng("decompressed size mismatch (interlaced)")

    if color_type == 3:
        pal_idx = idx.reshape(height, width)
        if int(pal_idx.max(initial=0)) >= len(plte):
            raise BadPng("palette index out of range")
        rgb = plte[pal_idx]  # (h, w, 3) uint8
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[pal_idx]])
        return rgb
    if bit_depth < 8:  # grayscale 1/2/4-bit: scale to full 8-bit range
        scale = 255 // ((1 << bit_depth) - 1)
        return (idx * scale).astype(np.uint8)
    img = idx
    return img.reshape(height, width) if ch == 1 else img.reshape(height, width, ch)


def encode_png(img: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 (h, w) / (h, w, 3) / (h, w, 4) -> PNG bytes. ``filter_type``
    applies one filter to every scanline (0 is the fast default; 1-4 exist
    so tests can exercise every decoder branch)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        ch, color_type = 1, 0
        h, w = img.shape
        flat = img
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, ch = img.shape
        color_type = 2 if ch == 3 else 6
        flat = img.reshape(h, w * ch)
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    stride = w * ch
    rows = flat.astype(np.int64)
    zeros_col = np.zeros((h, ch), np.int64)
    left = np.concatenate([zeros_col, rows[:, :-ch]], axis=1) if stride > ch else (
        np.zeros_like(rows)
    )
    up = np.vstack([np.zeros((1, stride), np.int64), rows[:-1]])
    up_left = np.concatenate([zeros_col, up[:, :-ch]], axis=1) if stride > ch else (
        np.zeros_like(rows)
    )
    if filter_type == 0:
        filtered = rows
    elif filter_type == 1:
        filtered = rows - left
    elif filter_type == 2:
        filtered = rows - up
    elif filter_type == 3:
        filtered = rows - (left + up) // 2
    elif filter_type == 4:
        p = left + up - up_left
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, up_left)
        )
        filtered = rows - pred
    else:
        raise ValueError(f"filter type {filter_type}")
    body = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), (filtered & 0xFF).astype(np.uint8)],
        axis=1,
    ).tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body, level))
        + chunk(b"IEND", b"")
    )

"""From-scratch baseline JPEG (JFIF) codec — stdlib + numpy, no PIL.

Decode scope (documented, checked, raises outside it): baseline DCT
(SOF0), Huffman entropy coding, 8-bit samples, 1-component grayscale or
3-component YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart
markers (DRI/RSTn), 8- or 16-bit quantization tables. Progressive
(SOF2), arithmetic coding, 12-bit, and CMYK inputs raise
``UnsupportedJpeg`` so a pipeline can quarantine them instead of
mis-decoding — the same build-it-from-the-spec approach as
``multimodal/png.py`` and ``sources/dicom.py`` (the wire format is
public: ITU-T T.81 + JFIF).

Encode scope: baseline 4:4:4 (and grayscale) with the Annex K example
quantization tables scaled by the libjpeg quality formula and the Annex
K typical Huffman tables — enough to make deterministic fixtures and
thumbnails without an image library; every encoder output is within the
decoder's scope.

Cost shape: Huffman symbol decode is a per-symbol Python loop (inherent
bit-serial dependency), but dequant + inverse zigzag + IDCT run batched
over ALL blocks of a component in one einsum — the arithmetic-heavy part
is vectorized. Fine for the thumbnail / feature-extraction grain of the
actor-pool stages (``multimodal/stages.py``), which hold the codec once
per actor.

Reference anchor: the reference engine treats binary attachments as
opaque payloads (InsertDataRDB byte columns); decode here powers the
repo's multimodal extension stages (SURVEY.md LLM-pipeline additions).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpeg(ValueError):
    """Valid JPEG, but outside this codec's documented baseline scope."""


class BadJpeg(ValueError):
    """Not a JPEG / corrupt structure."""


# zigzag scan order: _ZIGZAG[i] = raster index of the i-th scanned coeff
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)

# orthonormal 8-point DCT-II matrix: IDCT2(X) = A.T @ X @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


# --- Annex K tables (public spec constants) --------------------------------

K_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    np.int64,
)
K_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    np.int64,
)

# Annex K typical Huffman tables: (bits[1..16], values)
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], values: list[int]):
    """-> {(length, code): symbol} and the encoder map symbol -> (code, length)."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


# --- bit reader over entropy-coded data ------------------------------------


class _BitReader:
    """MSB-first bit reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # feed zeros past the end (spec: pad bits)
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:  # stuffed byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                    self.marker = nxt
                    continue
                else:  # real marker: stop feeding
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Byte-align and consume an expected RSTn marker."""
        self.nbits = 0
        self.bitbuf = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None
            return
        # marker not yet buffered: scan forward
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise BadJpeg("missing restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map the n-bit received value to its signed range."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_sym(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise BadJpeg("invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """-> uint8 (h, w) grayscale or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise BadJpeg("missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise BadJpeg(f"expected marker at {pos}")
        while data[pos + 1] == 0xFF:  # optional fill bytes before a marker
            pos += 1
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    raise BadJpeg("bad DQT precision")
                q = np.zeros(64, np.int64)
                q[_ZZ] = tbl  # de-zigzag into raster order
                qt[tq] = q.reshape(8, 8)
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)], _ = _canonical_codes(bits, values)
                p += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline / ext sequential)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise UnsupportedJpeg(f"{prec}-bit samples")
            if nc not in (1, 3):
                raise UnsupportedJpeg(f"{nc}-component image (1/3 supported)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(f"SOF marker 0x{m:02X} (baseline SOF0 only)")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise BadJpeg("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, pos + 2 + seglen, frame, qt, huff, scan, restart_interval
            )
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise BadJpeg("no SOS segment")


def _decode_scan(data, pos, frame, qt, huff, scan, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise UnsupportedJpeg("sampling factors beyond 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across, padded to MCU grid
        c["bh"] = mcuy * c["v"]
        c["coeffs"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["dc_t"], c["ac_t"] = scan[c["id"]]
        c["pred"] = 0

    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            br.sync_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcux)
        for c in comps:
            dc_tbl = huff[(0, c["dc_t"])]
            ac_tbl = huff[(1, c["ac_t"])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, np.int64)
                    t = _decode_sym(br, dc_tbl)
                    diff = _extend(br.receive(t), t)
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = _decode_sym(br, ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise BadJpeg("AC run past block end")
                        blk[k] = _extend(br.receive(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coeffs"][row * c["bw"] + col] = blk
    # --- batched dequant + inverse zigzag + IDCT per component ------------
    planes = []
    for c in comps:
        # qt is stored in raster order already; de-zigzag the COEFFS
        raster = np.zeros_like(c["coeffs"])
        raster[:, _ZZ] = c["coeffs"]
        deq = raster.astype(np.float64) * qt[c["tq"]].reshape(1, 64)
        blocks = deq.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A, optimize=True)
        px = np.clip(np.round(spatial + 128), 0, 255).astype(np.uint8)
        bh, bw = c["bh"], c["bw"]
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (sample replication), crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int64)


def _encode_block(wtr, blk, q, dc_enc, ac_enc, pred):
    coeff = _A @ (blk.astype(np.float64) - 128.0) @ _A.T
    zz = np.round(coeff.reshape(64)[_ZZ] / q.reshape(64)[_ZZ]).astype(np.int64)
    diff = int(zz[0]) - pred
    mag = abs(diff)
    n = int(mag).bit_length()
    code, length = dc_enc[n]
    wtr.write(code, length)
    if n:
        v = diff if diff >= 0 else diff + (1 << n) - 1
        wtr.write(v & ((1 << n) - 1), n)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            wtr.write(code, length)
            run -= 16
        n2 = abs(v).bit_length()
        code, length = ac_enc[(run << 4) | n2]
        wtr.write(code, length)
        vv = v if v >= 0 else v + (1 << n2) - 1
        wtr.write(vv & ((1 << n2) - 1), n2)
        run = 0
    if run:
        code, length = ac_enc[0x00]  # EOB
        wtr.write(code, length)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    *,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    (Annex K tables scaled by the libjpeg quality formula).
    ``subsampling``: "444" (default) or "420" (2x2-mean chroma);
    ``restart_interval``: emit DRI + RSTn markers every N MCUs."""
    if subsampling not in ("444", "420"):
        raise ValueError(subsampling)
    img = np.ascontiguousarray(img, np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    lq = _quality_scale(K_LUMA_Q, quality).reshape(8, 8)
    cq = _quality_scale(K_CHROMA_Q, quality).reshape(8, 8)
    _, dc_l = _canonical_codes(*K_DC_LUMA)
    _, ac_l = _canonical_codes(*K_AC_LUMA)
    _, dc_c = _canonical_codes(*K_DC_CHROMA)
    _, ac_c = _canonical_codes(*K_AC_CHROMA)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]
    sub420 = subsampling == "420" and not gray
    mcu = 16 if sub420 else 8
    ph, pw = (h + mcu - 1) // mcu * mcu, (w + mcu - 1) // mcu * mcu
    padded = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    if sub420:
        # 2x2-mean chroma downsample (the padded dims are multiples of 16)
        padded = [padded[0]] + [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in padded[1:]
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"  # identifier, version 1.1, units=0
        + struct.pack(">HH", 1, 1)  # aspect-ratio densities
        + b"\x00\x00"  # no thumbnail
    )

    def seg(marker: bytes, payload: bytes):
        out.extend(marker + struct.pack(">H", len(payload) + 2) + payload)

    def zz_bytes(q8: np.ndarray) -> bytes:
        return bytes(int(x) for x in q8.reshape(64)[_ZZ])

    seg(b"\xff\xdb", b"\x00" + zz_bytes(lq))
    if not gray:
        seg(b"\xff\xdb", b"\x01" + zz_bytes(cq))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hv = 0x22 if (sub420 and i == 0) else 0x11
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    seg(b"\xff\xc0", sof)
    if restart_interval:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    def dht(tc, th, spec):
        bits, values = spec
        seg(
            b"\xff\xc4",
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(values),
        )

    dht(0, 0, K_DC_LUMA)
    dht(1, 0, K_AC_LUMA)
    if not gray:
        dht(0, 1, K_DC_CHROMA)
        dht(1, 1, K_AC_CHROMA)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", sos)

    wtr = _BitWriter()
    preds = [0] * nc
    tabs = [(lq, dc_l, ac_l)] + [(cq, dc_c, ac_c)] * (nc - 1)
    mcux, mcuy = pw // mcu, ph // mcu
    rst = 0
    mi = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mi and mi % restart_interval == 0:
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * nc
            for ci in range(nc):
                q, dce, ace = tabs[ci]
                rep = 2 if (sub420 and ci == 0) else 1
                for by in range(rep):
                    for bx in range(rep):
                        y0 = (my * rep + by) * 8
                        x0 = (mx * rep + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            wtr, blk, q, dce, ace, preds[ci]
                        )
            mi += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

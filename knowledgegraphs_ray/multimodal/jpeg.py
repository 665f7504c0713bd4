"""From-scratch baseline JPEG (JFIF) codec — stdlib + numpy, no PIL.

Decode scope (documented, checked, raises outside it): baseline DCT
(SOF0/SOF1) AND progressive (SOF2 — spectral selection + successive
approximation, DC/AC first and refinement scans, EOB runs), Huffman
entropy coding, 8-bit samples, 1-component grayscale or 3-component
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart markers
(DRI/RSTn), 8- or 16-bit quantization tables. Arithmetic coding,
12-bit, hierarchical, and CMYK inputs raise ``UnsupportedJpeg`` so a
pipeline can quarantine them instead of mis-decoding — the same
build-it-from-the-spec approach as ``multimodal/png.py`` and
``sources/dicom.py`` (the wire format is public: ITU-T T.81 + JFIF).

Encode scope: baseline 4:4:4 / 4:2:0 (and grayscale) with the Annex K
example quantization tables scaled by the libjpeg quality formula and
the Annex K typical Huffman tables; ``progressive=True`` emits the
libjpeg-style successive-approximation scan script (4:4:4/grayscale,
real EOB runs) with the SAME quantized coefficients as the baseline
path — so progressive-decode == baseline-decode bit-exactly, which is
how the progressive decoder is pinned in tests. Every encoder output is
within the decoder's scope.

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


def decode_jpeg(data: bytes, *, scale: int = 1) -> np.ndarray:
    """-> uint8 (h, w) grayscale or (h, w, 3) RGB.

    ``scale=8``: DC-only thumbnail decode at 1/8 resolution — the IDCT of
    a DC-only block is the constant dc*q00/8, so the whole einsum +
    upsample stage collapses to one vector op per component (the
    crawl-scale thumbnailing fast path; entropy decoding still walks the
    full Huffman stream, which the format requires)."""
    if scale not in (1, 8):
        raise ValueError("scale must be 1 or 8")
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
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise UnsupportedJpeg(f"{prec}-bit samples")
            if nc not in (1, 3):
                raise UnsupportedJpeg(f"{nc}-component image (1/3 supported)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": m == 0xC2}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(
                f"SOF marker 0x{m:02X} (baseline SOF0 / progressive SOF2 only)"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise BadJpeg("SOS before SOF")
            if frame["progressive"]:
                _init_geometry(frame)
                pos = _decode_prog_scan(
                    data, pos + 2 + seglen, seg, frame, huff, restart_interval
                )
                continue
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, pos + 2 + seglen, frame, qt, huff, scan,
                restart_interval, scale=scale,
            )
        # APPn / COM / others: skip
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and "mcux" in frame:
        return _finish(frame, qt, scale=scale)
    raise BadJpeg("no SOS segment")


def _init_geometry(frame):
    """Once per frame: MCU grid, per-component padded storage dims (bw,
    bh) and non-interleaved scan dims (cw, ch_), zeroed coeff buffers."""
    if "mcux" in frame:
        return
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise UnsupportedJpeg("sampling factors beyond 2 unsupported")
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = (w + 8 * hmax - 1) // (8 * hmax)
    frame["mcuy"] = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = frame["mcux"] * c["h"]
        c["bh"] = frame["mcuy"] * c["v"]
        # non-interleaved scans iterate the component's ACTUAL block dims
        cpw = (w * c["h"] + hmax - 1) // hmax
        cph = (h * c["v"] + vmax - 1) // vmax
        c["cw"] = (cpw + 7) // 8
        c["ch_"] = (cph + 7) // 8
        c["coeffs"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["pred"] = 0


def _next_marker(data: bytes, pos: int) -> int:
    """First non-stuffed, non-RST marker at/after ``pos``."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    raise BadJpeg("entropy data ran off the end")


def _dc_unit(br, c, idx, Ah, Al, huff):
    coef = c["coeffs"][idx]
    if Ah == 0:
        t = _decode_sym(br, huff[(0, c["dc_t"])])
        c["pred"] += _extend(br.receive(t), t)
        coef[0] = c["pred"] << Al
    elif br.read_bit():
        coef[0] |= 1 << Al


def _ac_first(br, coef, Ss, Se, Al, tbl, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = _decode_sym(br, tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+receive(r) blocks incl. this
                return (1 << r) - 1 + br.receive(r)
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise BadJpeg("AC run past band end")
        coef[k] = _extend(br.receive(s), s) << Al
        k += 1
    return 0


def _ac_refine(br, coef, Ss, Se, Al, tbl, eobrun):
    """T.81 G.1.2.3 AC successive-approximation refinement."""
    p1 = 1 << Al
    m1 = -(1 << Al)

    def correct(k):
        # libjpeg rule: append the refinement bit unless already present
        if br.read_bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = _decode_sym(br, tbl)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + br.receive(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history slots
            else:
                if s != 1:
                    raise BadJpeg("bad AC-refinement size")
                newval = p1 if br.read_bit() else m1
            while k <= Se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval != 0 and k <= Se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:  # EOB band: corrections for surviving coefficients
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data, pos, seg, frame, huff, restart_interval):
    """One progressive scan; returns the offset of the next marker."""
    ns = seg[0]
    params = []
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        params.append((cs, tt >> 4, tt & 15))
    Ss, Se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    Ah, Al = ahal >> 4, ahal & 15
    by_id = {c["id"]: c for c in frame["comps"]}
    scomps = []
    for cs, dct, act in params:
        c = by_id.get(cs)
        if c is None:
            raise BadJpeg(f"scan references unknown component {cs}")
        c["dc_t"], c["ac_t"] = dct, act
        scomps.append(c)
    br = _BitReader(data, pos)
    if Ss == 0:
        if Se != 0:
            raise BadJpeg("DC scan with Se != 0")
        for c in scomps:
            c["pred"] = 0
        if ns > 1:  # interleaved over the MCU grid
            mcux = frame["mcux"]
            for mi in range(mcux * frame["mcuy"]):
                if restart_interval and mi and mi % restart_interval == 0:
                    br.sync_restart()
                    for c in scomps:
                        c["pred"] = 0
                my, mx = divmod(mi, mcux)
                for c in scomps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                            _dc_unit(br, c, idx, Ah, Al, huff)
        else:
            c = scomps[0]
            for mi in range(c["cw"] * c["ch_"]):
                if restart_interval and mi and mi % restart_interval == 0:
                    br.sync_restart()
                    c["pred"] = 0
                row, col = divmod(mi, c["cw"])
                _dc_unit(br, c, row * c["bw"] + col, Ah, Al, huff)
    else:
        if ns != 1:
            raise BadJpeg("AC scans must be non-interleaved")
        c = scomps[0]
        tbl = huff[(1, c["ac_t"])]
        eobrun = 0
        for mi in range(c["cw"] * c["ch_"]):
            if restart_interval and mi and mi % restart_interval == 0:
                br.sync_restart()
                eobrun = 0
            row, col = divmod(mi, c["cw"])
            coef = c["coeffs"][row * c["bw"] + col]
            fn = _ac_first if Ah == 0 else _ac_refine
            eobrun = fn(br, coef, Ss, Se, Al, tbl, eobrun)
    return _next_marker(data, br.pos)


def _decode_scan(data, pos, frame, qt, huff, scan, restart_interval, scale=1):
    comps = frame["comps"]
    _init_geometry(frame)
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    for c in comps:
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
    return _finish(frame, qt, scale=scale)


def _finish(frame, qt, scale=1):
    """Batched dequant + inverse zigzag + IDCT + upsample + color;
    ``scale=8`` emits the DC-only 1/8-scale thumbnail instead."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    if scale == 8:
        th, tw = (h + 7) // 8, (w + 7) // 8
        planes = []
        for c in comps:
            q00 = float(qt[c["tq"]][0, 0])
            dc = c["coeffs"][:, 0].astype(np.float64)
            px = np.clip(np.round(dc * q00 / 8.0 + 128), 0, 255).astype(
                np.uint8
            ).reshape(c["bh"], c["bw"])
            ry, rx = vmax // c["v"], hmax // c["h"]
            if ry > 1 or rx > 1:
                px = np.repeat(np.repeat(px, ry, axis=0), rx, axis=1)
            planes.append(px[:th, :tw])
        if len(planes) == 1:
            return planes[0]
        y, cb, cr = (p.astype(np.float64) for p in planes)
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
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


def _quant_zz(blk: np.ndarray, q: np.ndarray) -> np.ndarray:
    """8x8 spatial block -> quantized coefficients in zigzag order."""
    coeff = _A @ (blk.astype(np.float64) - 128.0) @ _A.T
    return np.round(coeff.reshape(64)[_ZZ] / q.reshape(64)[_ZZ]).astype(np.int64)


def _encode_block(wtr, blk, q, dc_enc, ac_enc, pred):
    zz = _quant_zz(blk, q)
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


def _emit_bits_value(wtr, v: int, s: int):
    vv = v if v >= 0 else v + (1 << s) - 1
    wtr.write(vv & ((1 << s) - 1), s)


def _prog_ac_table(base):
    """AC table for progressive scans: the baseline symbol set plus the
    EOBn symbols (0x10..0xE0). The Annex K tables have no canonical code
    space left at length 16 for 14 more symbols, so the progressive
    tables use uniform 9-bit codes (2^9 = 512 >= 176 symbols, last code
    never all-ones) — legal, deterministic, a few percent larger
    output."""
    _, values = base
    ext = list(values) + [r << 4 for r in range(1, 15)]
    bits = [0] * 16
    bits[8] = len(ext)  # every symbol at code length 9
    return bits, ext


def _emit_ac_scan(wtr, blocks, Ss, Se, Al, enc, refine: bool):
    """Progressive AC scan emission with real EOB runs — the exact mirror
    of ``_ac_first`` / ``_ac_refine`` including the interleaving of
    correction bits with the symbol walk (refinement scans)."""
    run = 0
    runbits: list[list[int]] = []  # per run-member correction bits

    def flush_run():
        nonlocal run, runbits
        while run:
            chunk = min(run, 32767)
            r = chunk.bit_length() - 1
            c, l = enc[r << 4]
            wtr.write(c, l)
            if r:
                wtr.write(chunk - (1 << r), r)
            for bl in runbits[:chunk]:
                for b in bl:
                    wtr.write(b, 1)
            runbits = runbits[chunk:]
            run -= chunk

    n_band = Se - Ss + 1
    for zz in blocks:
        va = [abs(int(zz[Ss + i])) for i in range(n_band)]
        if not refine:
            mags = [v >> Al for v in va]
            nz = [i for i, m in enumerate(mags) if m]
            if not nz:
                run += 1
                runbits.append([])
                continue
            flush_run()
            r = 0
            last = nz[-1]
            for i in range(last + 1):
                m = mags[i]
                if m == 0:
                    r += 1
                    continue
                while r > 15:
                    c, l = enc[0xF0]
                    wtr.write(c, l)
                    r -= 16
                s = m.bit_length()
                c, l = enc[(r << 4) | s]
                wtr.write(c, l)
                _emit_bits_value(wtr, m if int(zz[Ss + i]) >= 0 else -m, s)
                r = 0
            if last < n_band - 1:  # trailing zeros: this block opens a run
                run = 1
                runbits = [[]]
            continue
        # --- refinement scan: Ah = Al + 1 history ------------------------
        hist = [(v >> (Al + 1)) != 0 for v in va]
        newpos = [
            i for i, v in enumerate(va) if not hist[i] and (v >> Al) != 0
        ]
        if not newpos:
            run += 1
            runbits.append(
                [(va[i] >> Al) & 1 for i in range(n_band) if hist[i]]
            )
            continue
        flush_run()
        i = 0
        for npos in newpos:
            zeros = sum(1 for j in range(i, npos) if not hist[j])
            while zeros > 15:
                c, l = enc[0xF0]
                wtr.write(c, l)
                z = 0
                while z < 16:  # decoder walk: corrections interleave here
                    if hist[i]:
                        wtr.write((va[i] >> Al) & 1, 1)
                    else:
                        z += 1
                    i += 1
                zeros -= 16
            c, l = enc[(zeros << 4) | 1]
            wtr.write(c, l)
            wtr.write(1 if int(zz[Ss + npos]) > 0 else 0, 1)
            for j in range(i, npos):
                if hist[j]:
                    wtr.write((va[j] >> Al) & 1, 1)
            i = npos + 1
        if i < n_band:  # tail: rest-of-band corrections open a run
            run = 1
            runbits = [[(va[j] >> Al) & 1 for j in range(i, n_band) if hist[j]]]
    flush_run()


def encode_jpeg(
    img: np.ndarray,
    *,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    (Annex K tables scaled by the libjpeg quality formula).
    ``subsampling``: "444" (default), "420" (2x2-mean chroma), or "422"
    (horizontal 2-mean chroma); ``restart_interval``: emit DRI + RSTn
    markers every N MCUs. ``progressive``: SOF2 with the libjpeg-style
    successive-approximation script (DC Al=1 -> DC refine ->
    per-component AC Al=1 -> AC refine, real EOB runs); any subsampling,
    no restarts. The quantized coefficients are identical to the
    baseline encoder's, so progressive-decode == baseline-decode
    bit-exactly (the test pin)."""
    if subsampling not in ("444", "420", "422"):
        raise ValueError(subsampling)
    if progressive and restart_interval:
        raise ValueError("progressive encoder does not emit restarts")
    img = np.ascontiguousarray(img, np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    lq = _quality_scale(K_LUMA_Q, quality).reshape(8, 8)
    cq = _quality_scale(K_CHROMA_Q, quality).reshape(8, 8)
    ac_luma_spec = _prog_ac_table(K_AC_LUMA) if progressive else K_AC_LUMA
    ac_chroma_spec = (
        _prog_ac_table(K_AC_CHROMA) if progressive else K_AC_CHROMA
    )
    _, dc_l = _canonical_codes(*K_DC_LUMA)
    _, ac_l = _canonical_codes(*ac_luma_spec)
    _, dc_c = _canonical_codes(*K_DC_CHROMA)
    _, ac_c = _canonical_codes(*ac_chroma_spec)

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
    nc0 = 1 if gray else 3
    if gray or subsampling == "444":
        factors = [(1, 1)] * nc0  # (h_i, v_i)
    elif subsampling == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
    else:  # 422: horizontal-only chroma subsampling
        factors = [(2, 1), (1, 1), (1, 1)]
    hmax_ = max(f[0] for f in factors)
    vmax_ = max(f[1] for f in factors)
    mcu_w, mcu_h = 8 * hmax_, 8 * vmax_
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        q = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        ry, rx = vmax_ // fv, hmax_ // fh
        if ry > 1 or rx > 1:  # mean-downsample to the component grid
            q = q.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        padded.append(q)

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
    nc = nc0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hv = (factors[i][0] << 4) | factors[i][1]
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    seg(b"\xff\xc2" if progressive else b"\xff\xc0", sof)
    if restart_interval:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    def dht(tc, th, spec):
        bits, values = spec
        seg(
            b"\xff\xc4",
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(values),
        )

    dht(0, 0, K_DC_LUMA)
    dht(1, 0, ac_luma_spec)
    if not gray:
        dht(0, 1, K_DC_CHROMA)
        dht(1, 1, ac_chroma_spec)
    if progressive:
        tabs = [(lq, dc_l, ac_l)] + [(cq, dc_c, ac_c)] * (nc - 1)
        mcux, mcuy = pw // mcu_w, ph // mcu_h
        # per-component MCU-padded coefficient grids (bw_i = mcux*h_i)
        zzs, bws, bhs, cws, chs = [], [], [], [], []
        for ci in range(nc):
            fh, fv = factors[ci]
            bw_i, bh_i = mcux * fh, mcuy * fv
            q = tabs[ci][0]
            arr = np.empty((bh_i * bw_i, 64), np.int64)
            for by in range(bh_i):
                for bx in range(bw_i):
                    arr[by * bw_i + bx] = _quant_zz(
                        padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q
                    )
            zzs.append(arr)
            bws.append(bw_i)
            bhs.append(bh_i)
            # non-interleaved scans iterate the ACTUAL component dims
            cws.append(((w * fh + hmax_ - 1) // hmax_ + 7) // 8)
            chs.append(((h * fv + vmax_ - 1) // vmax_ + 7) // 8)

        def sos_header(comp_idx, Ss, Se, Ah, Al):
            payload = bytes([len(comp_idx)])
            for i in comp_idx:
                payload += bytes([i + 1, 0x00 if i == 0 else 0x11])
            payload += bytes([Ss, Se, (Ah << 4) | Al])
            seg(b"\xff\xda", payload)

        def dc_scan(refine: bool):
            wtr = _BitWriter()
            preds = [0] * nc
            for mi in range(mcux * mcuy):
                my, mx = divmod(mi, mcux)
                for ci in range(nc):
                    fh, fv = factors[ci]
                    for by in range(fv):
                        for bx in range(fh):
                            idx = (my * fv + by) * bws[ci] + mx * fh + bx
                            v0 = int(zzs[ci][idx][0])
                            if refine:
                                wtr.write(v0 & 1, 1)
                                continue
                            dcv = v0 >> 1
                            diff = dcv - preds[ci]
                            preds[ci] = dcv
                            sz = abs(diff).bit_length()
                            code, length = tabs[ci][1][sz]
                            wtr.write(code, length)
                            if sz:
                                _emit_bits_value(wtr, diff, sz)
            wtr.flush()
            return wtr.out

        sos_header(range(nc), 0, 0, 0, 1)
        out.extend(dc_scan(refine=False))
        sos_header(range(nc), 0, 0, 1, 0)
        out.extend(dc_scan(refine=True))
        for refine in (False, True):
            for ci in range(nc):
                # AC scans are non-interleaved: actual cw x ch block order
                blocks = [
                    zzs[ci][row * bws[ci] + col]
                    for row in range(chs[ci])
                    for col in range(cws[ci])
                ]
                sos_header([ci], 1, 63, 1 if refine else 0,
                           0 if refine else 1)
                wtr = _BitWriter()
                _emit_ac_scan(
                    wtr, blocks, 1, 63, 0 if refine else 1, tabs[ci][2],
                    refine=refine,
                )
                wtr.flush()
                out += wtr.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", sos)

    wtr = _BitWriter()
    preds = [0] * nc
    tabs = [(lq, dc_l, ac_l)] + [(cq, dc_c, ac_c)] * (nc - 1)
    mcux, mcuy = pw // mcu_w, ph // mcu_h
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
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            wtr, blk, q, dce, ace, preds[ci]
                        )
            mi += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

"""From-scratch WAV (RIFF/PCM) codec — stdlib ``struct`` + numpy.

Scope (r5-widened): integer PCM (tag 1) at 8 (unsigned) / 16 / 24 / 32
bits, IEEE float PCM (tag 3) at 32/64 bits, and WAVE_FORMAT_EXTENSIBLE
(tag 0xFFFE) wrapping either sub-format — any channel count / sample
rate, all normalized to int16 on decode. ADPCM / mu-law and other tags
raise ``UnsupportedWav`` so pipelines can quarantine them. Like the PNG
codec, the wire format is public (RIFF spec) — real samples for the
audio stages without adding libraries to the image.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWav(ValueError):
    pass


class BadWav(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> (samples, sample_rate). ``samples`` is int16, shape (n,) for mono
    or (n, channels) otherwise; 8-bit widens to int16 ((x-128)<<8), 24/32-bit
    and float inputs narrow to the top 16 bits / clipped [-1, 1] range."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise BadWav("missing RIFF/WAVE header")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise BadWav(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise BadWav("short fmt chunk")
            tag, n_ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: sub-format GUID
                if size < 40:
                    raise BadWav("short extensible fmt chunk")
                tag = struct.unpack("<H", body[24:26])[0]
            if tag not in (1, 3):
                raise UnsupportedWav(f"format tag {tag} (PCM=1 / float=3)")
            if tag == 1 and bits not in (8, 16, 24, 32):
                raise UnsupportedWav(f"{bits}-bit integer PCM")
            if tag == 3 and bits not in (32, 64):
                raise UnsupportedWav(f"{bits}-bit float PCM")
            fmt = (n_ch, rate, bits, tag)
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise BadWav("missing fmt or data chunk")
    n_ch, rate, bits, tag = fmt
    if tag == 3:  # IEEE float in [-1, 1] -> int16
        ft = "<f4" if bits == 32 else "<f8"
        step = bits // 8
        f = np.frombuffer(samples[: len(samples) // step * step], ft)
        arr = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    elif bits == 16:
        arr = np.frombuffer(samples[: len(samples) // 2 * 2], "<i2").astype(np.int16)
    elif bits == 8:
        arr = ((np.frombuffer(samples, np.uint8).astype(np.int16) - 128) << 8).astype(
            np.int16
        )
    elif bits == 24:  # top 16 of each little-endian 24-bit frame
        raw = np.frombuffer(samples[: len(samples) // 3 * 3], np.uint8)
        raw = raw.reshape(-1, 3)
        arr = (
            (raw[:, 2].astype(np.int16) << 8) | raw[:, 1].astype(np.int16)
        ).astype(np.int16)
    else:  # 32-bit integer PCM: top 16 bits
        arr = (
            np.frombuffer(samples[: len(samples) // 4 * 4], "<i4") >> 16
        ).astype(np.int16)
    if n_ch > 1:
        arr = arr[: len(arr) // n_ch * n_ch].reshape(-1, n_ch)
    return arr, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, channels) -> 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, np.int16)
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    pcm = np.ascontiguousarray(arr, "<i2").tobytes()
    block = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

"""From-scratch WAV (RIFF/PCM) codec — stdlib ``struct`` + numpy.

Scope: PCM (format tag 1) 16-bit signed or 8-bit unsigned, any channel
count / sample rate; other format tags (float, ADPCM, extensible) raise
``UnsupportedWav`` so pipelines can quarantine them. Like the PNG codec,
the wire format is public (RIFF spec) — real samples for the audio
stages without adding libraries to the image.
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
    or (n, channels) otherwise; 8-bit input is widened to int16 (x-128)<<8."""
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
            if tag != 1:
                raise UnsupportedWav(f"format tag {tag} (only PCM=1)")
            if bits not in (8, 16):
                raise UnsupportedWav(f"{bits}-bit PCM (8/16 supported)")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise BadWav("missing fmt or data chunk")
    n_ch, rate, bits = fmt
    if bits == 16:
        arr = np.frombuffer(samples[: len(samples) // 2 * 2], "<i2").astype(np.int16)
    else:
        arr = ((np.frombuffer(samples, np.uint8).astype(np.int16) - 128) << 8).astype(
            np.int16
        )
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

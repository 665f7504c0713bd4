"""Perceptual image dedup: aHash/dHash fingerprints over REAL decoded
pixels (multimodal/png.py), paired with the existing pigeonhole-LSH
machinery (``dedup/simhash.py:simhash_pairs_from_fingerprints``).

The fingerprints are integer-exact and resolution-invariant by
construction: grayscale via integer luma, 8x8 (aHash) / 9x8 (dHash)
block-mean downscale via ``np.add.reduceat`` on exact integer sums, bit i
set iff ``cells*px_i > sum(px)`` (no float mean). A re-encoded,
slightly-noised, or brightness-shifted copy lands within a few Hamming
bits; banding catches every pair within ``max_distance`` (pigeonhole,
subject to the documented ``max_bucket`` cap in the pair kernel).

Scale shape: hashing is an actor-pool map over binary payloads (small
batches — payload-dominated memory); after it only 8-byte fingerprints
move, so the pair stage is the same bounded-key band shuffle as text
simhash. 100 TB of images reduce to 8 B/row before anything shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _to_gray(img: np.ndarray) -> np.ndarray:
    """uint8 (h,w[,c]) -> int64 grayscale via integer ITU-R 601 luma."""
    if img.ndim == 2:
        return img.astype(np.int64)
    rgb = img[:, :, :3].astype(np.int64)  # alpha ignored
    return (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000


def _block_reduce(gray: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Exact integer block means onto a (th, tw) grid. Images smaller than
    the grid tile by index-repeat first (still deterministic)."""
    h, w = gray.shape
    if h < th or w < tw:
        ys = (np.arange(max(th, h)) * h // max(th, h)).clip(0, h - 1)
        xs = (np.arange(max(tw, w)) * w // max(tw, w)).clip(0, w - 1)
        gray = gray[np.ix_(ys, xs)]
        h, w = gray.shape
    yb = (np.arange(th) * h // th).astype(np.int64)
    xb = (np.arange(tw) * w // tw).astype(np.int64)
    sums = np.add.reduceat(np.add.reduceat(gray, yb, axis=0), xb, axis=1)
    ycnt = np.diff(np.append(yb, h))
    xcnt = np.diff(np.append(xb, w))
    return sums // np.outer(ycnt, xcnt)


def ahash64(img: np.ndarray) -> np.uint64:
    """Average hash: bit i = (64 * cell_i > sum(cells)) over the 8x8 grid."""
    cells = _block_reduce(_to_gray(img), 8, 8).ravel()
    bits = (64 * cells > cells.sum()).astype(np.uint64)
    return np.uint64(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))


def dhash64(img: np.ndarray) -> np.uint64:
    """Difference hash: bit = (left < right) over a 9x8 grid's horizontal
    gradients — robust to global brightness/contrast shifts."""
    cells = _block_reduce(_to_gray(img), 8, 9)
    bits = (cells[:, :-1] < cells[:, 1:]).ravel().astype(np.uint64)
    return np.uint64(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))


class ImageHasher:
    """Actor-pool fingerprint stage: (item_id, payload[, width, height]) ->
    (item_id, simhash uint64). ``codec="png"`` decodes real PNG pixels;
    ``codec="real"`` sniffs the container per payload (PNG or baseline/
    progressive JPEG — r5); ``codec="raw"`` treats the payload as the
    byte grid (the fake-mode plumbing contract). The payload column is consumed, not re-shipped —
    after this stage only 8 bytes/row move."""

    def __init__(self, method: str = "ahash", codec: str = "png"):
        if method not in ("ahash", "dhash"):
            raise ValueError(method)
        if codec not in ("png", "raw", "real"):
            raise ValueError(codec)
        self._hash = ahash64 if method == "ahash" else dhash64
        self._decode = None
        if codec in ("png", "real"):
            from knowledgegraphs_ray.multimodal.png import decode_png

            self._decode = decode_png
        if codec == "real":  # sniff the container per payload
            from knowledgegraphs_ray.multimodal.gif import decode_gif
            from knowledgegraphs_ray.multimodal.jpeg import decode_jpeg

            self._decode_jpeg = decode_jpeg
            self._decode_gif = decode_gif
            self._sniff = True
        else:
            self._sniff = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = []
        if self._sniff:
            for pay in batch["payload"].to_pylist():
                if pay[:2] == b"\xff\xd8":
                    dec = self._decode_jpeg
                elif pay[:6] in (b"GIF87a", b"GIF89a"):
                    dec = self._decode_gif
                else:
                    dec = self._decode
                fps.append(self._hash(dec(pay)))
        elif self._decode is not None:
            for pay in batch["payload"].to_pylist():
                fps.append(self._hash(self._decode(pay)))
        else:
            for pay, w, h in zip(
                batch["payload"].to_pylist(),
                batch["width"].to_pylist(),
                batch["height"].to_pylist(),
            ):
                img = np.frombuffer(pay, np.uint8)[: w * h].reshape(h, w)
                fps.append(self._hash(img))
        return pa.table(
            {
                "item_id": batch["item_id"].combine_chunks(),
                "simhash": pa.array(fps, pa.uint64()),
            }
        )


def image_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    method: str = "ahash",
    codec: str = "png",
    max_distance: int = 3,
    max_bucket: int = 500,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """image rows -> (doc_a, doc_b, distance) perceptual near-dup pairs:
    fingerprint actor pool, then the text-simhash pigeonhole pair kernel
    over the 8-byte hashes."""
    from knowledgegraphs_ray.dedup.simhash import simhash_pairs_from_fingerprints

    fps = ds.map_batches(
        ImageHasher,
        fn_constructor_kwargs={"method": method, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return simhash_pairs_from_fingerprints(
        fps, id_col="item_id", max_distance=max_distance, max_bucket=max_bucket
    )

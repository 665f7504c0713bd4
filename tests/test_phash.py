"""Perceptual image hashes + near-dup pairing over real decoded PNGs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.multimodal.phash import (
    ImageHasher,
    ahash64,
    dhash64,
    image_near_dup_pairs,
)
from knowledgegraphs_ray.multimodal.png import encode_png
from knowledgegraphs_ray.dedup.simhash import hamming


def _structured(seed: int, h=40, w=56) -> np.ndarray:
    """Blocky mid-range image (saturation-free so noise stays recoverable)."""
    rng = np.random.default_rng(seed)
    coarse = rng.integers(60, 196, (5, 7), dtype=np.uint8)
    return coarse.repeat(8, axis=0).repeat(8, axis=1)[:h, :w]


def test_hashes_deterministic_and_distinct():
    a, b = _structured(1), _structured(2)
    assert ahash64(a) == ahash64(a)
    assert dhash64(a) == dhash64(a)
    assert ahash64(a) != ahash64(b)
    d = hamming(np.array([ahash64(a)], np.uint64), ahash64(b))[0]
    assert d > 8  # unrelated images are far apart


def test_noise_stays_close_resize_invariant():
    img = _structured(3)
    noisy = img.astype(np.int64) + np.random.default_rng(4).integers(
        -6, 7, img.shape
    )
    noisy = noisy.clip(0, 255).astype(np.uint8)
    assert hamming(np.array([ahash64(img)], np.uint64), ahash64(noisy))[0] <= 3
    # 2x upscale (same content, different resolution): aHash is exactly
    # invariant here; dHash's 9-wide grid has floor-division boundaries
    # that shift sub-pixel under rescale, so allow a couple of bits
    up = img.repeat(2, axis=0).repeat(2, axis=1)
    assert ahash64(up) == ahash64(img)
    assert hamming(np.array([dhash64(up)], np.uint64), dhash64(img))[0] <= 2


def test_dhash_brightness_invariant():
    img = _structured(5)
    brighter = (img.astype(np.int64) + 40).clip(0, 255).astype(np.uint8)
    assert dhash64(brighter) == dhash64(img)


def test_rgb_and_gray_luma():
    gray = _structured(6)
    rgb = np.stack([gray, gray, gray], axis=2)
    assert ahash64(rgb) == ahash64(gray)


def test_image_near_dup_pairs_end_to_end():
    rng = np.random.default_rng(9)
    rows = []
    originals = [_structured(100 + i) for i in range(6)]
    for i, img in enumerate(originals):
        rows.append((i, encode_png(img)))
    # plant near-dups of images 0 and 3: mild noise + re-encode
    for j, src in ((100, 0), (103, 3)):
        noisy = (
            originals[src].astype(np.int64) + rng.integers(-5, 6, originals[src].shape)
        ).clip(0, 255).astype(np.uint8)
        rows.append((j, encode_png(noisy, filter_type=2)))
    t = pa.table(
        {
            "item_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    pairs = image_near_dup_pairs(
        ray.data.from_arrow(t), method="ahash", max_distance=4
    ).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert (0, 100) in got
    assert (3, 103) in got
    # no cross-original false pairs
    for a, b in got:
        assert (a % 100) == (b % 100)


def test_hasher_raw_codec_contract():
    from knowledgegraphs_ray.multimodal.stages import synth_image_table

    t = synth_image_table(5)
    out = ImageHasher(method="dhash", codec="raw")(t)
    assert out.schema.names == ["item_id", "simhash"]
    assert out["simhash"].type == pa.uint64()
    out2 = ImageHasher(method="dhash", codec="raw")(t)
    assert out["simhash"].to_pylist() == out2["simhash"].to_pylist()


def test_image_phash_pairs_catalog_query(ray_session):
    """r5 rows-only catalog query: deterministic mixed PNG/JPEG corpus,
    every planted JPEG near-duplicate recovered through the sniffing
    decode path."""
    from knowledgegraphs_ray.pipelines.catalog import q_image_phash_pairs

    df = q_image_phash_pairs("/root/testdata/sf0.001").to_pandas()
    planted = {(i, 320 + i) for i in range(0, 320, 8)}
    got = set(zip(df["doc_a"], df["doc_b"]))
    missing = planted - got
    assert not missing, f"planted near-dups not recovered: {sorted(missing)[:5]}"
    df2 = q_image_phash_pairs("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(df, df2)

"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video are treated as ``binary`` columns + metadata columns
(width/height/codec/...). The decode libraries (PIL/ffmpeg/torchaudio) are
NOT in this container, so the codec step is STUBBED: ``mode="fake"`` runs a
deterministic byte-statistics decode (real plumbing, fake pixels);
``mode="real"`` raises ``NotImplementedError`` at the exact seam where a real
decoder drops in. Everything around the stub — schemas, actor-pool stage
shape, small-batch sizing for large payloads, output layout — is real and
tested.

Scale notes: binary rows are large ⇒ these stages run with SMALL
``batch_size`` (payload bytes × batch_size × concurrency must fit worker
heaps) and ``batch_format="pyarrow"`` (binary round-trips pandas badly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("format", pa.string()),
    ]
)


def synth_image_table(n: int, *, seed: int = 42) -> pa.Table:
    """Deterministic fake image rows (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    widths = rng.integers(8, 64, n).astype(np.int32)
    heights = rng.integers(8, 64, n).astype(np.int32)
    payloads = [rng.integers(0, 256, int(w) * int(h), dtype=np.uint8).tobytes()
                for w, h in zip(widths, heights)]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "format": pa.array(["fake/raw"] * n, pa.string()),
        },
        schema=IMAGE_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool decode stage. ``__init__`` is where a real codec/model
    load belongs (once per actor); ``__call__`` decodes a batch.

    fake mode: "pixels" = the raw payload bytes reshaped (h, w) — enough to
    drive the downstream feature/resize stages deterministically."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        # real mode would do: `from PIL import Image` / load a codec here

    def decode_one(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.mode == "real":
            raise NotImplementedError(
                "image decode requires PIL/libjpeg — not available in this "
                "container; plug a real decoder here"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)
        return arr[: w * h].reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = {"mean_px": [], "std_px": [], "n_px": []}
        for pay, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self.decode_one(pay, w, h)
            feats["mean_px"].append(float(img.mean()))
            feats["std_px"].append(float(img.std()))
            feats["n_px"].append(int(img.size))
        out = batch.drop(["payload"])  # payload consumed; don't re-ship bytes
        for k, v in feats.items():
            out = out.append_column(
                k, pa.array(v, pa.float64() if k != "n_px" else pa.int64())
            )
        return out


class ImageResizer:
    """Resize stage (fake: nearest-neighbor index sampling on the byte grid)."""

    def __init__(self, target: tuple[int, int] = (16, 16), mode: str = "fake"):
        self.tw, self.th = target
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("real resize needs an image library")
        out_payloads = []
        for pay, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = np.frombuffer(pay, dtype=np.uint8)[: w * h].reshape(h, w)
            ys = (np.arange(self.th) * h // self.th).clip(0, h - 1)
            xs = (np.arange(self.tw) * w // self.tw).clip(0, w - 1)
            out_payloads.append(img[np.ix_(ys, xs)].tobytes())
        n = batch.num_rows
        return pa.table(
            {
                "item_id": batch["item_id"].combine_chunks(),
                "payload": pa.array(out_payloads, pa.binary()),
                "width": pa.array([self.tw] * n, pa.int32()),
                "height": pa.array([self.th] * n, pa.int32()),
                "format": batch["format"].combine_chunks(),
            },
            schema=IMAGE_SCHEMA,
        )


def frame_sample(
    batch: pa.Table, *, every_n: int = 5, idx_col: str = "item_id"
) -> pa.Table:
    """Frame sampling for video-like sequences: keep every Nth item
    (deterministic on the id, not on row position)."""
    ids = batch[idx_col].to_numpy(zero_copy_only=False)
    keep = pa.array((ids % every_n) == 0)
    return batch.filter(keep)


def image_feature_pipeline(
    ds: ray.data.Dataset, *, concurrency: int = 2, batch_size: int = 64, mode: str = "fake"
) -> ray.data.Dataset:
    """decode -> features as an actor-pool stage; small batches because the
    payload column dominates memory."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_args=(mode,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

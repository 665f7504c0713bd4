"""Multimodal stub plumbing: schema, actor stage, resize, frame sampling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.multimodal.stages import (
    ImageDecoder,
    ImageResizer,
    frame_sample,
    image_feature_pipeline,
    synth_image_table,
)


def test_synth_schema():
    t = synth_image_table(5)
    assert t.schema.names == ["item_id", "payload", "width", "height", "format"]
    assert t["payload"].type == pa.binary()


def test_decode_fake_deterministic():
    t = synth_image_table(4)
    d = ImageDecoder("fake")
    out1, out2 = d(t), d(t)
    assert out1["mean_px"].to_pylist() == out2["mean_px"].to_pylist()
    assert "payload" not in out1.schema.names  # bytes not re-shipped


def test_decode_real_raises():
    t = synth_image_table(1)
    with pytest.raises(NotImplementedError):
        ImageDecoder("real")(t)


def test_resize_shapes():
    t = synth_image_table(3)
    out = ImageResizer((8, 4))(t)
    assert out["width"].to_pylist() == [8, 8, 8]
    assert out["height"].to_pylist() == [4, 4, 4]
    assert all(len(p) == 32 for p in out["payload"].to_pylist())


def test_frame_sample():
    t = synth_image_table(10)
    out = frame_sample(t, every_n=5)
    assert out["item_id"].to_pylist() == [0, 5]


def test_actor_pipeline_end_to_end():
    ds = ray.data.from_arrow(synth_image_table(20))
    feats = image_feature_pipeline(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(feats) == 20
    assert (feats["n_px"] > 0).all()
    assert feats["mean_px"].between(0, 255).all()

"""Multimodal plumbing: binary columns through actor-pool stages."""

import numpy as np
import pyarrow as pa
import pytest


def _binary_ds(n=20, seed=5):
    import ray.data

    rng = np.random.default_rng(seed)
    rows = [
        {
            "item_id": i,
            "mime": "image/fake",
            "payload": rng.bytes(64 + int(rng.integers(0, 512))),
        }
        for i in range(n)
    ]
    return ray.data.from_items(rows)


def test_image_features_actor_pool(ray_session):
    from ferret_ray.functions.multimodal import (
        FakeImageDecoder,
        extract_image_features,
    )

    ds = _binary_ds()
    out = extract_image_features(
        ds, decoder=FakeImageDecoder(), batch_size=4, concurrency=(1, 2)
    ).to_pandas()
    assert len(out) == 20
    assert set(out.columns) == {
        "item_id", "width", "height", "mean_r", "mean_g", "mean_b", "phash"
    }
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    # deterministic: same payloads -> same features
    out2 = extract_image_features(
        _binary_ds(), decoder=FakeImageDecoder(), batch_size=7
    ).to_pandas()
    a = out.sort_values("item_id").reset_index(drop=True)
    b = out2.sort_values("item_id").reset_index(drop=True)
    assert (a["phash"] == b["phash"]).all()


def test_missing_codec_raises(ray_session):
    from ferret_ray.functions.multimodal import ImageFeatureExtractor

    ex = ImageFeatureExtractor()  # no decoder in this container
    batch = pa.table({"item_id": [1], "payload": [b"xx"]})
    with pytest.raises(NotImplementedError):
        ex(batch)


def test_frame_sampler(ray_session):
    from ferret_ray.functions.multimodal import FrameSampler

    sampler = FrameSampler(every=2, frame_bytes=16)
    batch = pa.table(
        {"item_id": [7], "payload": [bytes(range(128))]}
    )
    out = sampler(batch)
    # 128 bytes / 16 per frame = 8 frames, every 2nd -> 4 rows
    assert out.num_rows == 4
    assert out.column("frame").to_pylist() == [0, 2, 4, 6]
    assert out.column("frame_payload")[0].as_py() == bytes(range(16))

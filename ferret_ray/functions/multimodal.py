"""Multimodal column plumbing: binary payloads through actor-pool stages.

Images / audio / video are opaque ``large_binary`` columns with typed
metadata columns alongside (mime, width/height or sample rate, ...).
The Ray-side plumbing — schema handling, small-batch actor-pool
map_batches with per-actor model init, output layout — is real and
tested; the actual codec work is behind ``decoder=`` hooks because the
image/audio libraries are not in this container:

* pass a real decoder (e.g. PIL / torchaudio) in production, or
* use :class:`FakeImageDecoder` (deterministic, dependency-free) in tests,
* the default raises ``NotImplementedError`` loudly rather than faking.

Scale notes baked in: ``batch_size`` small (payloads are large — a batch
times concurrency must fit the worker heap), stateful setup once per actor
in ``__init__``, zero-copy Arrow in/out.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa


class NotDecodable(NotImplementedError):
    pass


def _no_decoder(payload: bytes) -> np.ndarray:
    raise NotDecodable(
        "no image/audio codec in this environment — pass decoder= "
        "(e.g. PIL.Image.open) or use FakeImageDecoder for tests"
    )


class FakeImageDecoder:
    """Deterministic stand-in codec: 'decodes' a payload to an (8, 8, 3)
    uint8 array derived from its sha256 — stable across runs/workers."""

    def __call__(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * 6)[:192], dtype=np.uint8)
        return raw.reshape(8, 8, 3)


class ImageFeatureExtractor:
    """Actor-pool UDF: decode + featurize image payloads.

    __init__ = once-per-actor setup ("model load"); __call__ = per batch.
    Output: (id, width, height, mean_r/g/b, phash64) — the embedding/
    fingerprint layout a training-data pipeline joins on.
    """

    def __init__(self, decoder=None, payload_col: str = "payload",
                 id_col: str = "item_id"):
        self.decode = decoder or _no_decoder
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs = [], [], []
        means = {"r": [], "g": [], "b": []}
        phashes = []
        payloads = batch.column(self.payload_col)
        id_vals = batch.column(self.id_col)
        for i in range(batch.num_rows):
            img = self.decode(payloads[i].as_py())
            ids.append(id_vals[i].as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            for c, name in enumerate("rgb"):
                means[name].append(float(img[:, :, c].mean()))
            # dHash-style 64-bit perceptual fingerprint
            g = img.mean(axis=2)
            small = g[: 8, : 9] if g.shape[1] >= 9 else np.pad(
                g, ((0, 0), (0, 9 - g.shape[1]))
            )[:8, :9]
            bits = (small[:, 1:] > small[:, :-1]).flatten()[:64]
            ph = 0
            for b in bits:
                ph = (ph << 1) | int(b)
            phashes.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
        return pa.table(
            {
                self.id_col: ids,
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "mean_r": means["r"],
                "mean_g": means["g"],
                "mean_b": means["b"],
                "phash": pa.array(phashes, type=pa.int64()),
            }
        )


def extract_image_features(
    ds,
    decoder=None,
    payload_col: str = "payload",
    id_col: str = "item_id",
    batch_size: int = 32,
    concurrency=(1, 4),
):
    """Binary payload Dataset -> feature Dataset via a stateful actor pool.

    Small ``batch_size`` by design: batch x concurrency of multi-MB
    payloads must fit each worker's heap; the object store streams and
    spills the rest.
    """
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={
            "decoder": decoder, "payload_col": payload_col,
            "id_col": id_col,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool UDF sketch for video: emit every k-th frame's payload
    slice as its own row (flat_map-style fan-out inside map_batches)."""

    def __init__(self, every: int = 10, payload_col: str = "payload",
                 id_col: str = "item_id", frame_bytes: int = 256):
        self.every = every
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, blobs = [], [], []
        for i in range(batch.num_rows):
            payload = batch.column(self.payload_col)[i].as_py()
            vid = batch.column(self.id_col)[i].as_py()
            n_frames = max(1, len(payload) // self.frame_bytes)
            for f in range(0, n_frames, self.every):
                ids.append(vid)
                frames.append(f)
                blobs.append(
                    payload[f * self.frame_bytes:(f + 1) * self.frame_bytes]
                )
        return pa.table(
            {
                self.id_col: ids,
                "frame": pa.array(frames, type=pa.int32()),
                "frame_payload": pa.array(blobs, type=pa.large_binary()),
            }
        )

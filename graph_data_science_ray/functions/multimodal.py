"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns with
typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment — a real deployment plugs Pillow/torchaudio into the same actor
signature); everything Ray-side is real and tested: schema, batch sizing for
large binary payloads, actor-pool stage shape, deterministic fake features for
pipeline testing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # "image" | "audio" | "video"
    ("payload", pa.binary()),     # opaque encoded bytes
    ("width", pa.int32()),        # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


class ImageFeatureExtractor:
    """Actor-pool decode + feature-extract stage.

    ``fake=True`` produces a deterministic 16-dim feature from the payload hash
    (pipeline plumbing tests); ``fake=False`` raises NotImplementedError at the
    decode step — the marked integration point for a real image library.
    Keep ``batch_size`` small for large payloads so batch × concurrency fits the
    worker heap (the object store spills the rest)."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True):
        self.fake = fake
        self.__name__ = "image_features"

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library (Pillow/opencv); "
                "not available in this environment — plug it in here")
        h = hashlib.blake2b(payload, digest_size=2 * self.FEATURE_DIM).digest()
        return np.frombuffer(h, dtype=np.uint16).astype(np.float32) / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode(p) for p in payloads]) if payloads else \
            np.zeros((0, self.FEATURE_DIM), dtype=np.float32)
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(list(feats), pa.list_(pa.float32())),
        })


class FrameSampler:
    """Video frame-sampling stage shape: emits (media_id, frame_idx) rows for every
    sampled frame — the downstream decode stage consumes these.  Sampling itself is
    metadata arithmetic (duration / fps), so it is fully real."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms
        self.__name__ = "frame_sampler"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        n_frames = np.maximum(1, dur // self.every_ms).astype(np.int64)
        media = np.repeat(ids, n_frames)
        offs = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
        frame = np.arange(int(n_frames.sum()), dtype=np.int64) - np.repeat(offs, n_frames)
        return pa.table({"media_id": media, "frame_idx": frame,
                         "ts_ms": frame * self.every_ms})


def synthetic_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    return pa.table({
        "media_id": np.arange(n, dtype=np.int64),
        "kind": pa.array([str(k) for k in kinds]),
        "payload": pa.array(payloads, pa.binary()),
        "width": rng.integers(16, 256, n).astype(np.int32),
        "height": rng.integers(16, 256, n).astype(np.int32),
        "duration_ms": rng.integers(500, 5000, n).astype(np.int32),
    })

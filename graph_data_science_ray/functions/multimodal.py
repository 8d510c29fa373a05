"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns with
typed metadata.

Decode is REAL for the library-free raster formats (PPM ``P6`` and
uncompressed 24-bit BMP — both decodable with pure numpy), and those kernels
(decode → nearest-neighbor resize → 16-dim feature) run end-to-end in the
actor-pool stage.  Compressed formats (JPEG/PNG/audio/video) raise
NotImplementedError at the same call site — the marked integration point
where a real deployment plugs Pillow/torchaudio into the identical actor
signature.  Everything Ray-side (schema, batch sizing for large binary
payloads, actor-pool shape) is shared by both paths.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    Pure-numpy decoders for PPM binary (``P6``) and uncompressed 24-bit BMP;
    any other magic raises NotImplementedError (the compressed-format
    integration point — same signature, plug a codec in here)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "decode_image handles PPM(P6)/BMP-24 natively; compressed formats "
        "(JPEG/PNG/...) require an image library — plug it in here")


def _decode_ppm(payload: bytes) -> np.ndarray:
    # header = 4 whitespace-separated tokens (comments allowed), then one
    # whitespace byte, then maxval-scaled raw RGB
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i] in b" \t\r\n":
            i += 1
        if i < len(payload) and payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j] not in b" \t\r\n":
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 not supported")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return arr.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)[:, :w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img if top_down else img[::-1]).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PPM P6 bytes (test fixtures / round-trips)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy, half-pixel centers)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(np.int64)
    return img[ys][:, xs]


def image_feature(img: np.ndarray) -> np.ndarray:
    """Deterministic 16-dim feature: per-channel mean+std (6), 3×3 luminance
    grid means (9), aspect ratio (1) — all in [0, 1] except the ratio."""
    f = np.empty(16, dtype=np.float32)
    x = img.astype(np.float32) / 255.0
    f[0:3] = x.mean(axis=(0, 1))
    f[3:6] = x.std(axis=(0, 1))
    lum = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    h, w = lum.shape
    rb = np.arange(4) * h // 3
    cb = np.arange(4) * w // 3
    for i in range(3):
        r0, r1 = rb[i], max(rb[i + 1], rb[i] + 1)
        for j in range(3):
            c0, c1 = cb[j], max(cb[j + 1], cb[j] + 1)
            f[6 + 3 * i + j] = lum[min(r0, h - 1):r1, min(c0, w - 1):c1].mean()
    f[15] = img.shape[1] / img.shape[0]
    return f

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # "image" | "audio" | "video"
    ("payload", pa.binary()),     # opaque encoded bytes
    ("width", pa.int32()),        # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


class ImageFeatureExtractor:
    """Actor-pool decode → resize → feature stage.

    ``fake=False`` runs the real path: :func:`decode_image` — actual pixel
    decode for PPM/BMP payloads, NotImplementedError for compressed formats
    (the codec integration point) — then nearest-resizes to
    ``resize_to``×``resize_to`` and emits the 16-dim :func:`image_feature`.
    ``fake=True`` (the default, kept for payload-agnostic compatibility)
    is the format-independent plumbing variant (feature = payload blake2b)
    for opaque placeholder payloads.
    Keep ``batch_size`` small for large payloads so batch × concurrency fits
    the worker heap (the object store spills the rest)."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True, resize_to: int = 32):
        self.fake = fake
        self.resize_to = int(resize_to)
        self.__name__ = "image_features"

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.fake:
            h = hashlib.blake2b(payload,
                                digest_size=2 * self.FEATURE_DIM).digest()
            return np.frombuffer(h, dtype=np.uint16).astype(np.float32) / 65535.0
        img = resize_nearest(decode_image(payload),
                             self.resize_to, self.resize_to)
        return image_feature(img)

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


def synthetic_media_table(n: int, seed: int = 5, *,
                          real_images: bool = False) -> pa.Table:
    """Deterministic media rows for plumbing tests.  With
    ``real_images=True`` every "image" row carries an actual decodable PPM
    payload (deterministic gradient + noise pattern) whose width/height
    metadata match the pixels; other kinds keep opaque bytes."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    widths = rng.integers(16, 256, n).astype(np.int32)
    heights = rng.integers(16, 256, n).astype(np.int32)
    payloads = []
    for k in range(n):
        if real_images and kinds[k] == "image":
            w, h = int(widths[k]) // 4, int(heights[k]) // 4  # keep tests fast
            widths[k], heights[k] = w, h
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (255 * xx / max(w - 1, 1)),
                (255 * yy / max(h - 1, 1)),
                rng.integers(0, 256, (h, w)),
            ], axis=-1).astype(np.uint8)
            payloads.append(encode_ppm(img))
        else:
            payloads.append(rng.integers(0, 256, int(rng.integers(64, 512)),
                                         dtype=np.uint8).tobytes())
    return pa.table({
        "media_id": np.arange(n, dtype=np.int64),
        "kind": pa.array([str(k) for k in kinds]),
        "payload": pa.array(payloads, pa.binary()),
        "width": widths,
        "height": heights,
        "duration_ms": rng.integers(500, 5000, n).astype(np.int32),
    })

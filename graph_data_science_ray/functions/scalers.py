"""Score scalers — semantics of GDS ScalarScaler variants
(algo-common/src/main/java/org/neo4j/gds/scaling/{Max,MinMax,Mean,StdScore,L1Norm,
L2Norm,LogTransformer}.java).  Each is a two-pass transform: global aggregate then
vectorized rescale; all return zeros when the normalizer is ~0 (CLOSE_TO_ZERO)."""

from __future__ import annotations

import numpy as np

CLOSE_TO_ZERO = 1e-15


def scale(values: np.ndarray, variant: str) -> np.ndarray:
    v = np.asarray(values, dtype=np.float64)
    variant = variant.lower()
    if variant in ("none", ""):
        return v
    if variant == "log":
        return np.log(v)
    if variant == "max":
        m = np.abs(v).max(initial=0.0)
        return np.zeros_like(v) if m < CLOSE_TO_ZERO else v / m
    if variant == "minmax":
        lo, hi = v.min(), v.max()
        d = hi - lo
        return np.zeros_like(v) if abs(d) < CLOSE_TO_ZERO else (v - lo) / d
    if variant == "mean":
        lo, hi = v.min(), v.max()
        d = hi - lo
        return np.zeros_like(v) if abs(d) < CLOSE_TO_ZERO else (v - v.mean()) / d
    if variant == "stdscore":
        avg = v.mean()
        std = np.sqrt(((v - avg) ** 2).mean())
        return np.zeros_like(v) if std < CLOSE_TO_ZERO else (v - avg) / std
    if variant == "l1norm":
        s = np.abs(v).sum()
        return np.zeros_like(v) if s < CLOSE_TO_ZERO else v / s
    if variant == "l2norm":
        n = np.sqrt((v * v).sum())
        return np.zeros_like(v) if n < CLOSE_TO_ZERO else v / n
    raise ValueError(f"unknown scaler {variant!r}")

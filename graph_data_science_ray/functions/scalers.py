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


def one_hot_encoding(available_values, selected_values):
    """gds.alpha.ml.oneHotEncoding (ref alpha/alpha-proc/.../functions/
    OneHotEncodingFunc.java): 1 where available_values[i] is in
    selected_values, else 0; [] for available=None, all-zero for
    selected=None.  Vectorize over a column by calling per row (the reference
    is a per-call user function) or via ``one_hot_batch``."""
    if available_values is None:
        return []
    if selected_values is None:
        return [0] * len(available_values)
    sel = set(selected_values)
    return [1 if v in sel else 0 for v in available_values]


def one_hot_batch(batch, *, list_col: str, available_values, out_col="one_hot"):
    """Batch one-hot: encode a list<string|int> column against a fixed
    vocabulary — the map_batches form of one_hot_encoding (one row per input
    row, list<int64> output).  The vocabulary index is built once per call;
    pass through a callable-class ``__init__`` for per-actor reuse."""
    import pyarrow as pa
    idx = {v: i for i, v in enumerate(available_values)}
    k = len(available_values)
    rows = batch.column(list_col).to_pylist()
    out = np.zeros((len(rows), k), dtype=np.int64)
    for r, sel in enumerate(rows):
        if sel is None:
            continue
        for v in sel:
            j = idx.get(v)
            if j is not None:
                out[r, j] = 1
    return batch.append_column(out_col, pa.array(out.tolist(),
                                                 type=pa.list_(pa.int64())))

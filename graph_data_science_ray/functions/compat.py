"""Numeric-compatibility kernels shared by the oracle-checked query surface.

Two cross-engine pitfalls bit the round-2 oracle comparison (VERDICT.md
"What's wrong" #1/#2); both are centralised here so every query pipeline uses
the same semantics as ANSI-SQL engines (DuckDB is the conformance oracle):

* ``round_half_away`` — SQL ``round(x, d)`` rounds halves away from zero
  (0.0078125 -> 0.007813), while ``np.round`` is IEEE half-to-even
  (-> 0.007812).  Jaccard ratios with power-of-two denominators hit exact
  halfway points at 6dp, so the difference is observable on real data.
  Verified against DuckDB on 25k random doubles: DuckDB's double round is
  ``sign(v) * floor(|v * 10^d| + 0.5) / 10^d`` (the C ``std::round`` of the
  scaled double).

* ``cosine_f32_sequential`` — DuckDB's ``list_cosine_similarity`` over
  ``list<float>`` columns accumulates dot products and norms in FLOAT
  (float32) in element order.  NumPy float64 matmul differs by ~1e-7, enough
  to flip near-tie top-k membership and 6dp rounding.  The kernel below
  replays the exact float32 sequential accumulation, vectorised across pairs
  (loop over the embedding dimension, SIMD across rows) so it stays fast.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, digits: int = 6) -> np.ndarray:
    """SQL-compatible round: halves away from zero on the scaled double."""
    v = np.asarray(x, dtype=np.float64) * (10.0 ** digits)
    a = np.abs(v)
    f = np.floor(a)
    r = f + (a - f >= 0.5)
    return np.copysign(r, v) / (10.0 ** digits)


def cosine_f32_sequential(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cosine similarity of the rows of ``a`` (m×d) against the rows of ``b``
    (n×d), returning an (m, n) float32 matrix bit-equal to DuckDB's
    ``list_cosine_similarity`` on float32 lists: all accumulation in float32,
    element order preserved (dimension-major loop)."""
    a = np.ascontiguousarray(a, dtype=np.float32)
    b = np.ascontiguousarray(b, dtype=np.float32)
    m, d = a.shape
    n = b.shape[0]
    num = np.zeros((m, n), dtype=np.float32)
    na = np.zeros(m, dtype=np.float32)
    nb = np.zeros(n, dtype=np.float32)
    for t in range(d):
        x = a[:, t]
        y = b[:, t]
        num += x[:, None] * y[None, :]
        na += x * x
        nb += y * y
    # NB: the engine divides by the *product of the two sqrts*, not the sqrt
    # of the product — 1-ulp different; verified exact on all 249,500 pairs
    # of the sf0.01 embeddings table.
    return num / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])


def cosine_f32_self_norms(a: np.ndarray) -> np.ndarray:
    """Float32 sequential squared norms of the rows of ``a`` (matches the
    per-list norm accumulation inside DuckDB's kernel)."""
    a = np.ascontiguousarray(a, dtype=np.float32)
    na = np.zeros(a.shape[0], dtype=np.float32)
    for t in range(a.shape[1]):
        x = a[:, t]
        na += x * x
    return na

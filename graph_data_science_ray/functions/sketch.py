"""Distributed mergeable sketches (HyperLogLog distinct counting).

The 100 TB sketch shape: every block folds its rows into a tiny fixed-size
partial (an m-register array, m = 2^precision bytes), and partials merge by
elementwise max — associative and commutative, so the combine tree is
layout-independent and the driver only ever holds O(blocks · m) bytes, never
row data.  This is the canonical pre-aggregate-inside-map_batches pattern
(the same reason the engine's groupbys push partial combines into the map
side) taken to its limit: the "aggregate" is constant-size.

Determinism/oracle: values hash with the same md5 family as
functions/sampling.py (== DuckDB ``md5_number_lower``), bucket = low
``precision`` bits, rank = leading-zero count of the remaining 64-p bits + 1
— every register value, and therefore the final estimate, reproduces
exactly in SQL (``length(bin(w))`` is DuckDB's bit_length).

Reference scope note: the reference exposes exact aggregation surfaces;
approximate distinct counting is an additive capability for the
training-data tier (cardinality of users/tokens/shingles at corpus scale
where exact ``unique`` would be an all-to-all shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import _key_hashes


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length per uint64 element (0 → 0)."""
    w = w.copy()
    out = np.zeros(w.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        w[big] >>= np.uint64(shift)
    out[w > 0] += 1
    return out


def _partial_registers(col, precision: int, salt: str) -> np.ndarray:
    """Fold one batch's values into an m-register partial (uint8)."""
    m = 1 << precision
    regs = np.zeros(m, dtype=np.uint8)
    if len(col) == 0:
        return regs
    h = _key_hashes(col, salt)
    bucket = (h % np.uint64(m)).astype(np.int64)
    w = h >> np.uint64(precision)
    rank = ((64 - precision) - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_registers(ds, col: str, *, precision: int = 10, salt: str = "hll"):
    """The mergeable HyperLogLog sketch itself: (bucket, register) rows for
    every non-empty bucket.  One streaming pass, per-block constant-size
    partials, elementwise-max merge — no shuffle, no row data on the driver.

    SQL oracle (DuckDB)::

        SELECT h % m AS bucket,
               CASE WHEN h >> p = 0 THEN 64 - p + 1
                    ELSE 64 - p - length(bin((h >> p)::UBIGINT)) + 1 END
               ... GROUP BY bucket -> max(rank)
    """
    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")

    regs = _merged_registers(ds, col, precision, salt)
    nz = np.flatnonzero(regs)
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "register": pa.array(regs[nz].astype(np.int64))})


def _merged_registers(ds, col, precision, salt) -> np.ndarray:
    import ray

    def _p(t: pa.Table) -> pa.Table:
        r = _partial_registers(t.column(col), precision, salt)
        return pa.table({"regs": pa.array([r.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        _p, batch_format="pyarrow").materialize()
    m = 1 << precision
    regs = np.zeros(m, dtype=np.uint8)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or t.num_columns == 0:
            continue
        for blob in t.column("regs").to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range correction."""
    m = regs.shape[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, *, precision: int = 10,
                    salt: str = "hll"):
    """Approximate COUNT(DISTINCT col) — one-row table
    (estimate float64, nonzero_buckets, precision).  Relative error
    ~1.04/sqrt(2^precision) (≈3.2% at the default p=10); the estimate is a
    deterministic pure function of the value set, so it reproduces exactly
    in SQL and is stable across partitionings and cluster sizes."""
    regs = _merged_registers(ds, col, precision, salt)
    return pa.table({
        "estimate": pa.array([round(hll_estimate(regs), 6)], pa.float64()),
        "nonzero_buckets": pa.array(
            [int(np.count_nonzero(regs))], pa.int64()),
        "precision": pa.array([precision], pa.int64()),
    })

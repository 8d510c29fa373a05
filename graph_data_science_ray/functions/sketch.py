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


def bloom_build(ds, col: str, *, num_bits: int = 1 << 20,
                num_hashes: int = 4, salt: str = "bl") -> np.ndarray:
    """Build a Bloom filter over ``col``: packed uint8 bitset of
    ``num_bits`` bits (num_bits/8 bytes on the driver — 128 KiB at the
    default 2^20).  Per-block partial bitsets OR-fold, so the build is one
    streaming pass with constant-size combine traffic, like the HLL sketch.

    Bit positions are ``md5(str(key) || ':<salt>#<i>') % num_bits`` for
    i in range(num_hashes) — the same DuckDB-equal hash family as
    functions/sampling.py, so membership (INCLUDING false positives) is a
    deterministic pure function of the key sets and reproduces exactly in
    SQL."""
    import ray

    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")

    def _p(t: pa.Table) -> pa.Table:
        bits = np.zeros(num_bits, dtype=bool)
        if t.num_rows:
            for i in range(num_hashes):
                pos = _key_hashes(t.column(col), f"{salt}#{i}") \
                    % np.uint64(num_bits)
                bits[pos.astype(np.int64)] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        _p, batch_format="pyarrow").materialize()
    packed = np.zeros(num_bits // 8, dtype=np.uint8)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or t.num_columns == 0:
            continue
        for blob in t.column("bits").to_pylist():
            packed |= np.frombuffer(blob, dtype=np.uint8)
    return packed


def bloom_semi_join(ds, col: str, packed_bits, *, num_hashes: int = 4,
                    salt: str = "bl"):
    """Keep rows whose key passes the Bloom filter (all ``num_hashes`` bit
    positions set) — the compact broadcast semi-join for key sets too large
    for ``semi_join_filter``'s exact sorted array: the filter ships ONCE via
    ``ray.put`` (bits/8 bytes however many build keys) and every probe block
    streams with no shuffle.  May keep false positives — deterministically,
    so the operator is still exactly SQL-checkable; compose with an exact
    join downstream when exactness is required (the classic two-phase
    filter-then-join at scale)."""
    import ray

    packed = np.asarray(packed_bits, dtype=np.uint8)
    num_bits = packed.shape[0] * 8
    ref = ray.put(packed)

    class _F:
        def __init__(self):
            self.bits = ray.get(ref)
            self.__name__ = "bloom_semi_join"

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            keep = np.ones(t.num_rows, dtype=bool)
            for i in range(num_hashes):
                pos = (_key_hashes(t.column(col), f"{salt}#{i}")
                       % np.uint64(num_bits)).astype(np.int64)
                # MSB-first bit order == np.packbits
                keep &= (self.bits[pos >> 3] >> (7 - (pos & 7))) & 1 == 1
            return t.filter(pa.array(keep))

    return ds.map_batches(_F(), batch_format="pyarrow")


def cms_build(ds, col: str, *, width: int = 512, depth: int = 4,
              salt: str = "cms") -> np.ndarray:
    """Count-Min sketch over ``col``: a (depth, width) int64 counter matrix
    (depth·width·8 bytes on the driver — 16 KiB at the defaults).  Per-block
    partial matrices SUM-fold (associative), so the build is one streaming
    pass with constant-size combine traffic.  Row i hashes with
    ``md5(str(key) || ':<salt>#<i>') % width`` — counters are exact integers
    and reproduce in SQL as d GROUP BYs."""
    import ray

    if width < 1 or depth < 1:
        raise ValueError("width and depth must be positive")

    def _p(t: pa.Table) -> pa.Table:
        m = np.zeros((depth, width), dtype=np.int64)
        if t.num_rows:
            for i in range(depth):
                pos = (_key_hashes(t.column(col), f"{salt}#{i}")
                       % np.uint64(width)).astype(np.int64)
                np.add.at(m[i], pos, 1)
        return pa.table({"m": pa.array([m.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        _p, batch_format="pyarrow").materialize()
    out = np.zeros((depth, width), dtype=np.int64)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or t.num_columns == 0:
            continue
        for blob in t.column("m").to_pylist():
            out += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return out


def cms_lookup(ds, col: str, counts, *, salt: str = "cms",
               est_col: str = "est"):
    """Append ``est_col`` = Count-Min frequency estimate of each row's key
    (min over the depth rows — an upper bound on the true count, exact when
    the key's cells are collision-free).  The counter matrix broadcasts once
    via ``ray.put``; probe blocks stream with no shuffle."""
    import ray

    counts = np.asarray(counts, dtype=np.int64)
    depth, width = counts.shape
    ref = ray.put(counts)

    class _L:
        def __init__(self):
            self.m = ray.get(ref)
            self.__name__ = "cms_lookup"

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column(est_col, pa.array([], pa.int64()))
            est = np.full(t.num_rows, np.iinfo(np.int64).max, dtype=np.int64)
            for i in range(depth):
                pos = (_key_hashes(t.column(col), f"{salt}#{i}")
                       % np.uint64(width)).astype(np.int64)
                est = np.minimum(est, self.m[i][pos])
            return t.append_column(est_col, pa.array(est))

    return ds.map_batches(_L(), batch_format="pyarrow")


def approx_distinct_by(ds, col: str, group_col: str, *, precision: int = 10,
                       salt: str = "hll"):
    """Per-group approximate COUNT(DISTINCT col): one HLL register set per
    ``group_col`` value, folded per batch and max-merged — per-block combine
    traffic is O(groups-in-block · 2^precision) bytes, never row data.
    Driver merges blocks × groups partial rows (fine for the usual few-to-
    thousands of groups; for extreme group cardinality route the partials
    through a group-hash exchange first — same merge, sharded).
    Returns (group_col, estimate, nonzero_buckets), SQL-exact like
    :func:`approx_distinct`."""
    import ray

    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")
    m = 1 << precision

    def _p(t: pa.Table) -> pa.Table:
        groups, blobs = [], []
        if t.num_rows:
            enc = t.column(group_col).combine_chunks().dictionary_encode()
            idx = enc.indices.to_numpy(zero_copy_only=False)
            for gi, gval in enumerate(enc.dictionary.to_pylist()):
                sel = t.filter(pa.array(idx == gi))
                groups.append(gval)
                blobs.append(_partial_registers(
                    sel.column(col), precision, salt).tobytes())
        return pa.table({group_col: pa.array(groups, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    parts = ds.select_columns([group_col, col]).map_batches(
        _p, batch_format="pyarrow").materialize()
    merged: dict = {}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or t.num_columns == 0:
            continue
        for g, blob in zip(t.column(group_col).to_pylist(),
                           t.column("regs").to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8)
            merged[g] = np.maximum(merged[g], r) if g in merged else r
    gs = sorted(merged)
    return pa.table({
        group_col: pa.array(gs, pa.string()),
        "estimate": pa.array([round(hll_estimate(merged[g]), 6)
                              for g in gs], pa.float64()),
        "nonzero_buckets": pa.array(
            [int(np.count_nonzero(merged[g])) for g in gs], pa.int64()),
    })


def approx_distinct_windowed(ds, col: str, ts_col: str = "ts", *,
                             window_us: int = 3_600_000_000,
                             precision: int = 10, salt: str = "hll"):
    """Tumbling-window HLL: approximate distinct ``col`` per time window
    (default hourly) — the streaming-analytics "unique visitors per hour"
    shape.  Per batch, rows fold into one register set PER WINDOW present in
    the batch; the driver max-merges blocks × windows partial rows (a
    window's registers are 2^precision bytes; months of hourly windows are
    still KBs).  Returns (window_start timestamp, estimate,
    nonzero_buckets), SQL-exact like the other HLL surfaces."""
    import ray

    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")

    def _p(t: pa.Table) -> pa.Table:
        ws, blobs = [], []
        if t.num_rows:
            us = t.column(ts_col).cast(pa.timestamp("us"), safe=False) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            w = (us // window_us) * window_us
            for wv in np.unique(w):
                sel = t.filter(pa.array(w == wv))
                ws.append(int(wv))
                blobs.append(_partial_registers(
                    sel.column(col), precision, salt).tobytes())
        return pa.table({"w": pa.array(ws, pa.int64()),
                         "regs": pa.array(blobs, pa.binary())})

    parts = ds.select_columns([ts_col, col]).map_batches(
        _p, batch_format="pyarrow").materialize()
    merged: dict = {}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or t.num_columns == 0:
            continue
        for wv, blob in zip(t.column("w").to_pylist(),
                            t.column("regs").to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8)
            merged[wv] = np.maximum(merged[wv], r) if wv in merged else r
    ws = sorted(merged)
    return pa.table({
        "window_start": pa.array(ws, pa.int64()).cast(pa.timestamp("us")),
        "estimate": pa.array([round(hll_estimate(merged[w]), 6)
                              for w in ws], pa.float64()),
        "nonzero_buckets": pa.array(
            [int(np.count_nonzero(merged[w])) for w in ws], pa.int64()),
    })

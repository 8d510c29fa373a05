"""Explicit partition exchange: a deterministic P-way shuffle built from raw
Ray tasks, for stages whose partitioner is already KNOWN a priori (a hash
bucket or fixed range bounds).

Ray Data's ``groupby``/``sort`` all-to-all is a sample sort: it samples key
quantiles, range-partitions every block against the sampled boundaries and
merge-sorts the slices.  That machinery is what you want when the key
distribution is unknown — but when the partition function is already fixed
(dedup buckets, canonical-layout range bounds, owner-vid routing) the
sampling + global sort is pure overhead, and it is the dominant cost of the
streaming triangle prep and layout writes (measured: the two Sort stages are
>80% of triangles_300k wall time).

This exchange is the direct shape instead:

    split:    one task per input block  -> ``num_returns=P`` sub-tables
    combine:  one task per partition p  <- the p-th slice of every split

Object count is O(in_blocks x P) — the driver holds only refs (two ints of
metadata each); payloads move block-to-block through the object store, never
through the driver.  On a multi-node cluster each sub-table travels directly
from the split worker to the one combine worker that needs it, which is the
same wire shape a real cluster shuffle uses (and what pregel.py's sliced
payload exchange does for BSP supersteps).

Partitioning assumption (documented per the custom-operator contract): the
caller's ``part_of`` must map every row to [0, P) deterministically; skew is
the caller's responsibility (choose bounds from a measured distribution, as
triangle_count_streaming's wedge-balanced cuts do).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["exchange", "exchange_refs", "grouped_exchange", "hash_parts",
           "range_parts"]


def hash_parts(*cols: str, P: int, salt: int = 0x9E3779B97F4A7C15):
    """Partitioner: splitmix-style hash of one or more int64 columns mod P.
    Null keys are rejected — a null would otherwise cast to an undefined
    uint64 and land in an arbitrary, platform-dependent partition."""
    def _part(t: pa.Table) -> np.ndarray:
        key = np.zeros(t.num_rows, dtype=np.uint64)
        for c in cols:
            col = t.column(c)
            if col.null_count:
                raise ValueError(f"hash_parts: key column {c!r} contains "
                                 f"{col.null_count} null(s)")
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            key = (key ^ v) * np.uint64(salt)
            key ^= key >> np.uint64(31)
        return (key % np.uint64(P)).astype(np.int64)
    return _part


def range_parts(col: str, bounds: np.ndarray):
    """Partitioner: fixed range bounds (len P+1, ascending, covering all keys).
    Row i goes to the partition whose [bounds[p], bounds[p+1]) contains col[i].
    Keys outside [bounds[0], bounds[-1]) raise — silently clipping them into
    the edge partitions would place rows in range files whose recorded
    [lo, hi) does not contain them, breaking bounds-pruned reads.
    """
    b = np.asarray(bounds, dtype=np.int64)

    def _part(t: pa.Table) -> np.ndarray:
        k = t.column(col).to_numpy(zero_copy_only=False)
        if k.shape[0] and (k.min() < b[0] or k.max() >= b[-1]):
            raise ValueError(
                f"range_parts: keys outside [{b[0]}, {b[-1]}): "
                f"min={k.min()}, max={k.max()}")
        return (np.searchsorted(b, k, side="right") - 1).astype(np.int64)
    return _part


def _split_table(t: pa.Table, part_of, P: int):
    """Slice ``t`` into P sub-tables by the partitioner (one stable argsort)."""
    if t.num_rows == 0 or t.num_columns == 0:
        empty = t.slice(0, 0)
        return [empty] * P
    part = np.asarray(part_of(t), dtype=np.int64)
    if part.shape[0] != t.num_rows:
        raise ValueError(
            f"partitioner returned {part.shape[0]} ids for {t.num_rows} "
            "rows — rows would be silently dropped")
    if part.min() < 0 or part.max() >= P:
        raise ValueError(
            f"partitioner emitted ids outside [0, {P}): "
            f"min={part.min()}, max={part.max()} — rows would be dropped")
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    tt = t.take(pa.array(order, type=pa.int64()))
    return [tt.slice(int(cuts[p]), int(cuts[p + 1] - cuts[p]))
            for p in range(P)]


# ---- task bodies (module-level so ray.remote registration happens ONCE per
# worker process — per-call @ray.remote closures re-export the function to
# GCS on every exchange stage; the per_call part_of/map_fn/combine are small
# pickled args instead) ---------------------------------------------------------

def _merge_blocks(tables):
    ts = [pa.Table.from_pandas(t, preserve_index=False)
          if not isinstance(t, pa.Table) else t  # pandas-typed block
          for t in tables]
    live = [t for t in ts if t.num_columns > 0]
    return (pa.concat_tables(live, promote_options="permissive")
            if len(live) > 1 else (live[0] if live else ts[0]))


def _split_impl(part_of, map_fn, P, *tables):
    t = _merge_blocks(tables)
    if map_fn is not None and t.num_columns > 0:
        t = map_fn(t)
    out = _split_table(t, part_of, P)
    return out[0] if P == 1 else tuple(out)


def _combine_impl(combine, p, *tables):
    live = [t for t in tables if t.num_rows > 0 and t.num_columns > 0]
    if live:
        # permissive: unify compatible types (e.g. an int32 vid column from
        # one upstream branch of a union with int64 from the other)
        merged = pa.concat_tables(live, promote_options="permissive")
    else:
        merged = next((t for t in tables if t.num_columns > 0),
                      tables[0] if tables else pa.table({}))
    if combine is None:
        return merged
    return combine(p, merged)


def _small_impl(part_of, map_fn, combine, P, with_counts, *tables):
    t = _merge_blocks(tables)
    if map_fn is not None and t.num_columns > 0:
        t = map_fn(t)
    parts = _split_table(t, part_of, P)
    if combine is not None:
        parts = [combine(p, g) for p, g in enumerate(parts)]
    if with_counts:
        counts = np.asarray([p.num_rows for p in parts], dtype=np.int64)
        return tuple(parts) + (counts,)  # P+1 returns -> always a tuple
    return parts[0] if P == 1 else tuple(parts)


_REMOTES: dict = {}


def _remote(name: str, impl):
    if name not in _REMOTES:
        import ray
        _REMOTES[name] = ray.remote(impl)
    return _REMOTES[name]


def exchange_refs(block_refs: Sequence, part_of, P: int,
                  combine: Optional[Callable[[int, pa.Table], pa.Table]] = None,
                  map_fn: Optional[Callable[[pa.Table], pa.Table]] = None,
                  combine_num_returns: int = 1,
                  max_objects: int = 1_000_000,
                  total_rows: Optional[int] = None,
                  small_rows: int = 262_144,
                  return_counts: bool = False):
    """P-way exchange over Arrow-table object refs.

    ``map_fn``   (optional) runs inside each split task before partitioning —
                 fuse the last narrow transform into the split to avoid an
                 extra materialized pass.  Must be ROW-WISE (it may see the
                 concatenation of several upstream blocks, see below).
    ``combine``  runs once per partition p over the concatenation of its
                 slices; default returns the concatenated table.  With
                 ``combine_num_returns > 1`` the combine may return a tuple
                 (e.g. (written-table, stats-row)) and the function returns a
                 list of ref-tuples.

    Requires at least one block ref (``exchange`` handles empty datasets).
    Empty PARTITIONS produce zero-row tables with the upstream schema —
    combines must tolerate them (the schema is preserved by slicing, never
    dropped as Ray Data's empty groupby reduce partitions drop it).

    ``small_rows`` gates the one-task fast path below; callers whose map_fn /
    combine EXPAND rows superlinearly (pair generation from band buckets)
    should pass a smaller gate (or 0) so the expansion still fans out.

    Object-count bound: a naive split emits ``in_blocks × P`` sub-table refs;
    at cluster scale (1e5 blocks × 1e3 partitions) that is 1e8 driver-held
    refs.  When ``in_blocks × P > max_objects`` the split stage groups
    adjacent input blocks — one split task concatenates its group before
    partitioning — capping the ref count at ~``max_objects`` with no extra
    pass over the data (the concat happens inside the task that was reading
    those blocks anyway).
    """
    if P < 1:
        raise ValueError("P must be >= 1")
    if combine_num_returns > 1 and combine is None:
        raise ValueError("combine_num_returns > 1 requires a combine "
                         "(the default concat returns one object)")

    n_in = len(block_refs)
    if n_in == 0:
        raise ValueError("exchange_refs needs at least one block ref; "
                         "exchange() handles empty datasets")

    # Small-input fast path: a chained tiny exchange (candidate pairs, join of
    # a small pair set, a final combine over kilobytes) pays two scheduling
    # rounds of n_in + P tasks for data one worker handles in microseconds.
    # When the caller KNOWS the total row count and it is small, run the whole
    # split + per-partition combine in ONE task (num_returns=P keeps the
    # output shape identical: one ref per partition).  At data scale
    # total_rows exceeds small_rows and the distributed shape below runs.
    if (total_rows is not None and total_rows <= small_rows
            and combine_num_returns == 1):
        small = _remote("small", _small_impl)
        nret = P + 1 if return_counts else P
        opts = small.options(num_returns=nret) if nret > 1 else small
        out = opts.remote(part_of, map_fn, combine, P, return_counts,
                          *block_refs)
        if return_counts:
            out = list(out)
            return out[:P], out[P]  # (partition refs, counts-vector ref)
        return [out] if P == 1 else list(out)

    group = max(1, -(-(n_in * P) // max_objects))  # ceil(in*P / max_objects)
    split = _remote("split", _split_impl)
    comb = _remote("combine", _combine_impl)

    split_opts = split.options(num_returns=P) if P > 1 else split
    cols = [[] for _ in range(P)]
    for i in range(0, n_in, group):
        parts = split_opts.remote(part_of, map_fn, P, *block_refs[i:i + group])
        if P == 1:
            parts = [parts]  # a single return is not wrapped by Ray
        for p in range(P):
            cols[p].append(parts[p])
    comb_opts = (comb.options(num_returns=combine_num_returns)
                 if combine_num_returns > 1 else comb)
    res = [comb_opts.remote(combine, p, *cols[p]) for p in range(P)]
    if return_counts:
        # distributed path: counts unknown without blocking on every combine
        # (which would serialize the pipeline) — caller keeps all partitions
        return res, None
    return res


def grouped_exchange(ds, bucket_col: str, P: int,
                     combine_group: Callable[[pa.Table], pa.Table],
                     map_fn: Optional[Callable[[pa.Table], pa.Table]] = None,
                     empty_result: Optional[pa.Table] = None,
                     small_rows: int = 262_144):
    """Drop-in replacement for ``groupby(bucket).map_groups(combine_group)``
    when ``bucket_col`` already holds a partition id in ``[0, P)`` (the
    repo's bucketed-combine pattern, stages/bucketing.py).  The sampled sort
    Ray Data runs for that groupby re-discovers a partitioning the caller
    already computed; here rows route straight to their bucket's combine.

    Differences from map_groups the caller must accept:
      * ``combine_group`` sees the WHOLE bucket partition (identical, since
        one bucket value = one group = one partition);
      * empty buckets DO reach the combine (map_groups never saw them) as
        zero-row tables with the upstream schema — pass ``empty_result`` (a
        typed empty output table) if the combine can't produce its own typed
        empty output.
    Pass a small ``small_rows`` (or 0) when ``combine_group`` expands rows
    superlinearly (pair generation) — see ``exchange_refs``.
    """
    def _part(t: pa.Table) -> np.ndarray:
        return t.column(bucket_col).to_numpy(zero_copy_only=False)

    def _comb(p: int, g: pa.Table) -> pa.Table:
        if g.num_rows == 0 and empty_result is not None:
            return empty_result
        return combine_group(g)

    return exchange(ds, _part, P, combine=_comb, map_fn=map_fn,
                    small_rows=small_rows)


def exchange(ds, part_of, P: int,
             combine: Optional[Callable[[int, pa.Table], pa.Table]] = None,
             map_fn: Optional[Callable[[pa.Table], pa.Table]] = None,
             small_rows: int = 262_144):
    """Dataset-in, Dataset-out exchange (see ``exchange_refs``).

    The input is materialized to block refs (zero-copy; Ray Data blocks are
    already Arrow tables in the object store) and the combined partitions are
    re-wrapped with ``from_arrow_refs`` — downstream stages keep streaming.
    """
    import ray
    import ray.data

    from .blocks import metadata_total_bytes, nonempty_arrow_refs

    if P < 1:
        raise ValueError("P must be >= 1")
    mat = ds.materialize()
    refs, counts = nonempty_arrow_refs(mat)
    if not refs:
        # All blocks empty: still produce the exchange's OUTPUT schema — run
        # map_fn + combine driver-side on a typed zero-row table (combines
        # must tolerate empty partitions per the exchange contract); returning
        # the input here would leak the pre-combine schema downstream.
        for r in mat.to_arrow_refs():
            t0 = ray.get(r)
            if not isinstance(t0, pa.Table):
                t0 = pa.Table.from_pandas(t0, preserve_index=False)
            if t0.num_columns:
                empty = t0.slice(0, 0)
                if map_fn is not None:
                    empty = map_fn(empty)
                outs = ([combine(p, empty) for p in range(P)]
                        if combine is not None else [empty] * P)
                # one typed block carries the schema; zero-row blocks beyond
                # it only feed Ray's skip-the-UDF schema-less path downstream
                live = [t for t in outs if t.num_rows > 0]
                return ray.data.from_arrow(live if live else outs[:1])
        return mat  # zero-column input: no schema to preserve (already executed)
    # rows gate the one-task fast path; a small-row table of LARGE payloads
    # (long texts, binary columns) must still take the distributed shape —
    # signal that by reporting the row total as unknown above 64 MB
    total_rows: Optional[int] = sum(counts)
    tb = metadata_total_bytes(mat)
    if tb is None or tb > 64 * 1024 * 1024:
        # unknown size counts as large: a small-row table of huge payloads
        # must not ride the one-task fast path on a missing size_bytes
        total_rows = None
    out, counts_ref = exchange_refs(refs, part_of, P, combine=combine,
                                    map_fn=map_fn, total_rows=total_rows,
                                    small_rows=small_rows, return_counts=True)
    if counts_ref is not None:
        # small fast path: the one task already finished its split+combines —
        # drop zero-row partitions so downstream map_batches never sees Ray's
        # skip-the-UDF schema-less empty blocks (the round-4 crash class; the
        # blocking get costs nothing, the counts vector rides the same task).
        # The DISTRIBUTED path below cannot drop empties without blocking on
        # every combine (serializing the pipeline); its zero-row partitions
        # keep their schema, and every to_arrow_refs consumer in the repo
        # filters by row count (nonempty_arrow_refs / _to_table) — pinned by
        # TestDistributedEmptyPartitions
        cnts = ray.get(counts_ref)
        live = [r for r, c in zip(out, cnts) if c > 0]
        out = live if live else out[:1]  # keep one typed block for schema
    return ray.data.from_arrow_refs(out)

"""Distributed global prefix sum and token-budget sequence packing.

The training-data "packing" step: documents are concatenated in a fixed
global order and chunked into budget-sized training sequences; each document
is assigned the pack (sequence) that contains its FIRST token, i.e.
``pack_id = floor(exclusive_prefix_tokens / budget)``.  That definition makes
the operator exact, order-deterministic and SQL-checkable (a window sum),
while matching how causal-LM concat-and-chunk pipelines map documents to
sequences.

The prefix sum is the classic two-phase distributed scan:

  1. range-exchange rows by the order key into P ordered partitions
     (sampled quantile bounds — the Spark-RangePartitioner pattern: the
     driver sees ≤ ``sample_cap`` keys regardless of row count, plus one
     exact min/max aggregate so no key falls outside the bounds);
  2. each partition combine sorts its slice and computes the LOCAL
     cumulative sum + its total, in one task;
  3. the driver exclusive-scans the P totals (P ints — never row data);
  4. a per-partition task adds the partition offset.

Partitioning assumptions (documented per the custom-operator contract):
the order key is an int64, globally unique (ties would make the scan order
ambiguous), and one partition's rows fit a worker (same contract as the
repo's bucketed combines; raise P for skew).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _add_offset_impl(prefix_col, offset, tab: pa.Table) -> pa.Table:
    i = tab.schema.get_field_index(prefix_col)
    vals = tab.column(prefix_col).to_numpy(zero_copy_only=False) + offset
    return tab.set_column(i, prefix_col, pa.array(vals, pa.int64()))


def _quantile_bounds(ds, col: str, P: int,
                     sample_cap: int = 500_000) -> np.ndarray:
    """Range bounds covering [min, max+1) exactly (one narrow min/max
    aggregate), with interior cuts from a bounded sample."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = int(agg["lo"]), int(agg["hi"])
    if P <= 1:
        return np.asarray([lo, hi + 1], dtype=np.int64)
    rows = ds.count()
    frac = min(1.0, sample_cap / max(rows, 1))
    sm = ds.select_columns([col])
    if frac < 1.0:
        sm = sm.random_sample(frac, seed=13)
    vals = np.sort(np.concatenate(
        [t.column(col).to_numpy(zero_copy_only=False)
         for t in sm.iter_batches(batch_format="pyarrow", batch_size=65536)]
        or [np.empty(0, dtype=np.int64)]))
    if vals.shape[0] == 0:
        return np.asarray([lo, hi + 1], dtype=np.int64)
    pos = (vals.shape[0] * np.arange(1, P)) // P
    cuts = vals[np.minimum(pos, vals.shape[0] - 1)]
    return np.unique(np.concatenate(([lo], cuts, [hi + 1]))).astype(np.int64)


def global_prefix_sum(ds, value_col: str, order_col: str, *,
                      prefix_col: str = "prefix", exclusive: bool = True,
                      P: Optional[int] = None):
    """Add ``prefix_col`` = sum of ``value_col`` over all rows with a smaller
    ``order_col`` (exclusive; ``exclusive=False`` includes the row itself).
    Input is reduced to the (order, value) projection — join other columns
    back by ``order_col`` if needed.  Output rows are int64 and the dataset
    stays distributed: the driver holds bounds + P partition totals only.
    """
    import ray
    import ray.data

    from ..stages.blocks import nonempty_arrow_refs
    from ..stages.bucketing import adaptive_bucket_count
    from ..stages.exchange import _remote, exchange_refs, range_parts

    # materialize the narrow projection ONCE — count / min-max / sample /
    # exchange below are all passes over it, and a lazy dataset would re-run
    # the (possibly expensive) upstream per pass
    narrow = ds.select_columns([order_col, value_col]).materialize()
    rows = narrow.count()
    empty = pa.table({order_col: pa.array([], pa.int64()),
                      value_col: pa.array([], pa.int64()),
                      prefix_col: pa.array([], pa.int64())})
    if rows == 0:
        return ray.data.from_arrow(empty)
    if P is None:
        P = adaptive_bucket_count(rows)
    bounds = _quantile_bounds(narrow, order_col, P)
    P = len(bounds) - 1

    def _combine(p: int, t: pa.Table):
        k = t.column(order_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        o = np.argsort(k, kind="stable")
        k, v = k[o], v[o]
        incl = np.cumsum(v)
        pre = incl if not exclusive else incl - v
        tab = pa.table({order_col: pa.array(k), value_col: pa.array(v),
                        prefix_col: pa.array(pre.astype(np.int64))})
        stats = pa.table({"total": pa.array([int(incl[-1]) if v.shape[0]
                                             else 0], pa.int64()),
                          "rows": pa.array([v.shape[0]], pa.int64())})
        return tab, stats

    refs, _ = nonempty_arrow_refs(narrow)
    out = exchange_refs(refs, range_parts(order_col, bounds), P,
                        combine=_combine, combine_num_returns=2)
    # P tiny stat rows -> exclusive scan of partition totals on the driver
    stats = ray.get([s for _, s in out])
    totals = np.asarray([int(s.column("total")[0].as_py()) for s in stats],
                        dtype=np.int64)
    nrows = np.asarray([int(s.column("rows")[0].as_py()) for s in stats],
                       dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    add = _remote("prefix_add_offset", _add_offset_impl)
    final = [add.remote(prefix_col, int(offsets[p]), tref)
             for p, (tref, _) in enumerate(out) if nrows[p] > 0]
    if not final:
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(final)


def pack_documents(docs_ds, budget: int, *, token_col: Optional[str] = None,
                   P: Optional[int] = None):
    """Assign each document to its training sequence under concat-and-chunk
    packing: ``pack_id = exclusive_prefix_tokens // budget`` in doc_id order.
    ``token_col=None`` counts whitespace tokens with the DuckDB-equal
    TokenCounter (len(split(trim(text), r'\\s+'))); pass an existing int64
    column (e.g. a BPE count) to pack by real tokenizer lengths.
    Returns (doc_id, n_tokens, prefix, pack_id), distributed.
    """
    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    if token_col is None:
        from .text import TokenCounter
        narrow = docs_ds.map_batches(TokenCounter(), batch_format="pyarrow")
        token_col = "n_tokens"
    else:
        narrow = docs_ds.select_columns(["doc_id", token_col])
    pre = global_prefix_sum(narrow, token_col, "doc_id")

    def _pack(b: pa.Table) -> pa.Table:
        pk = b.column("prefix").to_numpy(zero_copy_only=False) // budget
        return b.append_column("pack_id", pa.array(pk.astype(np.int64)))

    return pre.map_batches(_pack, batch_format="pyarrow")


def _order_pos_impl(pos_col, offset, tab: pa.Table) -> pa.Table:
    return tab.append_column(
        pos_col, pa.array(offset + np.arange(tab.num_rows, dtype=np.int64)))


def global_order(ds, order_col: str, *, pos_col: str = "global_pos",
                 P: Optional[int] = None):
    """Dense global row numbers by a UNIQUE int64 key — the distributed
    ``ORDER BY`` / ``row_number()`` primitive (pos = 0-based count of rows
    with a smaller key).  All input columns are kept; rows come back range-
    partitioned AND locally sorted by ``order_col``, so writing the result
    through the partitioned sink yields globally ordered, resumable output
    (part NNNNN holds the NNNNN-th key range).

    Same two-phase scan as :func:`global_prefix_sum` (sampled quantile
    bounds → range exchange → per-partition sort + count → the driver
    exclusive-scans P ints → per-partition offset add): the driver never
    holds row data, and skew is bounded by the sampled bounds.  The key
    must be UNIQUE int64 (cast timestamps to int64 microseconds upstream;
    combine composite keys into one int64, e.g. a 48-bit hash rank) —
    duplicate keys raise, because ties split across range partitions would
    otherwise get partition-dependent positions.
    """
    import ray
    import ray.data

    from ..stages.blocks import nonempty_arrow_refs
    from ..stages.bucketing import adaptive_bucket_count
    from ..stages.exchange import _remote, exchange_refs, range_parts

    mat = ds.materialize()
    rows = mat.count()
    if rows == 0:
        sch = mat.schema()
        cols = {n: pa.array([], t if isinstance(t, pa.DataType)
                            else pa.from_numpy_dtype(np.dtype(t)))
                for n, t in zip(sch.names, sch.types)}
        cols[pos_col] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    if P is None:
        P = adaptive_bucket_count(rows)
    narrow = mat.select_columns([order_col]).materialize()
    bounds = _quantile_bounds(narrow, order_col, P)
    P = len(bounds) - 1

    def _combine(p: int, t: pa.Table):
        k = t.column(order_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        o = np.argsort(k, kind="stable")
        ks = k[o]
        if ks.shape[0] > 1 and np.any(ks[1:] == ks[:-1]):
            dup = int(ks[1:][ks[1:] == ks[:-1]][0])
            raise ValueError(
                f"global_order: duplicate order key {dup} — the key must be "
                "unique (ties across range partitions would get partition-"
                "dependent positions); combine a tiebreak into the key")
        tab = t.take(pa.array(o, type=pa.int64()))
        stats = pa.table({"rows": pa.array([t.num_rows], pa.int64())})
        return tab, stats

    refs, _ = nonempty_arrow_refs(mat)
    out = exchange_refs(refs, range_parts(order_col, bounds), P,
                        combine=_combine, combine_num_returns=2)
    stats = ray.get([s for _, s in out])
    nrows = np.asarray([int(s.column("rows")[0].as_py()) for s in stats],
                       dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(nrows)[:-1]))
    add = _remote("order_add_pos", _order_pos_impl)
    final = [add.remote(pos_col, int(offsets[p]), tref)
             for p, (tref, _) in enumerate(out) if nrows[p] > 0]
    return ray.data.from_arrow_refs(final)

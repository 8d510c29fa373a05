"""Relational operators Ray Data lacks, built on the known-partitioner
exchange (stages/exchange.py): as-of join, range join, grouped top-k and
grouped quantiles.

These are the "custom operator" tier of the build plan: each is expressed as
a composition of per-batch partials + an explicit hash exchange (never Ray
Data's sampled-sort groupby), with the partitioning assumption documented on
each function.  The reference has no streaming/temporal machinery at all
(SURVEY.md §1.3); these cover the training-data-pipeline shapes (event-log
enrichment, banded bucketing, per-group selection/statistics) a 100 TB
corpus pipeline needs around the graph algorithms.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

_SIDE = "__asof_side"
_BUCKET = "__rel_bucket"


def _col_bucket_values(col: pa.ChunkedArray, P: int) -> np.ndarray:
    """Bucket ids for an int or string column (crc32 for strings — Python's
    str hash is per-process salted and would split keys across workers).
    Null keys are rejected: a null int would cast NaN→uint64 (undefined,
    platform-dependent bucket) and a null string would crash mid-task."""
    if col.null_count:
        raise ValueError(f"bucket key column contains {col.null_count} "
                         "null(s) — filter or fill them upstream")
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return (((v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(38))
                % np.uint64(P)).astype(np.int64)
    from zlib import crc32
    return np.asarray([crc32(x.encode()) % P for x in col.to_pylist()],
                      dtype=np.int64)


def _pa_type(t):
    """Coerce a Ray Data schema type (pyarrow.DataType or numpy dtype —
    pandas blocks report object dtype for strings) to a pyarrow type."""
    if isinstance(t, pa.DataType):
        return t
    if t is str:
        return pa.string()
    dt = np.dtype(t)
    if dt.kind in ("U", "S", "O"):
        return pa.string()
    return pa.from_numpy_dtype(dt)


def asof_join(left_ds, right_ds, *, on: str, left_ts: str = "ts",
              right_ts: str = "ts", right_cols: Optional[Sequence[str]] = None,
              direction: str = "backward", num_buckets: Optional[int] = None,
              suffix: str = "_r", left_schema=None, right_schema=None):
    """As-of join: for each left row, attach the right row with the same
    ``on`` key and the greatest ``right_ts`` <= ``left_ts`` (``backward``;
    ``forward`` = smallest right_ts >= left_ts).  Inner semantics — left rows
    with no match are dropped — matching DuckDB's default ``ASOF JOIN``.

    Shape: both sides are tagged with ``hash(on) % B`` and routed through one
    grouped exchange; each bucket task runs a single vectorized
    ``pandas.merge_asof`` (the sorted-merge kernel itself — per PARTITION,
    not per batch, so the pandas conversion amortizes over the whole bucket).

    Partitioning assumption: all rows of one key land in one bucket (hash
    partitioning guarantees it); a bucket pair must fit a worker — size
    ``num_buckets`` accordingly for skewed keys.

    Determinism: if several right rows tie on (key, right_ts) exactly, the
    match among them is unspecified (DuckDB's ASOF documents the same) —
    pre-deduplicate the right side for bit-stable output.

    Pass ``left_schema``/``right_schema`` (pyarrow.Schema) when known: without
    them ``Dataset.schema()`` partially EXECUTES each side's upstream pipeline
    just to learn the columns (same contract as joins.hash_join).
    """
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction}")

    lschema = left_schema if left_schema is not None else left_ds.schema()
    rschema = right_schema if right_schema is not None else right_ds.schema()
    lcols = list(lschema.names)
    rnames = list(rschema.names)
    if right_cols is None:
        right_cols = [c for c in rnames if c not in (on,)]
    # right ts column must ride along for the merge even if not requested
    carry = list(dict.fromkeys([*right_cols, right_ts]))
    out_right = [(c, c + suffix if c in lcols else c) for c in right_cols]

    if num_buckets is None:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(left_ds))

    ltypes = {n: _pa_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rschema.names, rschema.types)}
    union_order = ([on] + [c for c in lcols if c != on]
                   + [f"__r_{c}" for c in carry] + [_BUCKET, _SIDE])

    def _pad_left(t: pa.Table) -> pa.Table:
        for c in carry:
            t = t.append_column(pa.field(f"__r_{c}", rtypes[c]),
                                pa.nulls(t.num_rows, type=rtypes[c]))
        t = t.append_column(_SIDE, pa.array(np.zeros(t.num_rows, np.int8)))
        return t.select(union_order)

    def _pad_right(t: pa.Table) -> pa.Table:
        for c in carry:
            t = t.append_column(pa.field(f"__r_{c}", rtypes[c]),
                                t.column(c))
        keep = [on] + [f"__r_{c}" for c in carry] + [_BUCKET]
        t = t.select(keep)
        for c in lcols:
            if c != on:
                t = t.append_column(pa.field(c, ltypes[c]),
                                    pa.nulls(t.num_rows, type=ltypes[c]))
        t = t.append_column(_SIDE, pa.array(np.ones(t.num_rows, np.int8)))
        return t.select(union_order)

    def _prep(pad):
        def _f(t: pa.Table) -> pa.Table:
            b = _col_bucket_values(t.column(on), num_buckets)
            return pad(t.append_column(_BUCKET, pa.array(b)))
        return _f

    lt = left_ds.map_batches(_prep(_pad_left), batch_format="pyarrow")
    rt = right_ds.map_batches(_prep(_pad_right), batch_format="pyarrow")

    out_fields = ([pa.field(on, ltypes[on])]
                  + [pa.field(c, ltypes[c]) for c in lcols if c != on]
                  + [pa.field(nm, rtypes[c]) for c, nm in out_right])
    empty = pa.table({f.name: pa.array([], f.type) for f in out_fields})

    def _join_bucket(g: pa.Table) -> pa.Table:
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        l = g.filter(lmask).select([on] + [c for c in lcols if c != on])
        r = g.filter(pa.compute.invert(lmask)) \
            .select([on] + [f"__r_{c}" for c in carry])
        if l.num_rows == 0 or r.num_rows == 0:
            return empty
        ldf = l.to_pandas()
        rdf = r.to_pandas()
        # a single null merge key aborts pd.merge_asof — drop such rows (a
        # null timestamp can never satisfy the inner as-of predicate anyway)
        ldf = ldf[ldf[left_ts].notna()]
        rdf = rdf[rdf[f"__r_{right_ts}"].notna()]
        if len(ldf) == 0 or len(rdf) == 0:
            return empty
        # merge key: a raw copy of the right ts (original dtype); the carried
        # __r_ columns convert to NULLABLE Int64 so unmatched-left NaNs never
        # float them — a float64 round-trip silently corrupts int64 values
        # above 2^53 (snowflake ids, nanosecond epochs)
        rdf = rdf.assign(__asof_key=rdf[f"__r_{right_ts}"])
        for c in carry:
            if pa.types.is_integer(rtypes[c]):
                rdf[f"__r_{c}"] = rdf[f"__r_{c}"].astype("Int64")
        merged = pd.merge_asof(
            ldf.sort_values(left_ts, kind="stable"),
            rdf.sort_values("__asof_key", kind="stable"),
            left_on=left_ts, right_on="__asof_key",
            left_by=on, right_by=on, direction=direction,
            allow_exact_matches=True)
        matched = merged[merged["__asof_key"].notna()]
        cols = {on: matched[on].to_numpy()}
        for c in lcols:
            if c != on:
                cols[c] = matched[c].to_numpy()
        arrs = [pa.array(cols[on]).cast(ltypes[on])] + [
            pa.array(cols[c]).cast(ltypes[c]) for c in lcols if c != on]
        for c, nm in out_right:
            # matched rows only: restore the right column's true type (the
            # merge floats int columns that carried NaNs pre-filter)
            v = matched[f"__r_{c}"]
            arrs.append(pa.array(v).cast(rtypes[c]))
        return pa.table({f.name: a for f, a in zip(out_fields, arrs)})

    from ..stages.exchange import grouped_exchange
    return grouped_exchange(lt.union(rt), _BUCKET, num_buckets, _join_bucket,
                            empty_result=empty)


def range_join(ds, bands: pa.Table, value_col: str, *, lo_col: str = "lo",
               hi_col: str = "hi"):
    """Broadcast range (interval) join: keep rows where some band's
    ``lo <= value < hi``, appending that band's label columns.  Overlapping
    bands emit one output row per matching band.

    The band table is the SMALL side (published once with ``ray.put``, read
    per batch — never re-shipped, never shuffled).  Disjoint ascending bands
    take a single vectorized ``searchsorted`` per batch; overlapping bands
    fall back to one vectorized mask per band (#bands is small by contract).
    """
    import ray

    lo = np.asarray(bands.column(lo_col).to_pylist(), dtype=np.float64)
    hi = np.asarray(bands.column(hi_col).to_pylist(), dtype=np.float64)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    band_cols = [c for c in bands.column_names if c not in (lo_col, hi_col)]
    btab = bands.take(pa.array(order, type=pa.int64())).select(band_cols)
    disjoint = bool(np.all(hi[:-1] <= lo[1:])) if lo.shape[0] > 1 else True
    ref = ray.put((lo, hi, btab, disjoint))

    class _RangeJoin:
        def __init__(self):
            self.state = None
            self.__name__ = "range_join"

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.state is None:
                self.state = ray.get(ref)
            lo, hi, btab, disjoint = self.state
            v = t.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            if disjoint:
                idx = np.searchsorted(lo, v, side="right") - 1
                ok = idx >= 0
                ok[ok] &= v[ok] < hi[idx[ok]]
                rows = np.nonzero(ok)[0]
                bidx = idx[rows]
            else:
                rows_l, bidx_l = [], []
                for b in range(lo.shape[0]):
                    m = np.nonzero((v >= lo[b]) & (v < hi[b]))[0]
                    rows_l.append(m)
                    bidx_l.append(np.full(m.shape[0], b, dtype=np.int64))
                rows = np.concatenate(rows_l) if rows_l else \
                    np.array([], dtype=np.int64)
                bidx = np.concatenate(bidx_l) if bidx_l else \
                    np.array([], dtype=np.int64)
            out = t.take(pa.array(rows, type=pa.int64()))
            bsel = btab.take(pa.array(bidx, type=pa.int64()))
            for c in band_cols:
                out = out.append_column(c, bsel.column(c))
            return out

    return ds.map_batches(_RangeJoin(), batch_format="pyarrow")


def _topk_kernel(t: pa.Table, group_col: str, order_col: str, k: int,
                 largest: bool, tiebreak: Optional[str]) -> pa.Table:
    """Vectorized per-table top-k per group: one lexsort + run-length ranks."""
    if t.num_rows == 0:
        return t
    gcol = t.column(group_col)
    if pa.types.is_integer(gcol.type):
        g = gcol.to_numpy(zero_copy_only=False)
    else:
        # dense-rank string groups for the sort (order value irrelevant)
        g = np.unique(np.asarray(gcol.to_pylist(), dtype=object),
                      return_inverse=True)[1]
    v = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.float64)
    keys = [v if not largest else -v]
    if tiebreak is not None:
        keys.insert(0, t.column(tiebreak).to_numpy(zero_copy_only=False))
    order = np.lexsort(tuple(keys) + (g,))
    gs = g[order]
    starts = np.ones(gs.shape[0], dtype=bool)
    starts[1:] = gs[1:] != gs[:-1]
    start_idx = np.nonzero(starts)[0]
    rank = np.arange(gs.shape[0]) - np.repeat(
        start_idx, np.diff(np.append(start_idx, gs.shape[0])))
    keep = order[rank < k]
    return t.take(pa.array(np.sort(keep), type=pa.int64()))


def top_k_per_group(ds, group_col: str, order_col: str, k: int, *,
                    largest: bool = True, tiebreak: Optional[str] = None,
                    num_buckets: Optional[int] = None, schema=None):
    """Top-k rows per group by ``order_col`` (ties broken by ``tiebreak``
    ascending — pass one for deterministic output).

    Partial/final: each batch keeps at most k rows per group (one lexsort),
    then groups route through a hash exchange and the same kernel runs once
    per bucket — the shuffle moves O(groups·k) rows, never the input.

    Pass ``schema`` (pyarrow.Schema) when known — ``Dataset.schema()``
    partially executes the upstream pipeline (same contract as asof_join).
    """
    if num_buckets is None:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(ds))

    partial = ds.map_batches(
        lambda t: _topk_kernel(t, group_col, order_col, k, largest, tiebreak),
        batch_format="pyarrow")

    def _tag(t: pa.Table) -> pa.Table:
        b = _col_bucket_values(t.column(group_col), num_buckets)
        return t.append_column(_BUCKET, pa.array(b))

    def _final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return None  # replaced by empty_result
        g = g.drop_columns([_BUCKET])
        return _topk_kernel(g, group_col, order_col, k, largest, tiebreak)

    from ..stages.exchange import grouped_exchange
    if schema is None:
        schema = ds.schema()
    empty = pa.table({n: pa.array([], _pa_type(t))
                      for n, t in zip(schema.names, schema.types)})

    def _final_safe(g: pa.Table) -> pa.Table:
        out = _final(g)
        return empty if out is None else out

    return grouped_exchange(partial, _BUCKET, num_buckets, _final_safe,
                            map_fn=_tag, empty_result=empty)


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: Sequence[float] = (0.25, 0.5, 0.75, 0.99), *,
                      num_buckets: Optional[int] = None, schema=None):
    """Exact per-group quantiles (NumPy linear interpolation — the R-7
    estimator, identical to DuckDB/Postgres ``quantile_cont``).

    Rows hash-route to their group's bucket and every group's values are
    ranked in one partition — exact, like the reference's percentile
    summaries (HistogramUtils.java / wcc stats mode).  Partitioning
    assumption: one GROUP's values fit a worker (groups per bucket may be
    many).  For heavy-hitter groups beyond worker memory, pre-aggregate to a
    sketch instead — exactness is this operator's contract.
    """
    if num_buckets is None:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(ds))
    qarr = np.asarray(list(qs), dtype=np.float64)

    if schema is None:
        schema = ds.schema()  # once — schema() partially executes upstream
    gtype = None
    for nm, t in zip(schema.names, schema.types):
        if nm == group_col:
            gtype = _pa_type(t)
    empty = pa.table({group_col: pa.array([], gtype),
                      "q": pa.array([], pa.float64()),
                      "value": pa.array([], pa.float64())})

    def _tag(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        b = _col_bucket_values(t.column(group_col), num_buckets)
        return t.append_column(_BUCKET, pa.array(b))

    def _quants(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        gcol = g.column(group_col)
        if pa.types.is_integer(gcol.type):
            garr = gcol.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(garr, return_inverse=True)
            labels = pa.array(uniq).cast(gtype)
        else:
            garr = np.asarray(gcol.to_pylist(), dtype=object)
            uniq, inv = np.unique(garr, return_inverse=True)
            labels = pa.array(list(uniq), type=gtype)
        v = g.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.argsort(inv, kind="stable")
        vi, gi = v[order], inv[order]
        starts = np.searchsorted(gi, np.arange(len(uniq) + 1))
        out_g, out_q, out_v = [], [], []
        for gidx in range(len(uniq)):
            vals = np.sort(vi[starts[gidx]:starts[gidx + 1]])
            out_v.append(np.quantile(vals, qarr))
            out_q.append(qarr)
            out_g.append(np.full(qarr.shape[0], gidx, dtype=np.int64))
        gsel = pa.array(np.concatenate(out_g), type=pa.int64()) \
            if out_g else pa.array([], pa.int64())
        return pa.table({
            group_col: labels.take(gsel),
            "q": pa.array(np.concatenate(out_q) if out_q else
                          np.array([], np.float64)),
            "value": pa.array(np.concatenate(out_v) if out_v else
                              np.array([], np.float64)),
        })

    from ..stages.exchange import grouped_exchange
    return grouped_exchange(ds, _BUCKET, num_buckets, _quants, map_fn=_tag,
                            empty_result=empty)


def _partition_sort(g: pa.Table, partition_col: str, order_col: str,
                    tiebreak: Optional[str]):
    """Shared window prologue: encode the partition key, lexsort by
    (key, order[, tiebreak]), compute group boundaries.  Returns
    (order, sorted_order_values, new_grp, grp_start); callers gather their
    own value columns through ``order``."""
    gcol = g.column(partition_col)
    if pa.types.is_integer(gcol.type):
        garr = gcol.to_numpy(zero_copy_only=False)
    else:
        garr = np.unique(np.asarray(gcol.to_pylist(), dtype=object),
                         return_inverse=True)[1]
    o = g.column(order_col).to_numpy(zero_copy_only=False)
    keys = [o, garr]
    if tiebreak is not None:
        keys.insert(0, g.column(tiebreak).to_numpy(zero_copy_only=False))
    order = np.lexsort(tuple(keys))
    gs = garr[order]
    n = order.shape[0]
    idx = np.arange(n)
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = gs[1:] != gs[:-1]
    grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
    return order, o[order], new_grp, grp_start


def _keyed_window_exchange(ds, partition_col: str,
                           num_buckets: Optional[int], schema,
                           extra_cols: dict, kernel):
    """Shared scaffolding for the window-function family (window_functions,
    rolling_agg): adaptive bucket count, output-typed empty table, bucket
    tag, empty-partition guard, grouped_exchange."""
    if num_buckets is None:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(ds))
    if schema is None:
        schema = ds.schema()  # once — schema() partially executes upstream
    cols = {n: _pa_type(t) for n, t in zip(schema.names, schema.types)}
    cols.update(extra_cols)
    empty = pa.table({n: pa.array([], t) for n, t in cols.items()})

    def _tag(t: pa.Table) -> pa.Table:
        b = _col_bucket_values(t.column(partition_col), num_buckets)
        return t.append_column(_BUCKET, pa.array(b))

    def _combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        return kernel(g.drop_columns([_BUCKET]))

    from ..stages.exchange import grouped_exchange
    return grouped_exchange(ds, _BUCKET, num_buckets, _combine, map_fn=_tag,
                            empty_result=empty)


def _window_kernel(g: pa.Table, partition_col: str, order_col: str,
                   value_col: str, tiebreak: Optional[str]) -> pa.Table:
    """Vectorized window functions over one hash partition: one lexsort, then
    boundary-index arithmetic for row_number/rank/lag/lead/cumsum; cummax is
    the only per-group loop (no exact vectorized grouped-cummax exists that
    is float-precision-safe)."""
    v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    order, os_, new_grp, grp_start = _partition_sort(
        g, partition_col, order_col, tiebreak)
    vs = v[order]
    n = order.shape[0]
    idx = np.arange(n)
    rn = idx - grp_start + 1
    # SQL rank(): ties share the FIRST row number of their (order value) run
    new_run = new_grp.copy()
    new_run[1:] |= os_[1:] != os_[:-1]
    run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
    rnk = run_start - grp_start + 1
    lag = np.full(n, np.nan)
    lead = np.full(n, np.nan)
    if n > 1:
        cont = ~new_grp[1:]           # row i (i>=1) continues row i-1's group
        lag[1:][cont] = vs[:-1][cont]
        lead[:-1][cont] = vs[1:][cont]
    cs = np.cumsum(vs)
    cum = cs - (cs[grp_start] - vs[grp_start])
    cmx = np.empty(n)
    bounds = np.append(idx[new_grp], n)
    for a, b in zip(bounds[:-1], bounds[1:]):
        cmx[a:b] = np.maximum.accumulate(vs[a:b])
    out = g.take(pa.array(order, type=pa.int64()))
    for name, arr, typ in (("rn", rn, pa.int64()), ("rnk", rnk, pa.int64()),
                           ("lag_value", lag, pa.float64()),
                           ("lead_value", lead, pa.float64()),
                           ("cum_value", cum, pa.float64()),
                           ("cum_max", cmx, pa.float64())):
        out = out.append_column(name, pa.array(arr, type=typ))
    return out


def window_functions(ds, *, partition_col: str, order_col: str,
                     value_col: str, tiebreak: Optional[str] = None,
                     num_buckets: Optional[int] = None, schema=None):
    """SQL window functions over key partitions — the per-entity sequence
    features an event-log pipeline derives (session ordinals, deltas,
    running totals).  For each row, computed over
    ``PARTITION BY partition_col ORDER BY order_col[, tiebreak]``:

      * ``rn``  — row_number() (pass ``tiebreak`` for determinism)
      * ``rnk`` — rank() over ``order_col`` alone (ties share a rank)
      * ``lag_value`` / ``lead_value`` — value_col one row back/forward
        (NaN at partition edges, matching SQL NULL in float compare)
      * ``cum_value`` / ``cum_max`` — running sum / max of value_col

    Shape: rows hash-route to their partition key's bucket (the known-
    partitioner exchange — no sampled sort), then ONE lexsort per bucket
    computes every function via boundary-index arithmetic.  Window functions
    are inherently a full shuffle of the input (each row's result depends on
    its whole partition); the exchange moves each row exactly once.
    Partitioning assumption: all rows of ONE partition key fit a worker —
    true for per-user/per-session event logs; a key with ~1e8+ rows needs a
    range-partitioned segment-merge variant instead.
    """
    return _keyed_window_exchange(
        ds, partition_col, num_buckets, schema,
        {"rn": pa.int64(), "rnk": pa.int64(),
         "lag_value": pa.float64(), "lead_value": pa.float64(),
         "cum_value": pa.float64(), "cum_max": pa.float64()},
        lambda g: _window_kernel(g, partition_col, order_col, value_col,
                                 tiebreak))


def _rolling_kernel(g: pa.Table, partition_col: str, order_col: str,
                    value_col: str, tiebreak: Optional[str],
                    window: int, round_digits: Optional[int]) -> pa.Table:
    """Rolling-frame aggregates over one hash partition: one lexsort, then a
    single (n × window) clamped-gather — every frame is materialized as one
    masked row, so min/max/sum/avg are pure axis-1 reductions.  Memory is
    O(rows × window) per partition, which is the kernel's contract (see
    rolling_agg); a deque/segment-tree kernel is the integration point for
    very large windows."""
    vcol = g.column(value_col)
    if vcol.null_count:
        raise ValueError(f"rolling_agg: value column {value_col!r} contains "
                         f"{vcol.null_count} null(s) — SQL frames skip nulls, "
                         "this kernel does not; filter or fill them upstream")
    v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
    order, _, new_grp, grp_start = _partition_sort(
        g, partition_col, order_col, tiebreak)
    vs = v[order]
    n = order.shape[0]
    idx = np.arange(n)
    lo = np.maximum(grp_start, idx - window + 1)
    cnt = idx - lo + 1
    cols = lo[:, None] + np.arange(window)[None, :]
    valid = cols <= idx[:, None]
    frame = vs[np.minimum(cols, idx[:, None])]       # clamp: no OOB gather
    rsum = np.where(valid, frame, 0.0).sum(axis=1)
    rmin = np.where(valid, frame, np.inf).min(axis=1)
    rmax = np.where(valid, frame, -np.inf).max(axis=1)
    ravg = rsum / cnt
    if round_digits is not None:
        from .compat import round_half_away
        rsum = round_half_away(rsum, round_digits)
        rmin = round_half_away(rmin, round_digits)
        rmax = round_half_away(rmax, round_digits)
        ravg = round_half_away(ravg, round_digits)
    out = g.take(pa.array(order, type=pa.int64()))
    for name, arr, typ in (("roll_cnt", cnt, pa.int64()),
                           ("roll_sum", rsum, pa.float64()),
                           ("roll_min", rmin, pa.float64()),
                           ("roll_max", rmax, pa.float64()),
                           ("roll_avg", ravg, pa.float64())):
        out = out.append_column(name, pa.array(arr, type=typ))
    return out


def rolling_agg(ds, *, partition_col: str, order_col: str, value_col: str,
                window: int, tiebreak: Optional[str] = None,
                round_digits: Optional[int] = None,
                num_buckets: Optional[int] = None, schema=None):
    """Rolling-frame aggregates — SQL
    ``agg(value) OVER (PARTITION BY key ORDER BY order[, tiebreak]
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` for
    count / sum / min / max / avg, appended as ``roll_cnt`` / ``roll_sum`` /
    ``roll_min`` / ``roll_max`` / ``roll_avg``.

    The moving-average / trailing-window features an event-log or
    time-series pipeline derives per entity (trailing spend, w-event peak,
    smoothed rates).  Complements :func:`window_functions`, which covers the
    unbounded-preceding frames (running totals) and offset functions.

    Shape: identical to window_functions — rows hash-route ONCE to their
    partition key's bucket via the known-partitioner exchange (no sampled
    sort), then one lexsort + one (rows × window) masked gather per bucket
    computes all five aggregates vectorized.  min/max are order-independent
    and float-exact vs any SQL engine; sum/avg reduce ≤ ``window`` doubles
    per row (pass ``round_digits`` to pin SQL-comparable rounding,
    compat.round_half_away semantics).

    Partitioning assumptions (documented per the custom-operator contract):
    all rows of one partition key fit a worker, and per-bucket scratch is
    O(rows × window) — size ``window`` accordingly (≤ ~1024; a monotonic-
    deque kernel is the documented integration point for larger frames).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    return _keyed_window_exchange(
        ds, partition_col, num_buckets, schema,
        {"roll_cnt": pa.int64(), "roll_sum": pa.float64(),
         "roll_min": pa.float64(), "roll_max": pa.float64(),
         "roll_avg": pa.float64()},
        lambda g: _rolling_kernel(g, partition_col, order_col, value_col,
                                  tiebreak, window, round_digits))


def _range_rolling_kernel(g: pa.Table, partition_col: str, ts_col: str,
                          value_col: str, interval_us: int,
                          round_digits: Optional[int]) -> pa.Table:
    """Time-RANGE frame aggregates over one hash partition: per segment,
    frame(i) = rows with ts in [ts_i - interval, ts_i] — peers (equal ts)
    are all included exactly like SQL RANGE frames, so no tiebreak is
    needed and the result is row-order independent.  Two searchsorted
    calls + one cumsum per segment; O(n) scratch."""
    vcol = g.column(value_col)
    if vcol.null_count:
        raise ValueError(f"rolling_range_agg: value column {value_col!r} "
                         f"contains {vcol.null_count} null(s)")
    tcol = g.column(ts_col)
    if pa.types.is_timestamp(tcol.type):
        tcol = tcol.cast(pa.timestamp("us")).cast(pa.int64())
    ts = tcol.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    gcol = g.column(partition_col)
    if pa.types.is_integer(gcol.type):
        garr = gcol.to_numpy(zero_copy_only=False)
    else:
        garr = np.unique(np.asarray(gcol.to_pylist(), dtype=object),
                         return_inverse=True)[1]
    v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((ts, garr))
    gs, tss, vs = garr[order], ts[order], v[order]
    n = order.shape[0]
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = gs[1:] != gs[:-1]
    starts = np.flatnonzero(new_grp)
    ends = np.append(starts[1:], n)
    cnt = np.empty(n, dtype=np.int64)
    rsum = np.empty(n, dtype=np.float64)
    for a, b in zip(starts, ends):          # per KEY segment (not per row)
        seg_ts = tss[a:b]
        cs = np.concatenate(([0.0], np.cumsum(vs[a:b])))
        lo = np.searchsorted(seg_ts, seg_ts - interval_us, side="left")
        hi = np.searchsorted(seg_ts, seg_ts, side="right")
        cnt[a:b] = hi - lo
        rsum[a:b] = cs[hi] - cs[lo]
    ravg = rsum / cnt
    if round_digits is not None:
        from .compat import round_half_away
        rsum = round_half_away(rsum, round_digits)
        ravg = round_half_away(ravg, round_digits)
    out = g.take(pa.array(order, type=pa.int64()))
    for name, arr, typ in (("roll_cnt", cnt, pa.int64()),
                           ("roll_sum", rsum, pa.float64()),
                           ("roll_avg", ravg, pa.float64())):
        out = out.append_column(name, pa.array(arr, type=typ))
    return out


def rolling_range_agg(ds, *, partition_col: str, ts_col: str, value_col: str,
                      interval_us: int, round_digits: Optional[int] = None,
                      num_buckets: Optional[int] = None, schema=None):
    """Trailing time-window aggregates — SQL
    ``agg(value) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    <interval> PRECEDING AND CURRENT ROW)`` for count / sum / avg,
    appended as ``roll_cnt`` / ``roll_sum`` / ``roll_avg``.

    The RANGE-frame complement to :func:`rolling_agg`'s ROWS frames:
    frame(i) holds every row of the key whose timestamp lies in
    ``[ts_i - interval_us, ts_i]``, INCLUDING all peers sharing ts_i (SQL
    peer semantics) — so the result needs no tiebreak and is independent
    of row order among equal timestamps.  Per bucket: one lexsort, then
    two vectorized ``searchsorted`` + one cumsum per key segment — O(n)
    scratch, any interval width (unlike the ROWS kernel's O(n × window)
    gather).  sum/avg reduce through a cumsum difference; pass
    ``round_digits`` (6 in the oracle-checked query) to absorb the ~1e-10
    relative float drift vs an SQL engine's frame summation.

    Partitioning assumption: all rows of one key fit a worker (same
    contract as window_functions / rolling_agg).
    """
    if interval_us < 0:
        raise ValueError(f"interval_us must be >= 0, got {interval_us}")
    return _keyed_window_exchange(
        ds, partition_col, num_buckets, schema,
        {"roll_cnt": pa.int64(), "roll_sum": pa.float64(),
         "roll_avg": pa.float64()},
        lambda g: _range_rolling_kernel(g, partition_col, ts_col, value_col,
                                        interval_us, round_digits))


_AGG_FNS = ("sum", "min", "max", "count", "mean")


def grouped_agg(ds, group_cols, aggs, *, num_buckets: Optional[int] = None,
                round_digits: Optional[int] = None, schema=None):
    """General distributed GROUP BY — the SQL aggregation primitive as
    partial + final combine over the known-partitioner exchange (the same
    shape every internal bucketed combine in this engine uses, exposed as
    one public operator instead of Ray Data's sampled-sort ``groupby``).

    ``aggs`` maps a numeric column to the aggregate functions wanted from
    {sum, min, max, count, mean}; output columns are named ``{fn}_{col}``
    (``count`` is SQL ``count(col)`` — non-null rows).  Per-batch partials
    (one Arrow C-kernel ``group_by`` per batch) shrink each block to its
    distinct groups BEFORE the shuffle, so the exchange carries
    O(groups × batches) partial rows, never the input — hub groups cost
    one row per batch, not their full fan-in.  Final per-partition combine
    folds partials (sum/min/max re-associate; mean = sum/count at the
    end).  Float sums re-associate across batches — pass ``round_digits``
    when comparing against an SQL engine; integer sums are exact.

    Partitioning assumption: distinct groups of one hash bucket fit a
    worker (they are the combine's working set, already reduced).
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    group_cols = list(group_cols)
    norm: dict = {}
    for col, fns in aggs.items():
        fns = (fns,) if isinstance(fns, str) else tuple(fns)
        for f in fns:
            if f not in _AGG_FNS:
                raise ValueError(f"unknown aggregate {f!r} (choose from "
                                 f"{_AGG_FNS})")
        norm[col] = fns
    if not norm:
        raise ValueError("aggs must name at least one column")
    if schema is None:
        schema = ds.schema()  # once — schema() partially executes upstream
    types = {n: _pa_type(t) for n, t in zip(schema.names, schema.types)}
    for col in norm:
        if col not in types:
            raise ValueError(f"aggregate column {col!r} not in schema")

    # partial plan: which (col, kernel) pairs each batch reduces
    need: list = []
    for col, fns in norm.items():
        ks = set()
        for f in fns:
            ks.update(("sum", "count") if f == "mean"
                      else ("count",) if f == "count" else (f,))
        for k in sorted(ks):
            need.append((col, k))

    def _partial(t: pa.Table) -> pa.Table:
        g = t.select(group_cols + sorted({c for c, _ in need}))
        res = g.group_by(group_cols).aggregate(need)
        # arrow names results "{col}_{fn}" — keep as-is (partial cols)
        return res

    if num_buckets is None:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(ds))

    def _bucket(t: pa.Table) -> np.ndarray:
        key = np.zeros(t.num_rows, dtype=np.uint64)
        for c in group_cols:
            key = key * np.uint64(1099511628211) ^ \
                _col_bucket_values(t.column(c), 1 << 62).astype(np.uint64)
        return (key % np.uint64(num_buckets)).astype(np.int64)

    # output schema
    out_fields = [(c, types[c]) for c in group_cols]
    for col, fns in norm.items():
        st = types[col]
        sum_t = pa.int64() if pa.types.is_integer(st) else pa.float64()
        for f in fns:
            out_fields.append((f"{f}_{col}",
                               {"sum": sum_t, "min": st, "max": st,
                                "count": pa.int64(),
                                "mean": pa.float64()}[f]))
    empty = pa.table({n: pa.array([], t) for n, t in out_fields})

    def _final(p: int, g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        refold = [(f"{c}_{k}", "sum" if k in ("sum", "count") else k)
                  for c, k in need]
        f = g.group_by(group_cols).aggregate(refold)
        cols = {c: f.column(c) for c in group_cols}
        for col, fns in norm.items():
            for fn in fns:
                if fn == "mean":
                    s = f.column(f"{col}_sum_sum").to_numpy(
                        zero_copy_only=False).astype(np.float64)
                    n = f.column(f"{col}_count_sum").to_numpy(
                        zero_copy_only=False).astype(np.float64)
                    v = s / n
                elif fn == "count":
                    v = f.column(f"{col}_count_sum").to_numpy(
                        zero_copy_only=False)
                else:
                    v = f.column(f"{col}_{fn}_{'sum' if fn == 'sum' else fn}")\
                        .to_numpy(zero_copy_only=False)
                if round_digits is not None and \
                        np.asarray(v).dtype.kind == "f":
                    from .compat import round_half_away
                    v = round_half_away(v, round_digits)
                typ = dict(out_fields)[f"{fn}_{col}"]
                cols[f"{fn}_{col}"] = pa.array(np.asarray(v)).cast(typ)
        return pa.table(cols).select([n for n, _ in out_fields])

    from ..stages.exchange import exchange
    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange(partial, _bucket, num_buckets, combine=_final)


def distinct(ds, cols, *, num_buckets: Optional[int] = None, schema=None):
    """Distributed ``SELECT DISTINCT`` over one or more columns — per-batch
    Arrow ``group_by`` partials deduplicate each block BEFORE the shuffle
    (the exchange carries at most one row per distinct key per batch), then
    a key-hash exchange lands every candidate of a key in one partition
    where one more group_by finishes the job.  The same partial + final
    shape as :func:`grouped_agg` with no aggregates."""
    if isinstance(cols, str):
        cols = [cols]
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    if schema is None:
        schema = ds.schema()  # once — schema() partially executes upstream
    types = {n: _pa_type(t) for n, t in zip(schema.names, schema.types)}
    for c in cols:
        if c not in types:
            raise ValueError(f"column {c!r} not in schema")
    empty = pa.table({c: pa.array([], types[c]) for c in cols})

    def _partial(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    if num_buckets is None:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(ds))

    def _bucket(t: pa.Table) -> np.ndarray:
        key = np.zeros(t.num_rows, dtype=np.uint64)
        for c in cols:
            key = key * np.uint64(1099511628211) ^ \
                _col_bucket_values(t.column(c), 1 << 62).astype(np.uint64)
        return (key % np.uint64(num_buckets)).astype(np.int64)

    def _final(p: int, g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        return g.group_by(cols).aggregate([]).select(cols)

    from ..stages.exchange import exchange
    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange(partial, _bucket, num_buckets, combine=_final)

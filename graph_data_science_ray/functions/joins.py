"""Join strategies for Ray Data pipelines.

Three tiers (see also pipelines/graph_build.py which uses the broadcast tier for
the corpus IdMap):

  * **broadcast join** — small side published once (``ray.put``), looked up per
    batch (dict / sorted-array ``searchsorted``); no shuffle;
  * **partitioned hash join** — both sides large: tag rows with
    ``hash(key) % B``, union the streams, join per bucket inside
    ``groupby("bucket").map_groups`` (an explicit hash-partitioned join; B sized
    so a bucket pair fits a worker; salt hot keys into sub-buckets);
  * **semi join** — broadcast the key set and filter inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE_COL = "__join_side"
_BUCKET_COL = "__join_bucket"


def _with_bucket(ds, key: str, num_buckets: int, side: int):
    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key)
        if pa.types.is_integer(k.type):
            kv = k.to_numpy(zero_copy_only=False).astype(np.uint64)
            bucket = ((kv * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
                % np.uint64(num_buckets)
        else:
            # Python's str hash is salted PER PROCESS — workers would bucket
            # the same key differently and silently drop matches; crc32 is
            # deterministic across the cluster
            from zlib import crc32
            bucket = np.asarray([crc32(x.encode()) % num_buckets
                                 for x in k.to_pylist()])
        t = t.append_column(_BUCKET_COL, pa.array(bucket.astype(np.int64)))
        return t.append_column(_SIDE_COL, pa.array(
            np.full(t.num_rows, side, dtype=np.int8)))
    return ds.map_batches(tag, batch_format="pyarrow")


def hash_join(left_ds, right_ds, key: str, *, num_buckets: int = 64,
              how: str = "inner", left_schema=None, right_schema=None):
    """Partitioned hash join of two Datasets on ``key``; returns a Dataset with
    left columns + right columns (right's key column dropped).

    Pass ``left_schema``/``right_schema`` (pyarrow.Schema) when known: without
    them ``Dataset.schema()`` partially EXECUTES each side's upstream pipeline
    just to learn the columns — a silent recompute for expensive upstreams."""
    import pyarrow as _pa

    def _pa_type(t):
        # Ray's Dataset.schema() may report numpy/python types for pandas blocks
        if isinstance(t, _pa.DataType):
            return t
        if t is str:
            return _pa.string()
        dt = np.dtype(t)
        if dt.kind in ("U", "S", "O"):  # numpy strings/objects have no direct map
            return _pa.string()
        return _pa.from_numpy_dtype(dt)

    def _names_types(ds, schema):
        if schema is not None:
            return list(schema.names), {n: schema.field(n).type for n in schema.names}
        s = ds.schema()
        return list(s.names), {n: _pa_type(t) for n, t in zip(s.names, s.types)}

    left_cols, ltypes = _names_types(left_ds, left_schema)
    rnames, rtypes = _names_types(right_ds, right_schema)
    right_cols = [c for c in rnames if c != key]
    lt = _with_bucket(left_ds, key, num_buckets, 0)
    rt = _with_bucket(right_ds, key, num_buckets, 1)

    # pad to a common schema for the union — nulls must carry the REAL column
    # type (an untyped null column breaks downstream schema unification), and
    # both sides must emit the SAME column order (schema equality is
    # order-sensitive: mismatched orders make every union block a "different
    # schema" that Ray Data warns about per block)
    union_order = ([key] + [c for c in left_cols if c != key] + right_cols
                   + [_BUCKET_COL, _SIDE_COL])

    def pad(cols_missing, types):
        def f(t: pa.Table) -> pa.Table:
            for c in cols_missing:
                t = t.append_column(
                    pa.field(c, types[c]), _pa.nulls(t.num_rows, type=types[c]))
            return t.select(union_order)
        return f

    lt = lt.map_batches(pad(right_cols, rtypes), batch_format="pyarrow")
    rt = rt.map_batches(pad([c for c in left_cols if c != key], ltypes),
                        batch_format="pyarrow")

    arrow_how = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "outer": "full outer"}[how]

    def join_bucket(g: pa.Table) -> pa.Table:
        # arrow-native per-bucket hash join: typed nulls survive (a pandas
        # merge silently floats int columns that carry the pad nulls)
        side = g.column(_SIDE_COL).to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        l = g.filter(lmask).select([key] + [c for c in left_cols if c != key])
        r = g.filter(pa.compute.invert(lmask)).select([key] + right_cols)
        out = l.join(r, keys=[key], join_type=arrow_how)
        # column order is not guaranteed by Table.join — normalize it
        return out.select([key] + [c for c in left_cols if c != key] + right_cols)

    # bucket ids are already in [0, num_buckets) — route each row straight to
    # its bucket's join task instead of Ray Data's sampled sort groupby
    from ..stages.exchange import grouped_exchange
    return grouped_exchange(lt.union(rt), _BUCKET_COL, num_buckets,
                            join_bucket)


def semi_join_filter(ds, key: str, key_set, *, anti: bool = False):
    """Broadcast semi/anti join: keep rows whose key is (not) in the set."""
    import ray
    arr = np.sort(np.asarray(list(key_set)))
    ref = ray.put(arr)

    class _F:
        def __init__(self):
            self.keys = None
            self.__name__ = "semi_join"

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.keys is None:
                self.keys = ray.get(ref)
            if self.keys.shape[0] == 0:  # empty set: anti ⇒ passthrough, semi ⇒ none
                return t if anti else t.slice(0, 0)
            kv = t.column(key).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, kv)
            pos[pos >= self.keys.shape[0]] = self.keys.shape[0] - 1
            hit = self.keys[pos] == kv
            return t.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(_F(), batch_format="pyarrow")

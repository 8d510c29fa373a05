"""Deterministic hash-based sampling and splitting over a key column.

The 100 TB sampling shape: membership is a pure function of the row's key
(``md5(key || ':' || salt)`` → u64 → range test), so a sample is

  * deterministic — re-running a failed shard reproduces the same subset
    (no RNG state to checkpoint, unlike ``Dataset.random_sample``);
  * partition-independent — the same rows are kept at any block layout,
    cluster size or read order;
  * disjoint-composable — ``hash_split`` fractions carve non-overlapping
    ranges of the same hash, so train/val/test are disjoint BY CONSTRUCTION
    and adding a split later never reshuffles the existing ones;
  * oracle-checkable — the hash equals DuckDB's ``md5_number_lower``
    (little-endian u64 of md5 bytes 8..16, the same family dedup.py's md5
    variants pin), so the exact sample reproduces in SQL.

Reference analogue: the reference's config-seeded sampling surfaces
(RandomGraphGeneratorConfig / splitRelationships seeds) give run-level
determinism; a key-hash membership test is the Ray-Data-native equivalent
that stays stable under distribution.

Per-row md5 over the key string runs as plain map_batches tasks — the same
per-document shape as the text kernels (text.Sha256); at 100 TB the stage is
embarrassingly parallel and column-pruned to the key column + carried
columns.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Sequence

import numpy as np
import pyarrow as pa

_DENOM = 1_000_000  # fraction resolution: 1e-6


def _key_hashes(col: pa.ChunkedArray | pa.Array, salt: str) -> np.ndarray:
    """u64 md5_number_lower(str(key) || ':' || salt) per row (null key → 0,
    which lands in the first split deterministically)."""
    suffix = (":" + salt).encode()
    out = np.empty(len(col), dtype=np.uint64)
    for i, v in enumerate(col.to_pylist()):
        b = ("" if v is None else str(v)).encode() + suffix
        out[i] = int.from_bytes(hashlib.md5(b).digest()[8:], "little")
    return out


def hash_sample(ds, key_col: str, fraction: float, *, salt: str = ""):
    """Keep rows where hash(key) mod 1e6 < fraction·1e6 — a deterministic,
    partition-independent ~``fraction`` sample keyed on ``key_col``.

    SQL-oracle equivalent (DuckDB)::

        WHERE md5_number_lower(CAST(key AS VARCHAR) || ':' || salt)
              % 1000000 < CAST(fraction * 1000000 AS BIGINT)
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = np.uint64(round(fraction * _DENOM))

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hashes(t.column(key_col), salt) % np.uint64(_DENOM)
        return t.filter(pa.array(h < cut))

    return ds.map_batches(_keep, batch_format="pyarrow")


def hash_split(ds, key_col: str, fractions: Dict[str, float], *,
               salt: str = "") -> Dict[str, "object"]:
    """Disjoint named splits (e.g. {"train": .8, "val": .1, "test": .1}):
    split ``name_k`` takes hash range [Σ_{j<k} f_j, Σ_{j≤k} f_j) · 1e6.
    Fractions must sum to ≤ 1; each returned Dataset is an independent
    lazy filter over ``ds`` (shared upstream, no materialization here)."""
    fr = list(fractions.items())
    total = sum(f for _, f in fr)
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bounds = np.cumsum([0.0] + [f for _, f in fr])
    out = {}
    for k, (name, _) in enumerate(fr):
        lo = np.uint64(round(bounds[k] * _DENOM))
        hi = np.uint64(round(bounds[k + 1] * _DENOM))

        def _keep(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            if t.num_rows == 0:
                return t
            h = _key_hashes(t.column(key_col), salt) % np.uint64(_DENOM)
            return t.filter(pa.array((h >= lo) & (h < hi)))

        out[name] = ds.map_batches(_keep, batch_format="pyarrow")
    return out


def sample_sql_predicate(key_expr: str, fraction: float, *,
                         salt: str = "") -> str:
    """The DuckDB WHERE predicate that reproduces ``hash_sample`` exactly —
    used by oracle_sql() and handy for pushing the sample into a SQL engine."""
    cut = int(round(fraction * _DENOM))
    return (f"md5_number_lower(CAST({key_expr} AS VARCHAR) || ':{salt}') "
            f"% {_DENOM} < {cut}")


def upsample_by_weight(ds, group_col: str, weights: Dict[str, int], *,
                       default: int = 1, epoch_col: str = "epoch"):
    """Deterministic data mixing: replicate each row ``weights[group]`` times
    (``default`` for unlisted groups; 0 drops the group), appending
    ``epoch_col`` = 0..rep-1 so replicas are distinguishable downstream
    (per-epoch shuffling salts, loss masking).  This is the domain-weighting
    step of a training mixture ("code ×3, web ×1") as a pure streaming
    map_batches — replication happens inside each batch (``Table.take`` on a
    repeat index), so no shuffle, no driver data, and the row multiset is
    independent of the block layout.  Integer weights keep the operator
    exact and SQL-checkable (``unnest(range(rep))``); for fractional epochs
    compose with hash_sample (e.g. 2.3 epochs = weight 2 union a 0.3
    hash-sample), which stays deterministic end-to-end.
    """
    if any(w < 0 for w in weights.values()) or default < 0:
        raise ValueError("weights must be non-negative integers")

    def _rep(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pylist()
        rep = np.fromiter((weights.get(v, default) for v in g),
                          dtype=np.int64, count=len(g))
        idx = np.repeat(np.arange(len(g), dtype=np.int64), rep)
        out = batch.take(pa.array(idx))
        ends = np.cumsum(rep)
        epoch = np.arange(int(ends[-1]) if len(ends) else 0,
                          dtype=np.int64) - np.repeat(ends - rep, rep)
        return out.append_column(epoch_col, pa.array(epoch))

    return ds.map_batches(_rep, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, group_col: str,
                      fractions: Dict[str, float], *,
                      default: float = 1.0, salt: str = ""):
    """Per-group fractional sampling — the language/domain rebalancing step
    of a training mixture ("keep all en, 25% of de, drop es"): the same
    deterministic md5 membership test as :func:`hash_sample`, but the cut
    is looked up per row from ``group_col`` (``default`` for unlisted
    groups).  Streaming map_batches, no shuffle, partition-layout
    independent; composes with :func:`upsample_by_weight` for weights > 1
    (integer part upsampled, fractional part stratified-sampled).

    SQL-oracle equivalent (DuckDB)::

        WHERE md5_number_lower(CAST(key AS VARCHAR) || ':' || salt) % 1e6
              < CASE grp WHEN 'en' THEN 1000000 WHEN 'de' THEN 250000
                         ELSE <default·1e6> END
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for group {g!r} is {f}, not in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction {default} not in [0, 1]")
    cuts = {g: np.uint64(round(f * _DENOM)) for g, f in fractions.items()}
    default_cut = np.uint64(round(default * _DENOM))

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hashes(t.column(key_col), salt) % np.uint64(_DENOM)
        # dictionary-encode the group column: one cut lookup per DISTINCT
        # group in the batch, then a vectorized gather over the indices
        enc = t.column(group_col).combine_chunks().dictionary_encode()
        import pyarrow.compute as pc
        uniq_cuts = np.array(
            [cuts.get(v, default_cut) for v in enc.dictionary.to_pylist()]
            + [default_cut],  # sentinel slot for null groups
            dtype=np.uint64)
        idx = pc.fill_null(enc.indices, len(uniq_cuts) - 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(h < uniq_cuts[idx]))

    return ds.map_batches(_keep, batch_format="pyarrow")


def shard_shuffle(ds, key_col: str, num_shards: int, *, salt: str = "",
                  shard_col: str = "shard", pos_col: str = "pos"):
    """Deterministic global shuffle + sharding — the final packing step of a
    training-data pipeline: row → shard ``md5(key||':'||salt) % P``, ordered
    within the shard by a SECOND md5 (``salt + '#pos'``) with the key as
    tiebreak.  The (shard, pos) layout is a pure function of the keys: it is
    independent of input partitioning, reproducible across reruns and
    cluster sizes (unlike ``Dataset.random_shuffle``), and resumable —
    compose with ``sources.sink.write_partitioned_parquet`` keyed on
    ``shard`` to land one file per shard.

    Shape: one streaming hash pass adds the shard + order keys, ONE
    known-partitioner exchange routes rows to their shard's combine, and the
    per-shard combine is a local sort (shards are corpus/P ≈ worker-sized by
    construction).  SQL oracle: ``shard = md5_number_lower(...) % P``;
    ``pos = row_number() OVER (PARTITION BY shard ORDER BY md5_2, key) - 1``.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import exchange

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")

    def _tag(t: pa.Table) -> pa.Table:
        h = _key_hashes(t.column(key_col), salt)
        h2 = _key_hashes(t.column(key_col), salt + "#pos")
        t = t.append_column(shard_col, pa.array(
            (h % np.uint64(num_shards)).astype(np.int64)))
        return t.append_column("_ord", pa.array(h2, pa.uint64()))

    def _combine(p: int, t: pa.Table) -> pa.Table:
        order = np.lexsort((t.column(key_col).to_numpy(zero_copy_only=False),
                            t.column("_ord").to_numpy(zero_copy_only=False)))
        t = t.take(pa.array(order)).drop_columns(["_ord"])
        return t.append_column(pos_col, pa.array(
            np.arange(t.num_rows, dtype=np.int64)))

    tagged = ds.map_batches(_tag, batch_format="pyarrow")

    def _part(t: pa.Table) -> np.ndarray:
        return t.column(shard_col).to_numpy(zero_copy_only=False)

    return exchange(tagged, _part, num_shards, combine=_combine)


def sample_n_per_group(ds, key_col: str, group_col: str, n: int, *,
                       salt: str = "", num_buckets=None, schema=None):
    """Exactly ``min(n, group_size)`` rows per group, selected by
    deterministic md5 order — the fixed-QUOTA mixture-sampling step
    ("exactly 100k docs per language"), complementing
    :func:`stratified_sample`'s fixed-FRACTION cut.

    Each row gets rank ``md5(str(key) || ':' || salt) >> 16`` (48 bits —
    exactly float64-representable, so the grouped top-k kernel's float
    order column cannot corrupt it; the 2^-48 collisions fall to the
    ``key_col`` tiebreak identically in the engine and any SQL oracle),
    and the n smallest ranks per group win via
    :func:`~graph_data_science_ray.functions.relational.top_k_per_group`
    — per-batch partials then one group-hash exchange of O(groups·n) rows,
    never the input.  Partition-layout independent, re-runnable, and
    SQL-reproducible::

        row_number() OVER (PARTITION BY grp
                           ORDER BY md5_number_lower(CAST(key AS VARCHAR)
                                    || ':' || salt) >> 16, key) <= n
    """
    from .relational import top_k_per_group

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    RANK = "__smp_rank"

    def _rank(t: pa.Table) -> pa.Table:
        h = _key_hashes(t.column(key_col), salt) >> np.uint64(16)
        return t.append_column(RANK, pa.array(h.astype(np.int64)))

    ranked = ds.map_batches(_rank, batch_format="pyarrow")
    out = top_k_per_group(ranked, group_col, RANK, n, largest=False,
                          tiebreak=key_col, num_buckets=num_buckets,
                          schema=schema)

    def _drop(t: pa.Table) -> pa.Table:
        return t.drop_columns([RANK]) if RANK in t.column_names else t

    return out.map_batches(_drop, batch_format="pyarrow")

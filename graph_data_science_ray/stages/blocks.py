"""Block hygiene for ``Dataset.to_arrow_refs()`` consumers.

When a ``groupby`` has more reduce partitions than distinct keys, Ray Data
emits the empty reduce partitions as ZERO-COLUMN (schema-less) blocks
("Operator produced a RefBundle with a different schema ... new schema: .").
Whether one of those blocks lands first in ``to_arrow_refs()`` is a
scheduling roll of the dice, so any consumer that maps ``t.column(...)``
over every ref crashes nondeterministically — the exact failure that took
down the round-4 driver bench (``KeyError: 'Field "key" does not exist in
schema'`` at graph_build._assign_dense_ids).

These helpers drop empty/zero-column blocks with metadata-only remote
probes: the driver holds two ints per block, never block data, so they are
safe at any scale.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyarrow as pa

_SHAPE_FN = None


def _shape_fn():
    global _SHAPE_FN
    if _SHAPE_FN is None:
        import ray

        @ray.remote(num_cpus=0)
        def _shape(t) -> Tuple[int, int]:
            if isinstance(t, pa.Table):
                return (t.num_rows, t.num_columns)
            # pandas block (upstream pandas-typed stage)
            return (len(t), len(t.columns))

        _SHAPE_FN = _shape
    return _SHAPE_FN


def _metadata_row_counts(ds) -> Optional[List[int]]:
    """Per-block row counts straight from Ray Data's block metadata —
    zero remote calls.  Only safe on a MaterializedDataset (on a lazy one
    ``iter_internal_ref_bundles`` would re-execute the plan after
    ``to_arrow_refs`` already did).  Returns None when any count is
    unknown so the caller falls back to remote probes."""
    import ray.data

    if not isinstance(ds, ray.data.dataset.MaterializedDataset):
        return None
    try:
        counts: List[int] = []
        for b in ds.iter_internal_ref_bundles():
            for _, md in b.blocks:
                if md.num_rows is None:
                    return None
                counts.append(int(md.num_rows))
        return counts
    except Exception:
        return None


def metadata_total_bytes(ds) -> Optional[int]:
    """Total size_bytes across a MaterializedDataset's blocks from metadata
    (zero remote calls), or None when unknown/unavailable."""
    import ray.data

    if not isinstance(ds, ray.data.dataset.MaterializedDataset):
        return None
    try:
        total = 0
        for b in ds.iter_internal_ref_bundles():
            for _, md in b.blocks:
                if md.size_bytes is None:
                    return None
                total += int(md.size_bytes)
        return total
    except Exception:
        return None


def nonempty_arrow_refs(ds) -> Tuple[List, List[int]]:
    """``(refs, row_counts)`` for the dataset's blocks, with zero-row and
    zero-column (schema-less empty groupby partition) blocks dropped.
    Metadata-only: block num_rows comes from Ray Data's own BlockMetadata
    when the dataset is materialized (no remote calls at all); otherwise a
    num_cpus=0 probe per block — either way the driver sees two ints per
    block, never block data.  A zero-column block is always zero-row, so
    filtering on rows alone is sufficient in the metadata path.

    Lazy inputs are materialized FIRST: ``to_arrow_refs()`` on a lazy
    dataset runs the pipeline AND a second ``Limit[1]`` schema-fetch
    execution, whose in-flight task cancellation can strike a Ray-core race
    (task_manager.cc "Tried to complete task that was not pending" —
    observed twice on this VM under load); materializing gives one
    execution, metadata-only schema, and the metadata row-count fast path."""
    import ray
    import ray.data

    if not isinstance(ds, ray.data.dataset.MaterializedDataset):
        ds = ds.materialize()
    refs = list(ds.to_arrow_refs())
    meta_counts = _metadata_row_counts(ds)
    if meta_counts is not None and len(meta_counts) == len(refs):
        keep = [(r, n) for r, n in zip(refs, meta_counts) if n > 0]
        return [r for r, _ in keep], [n for _, n in keep]
    shape = _shape_fn()
    shapes = ray.get([shape.remote(r) for r in refs])
    keep2: List = []
    counts: List[int] = []
    for r, (nr, nc) in zip(refs, shapes):
        if nr > 0 and nc > 0:
            keep2.append(r)
            counts.append(int(nr))
    return keep2, counts


def concat_nonempty(ds, empty_schema: Optional[pa.Schema] = None) -> pa.Table:
    """Concatenate a SMALL dataset's blocks into one driver-side table,
    skipping schema-less empties.  Only for results known to be small
    (vertex maps, aggregates) — never a data-scale table.  ``empty_schema``
    is returned as an empty table when every block is empty."""
    import ray

    refs, _ = nonempty_arrow_refs(ds)
    tabs = []
    for r in refs:
        t = ray.get(r)
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        tabs.append(t)
    if not tabs:
        if empty_schema is None:
            raise ValueError("dataset produced no non-empty blocks and no "
                             "empty_schema fallback was given")
        return empty_schema.empty_table()
    # permissive like the exchange combine path: union branches may carry
    # width-variant column types (int32 vs int64) across blocks
    return pa.concat_tables(tabs, promote_options="permissive")

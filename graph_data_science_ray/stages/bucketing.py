"""Adaptive hash-bucket sizing for the bucketed-combine pattern.

The repo's answer to Ray Data's slow multi-key sort-aggregate is
``groupby(bucket).map_groups(vectorized_combine)`` with a small hash-bucket
key (measured 10-40x wins, NOTES_r02).  A FIXED bucket count is a scale
hazard: each group task holds |rows|/B, so B must grow with the input
(round-2 VERDICT "What's wrong" #5).  Every site now derives B here:
``max(min_buckets, ceil(est_rows / target_rows_per_bucket))``, clamped.

``rows_if_cheap`` reads the Dataset's metadata row count (parquet
statistics, materialized block metadata) WITHOUT executing the pipeline and
returns None when the count would require execution — callers fall back to
``min_buckets`` (the round-2 behavior) or a caller-side estimate.
"""

from __future__ import annotations

from typing import Optional


def rows_if_cheap(ds) -> Optional[int]:
    """Row count from plan metadata only; None if it would need execution."""
    try:
        c = ds._meta_count()
        return int(c) if c is not None else None
    except Exception:
        return None


def adaptive_bucket_count(est_rows: Optional[int], *,
                          target_rows_per_bucket: int = 2_000_000,
                          min_buckets: int = 64,
                          max_buckets: int = 1 << 16) -> int:
    """Bucket count so one group task holds ~target_rows_per_bucket rows."""
    if est_rows is None or est_rows <= 0:
        return min_buckets
    need = -(-int(est_rows) // int(target_rows_per_bucket))  # ceil
    return max(min_buckets, min(max_buckets, need))

"""Pairwise vector-similarity user functions (gds.alpha.similarity.*).

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/similarity/
SimilaritiesFunc.java (the six @UserFunction entry points) with kernels from
core/src/main/java/org/neo4j/gds/core/utils/Intersections.java.

Java semantics preserved exactly:
  * cosine   = sqrt(dot² / ‖a‖² / ‖b‖²)  — NOTE the reference takes the square
    root of the SQUARE, so anti-parallel vectors score +1, not -1
    (SimilaritiesFunc.java:73 sqrt(Intersections.cosineSquare)); zero-norm → 0.
  * euclideanDistance = sqrt(Σ(aᵢ-bᵢ)²); euclidean = 1/(1+distance).
  * pearson  = mean-centered correlation, NaN → 0 (Intersections.java:157-182).
  * jaccard  = MULTISET intersection/union with duplicate support
    (SimilaritiesFunc.java jaccard: sorted two-pointer walk; union == 0 → 1;
    null inputs → 0).
  * overlap  = |set(a) ∩ set(b)| / min(len(a), len(b)) — intersection is
    DEDUPLICATED but the denominator keeps raw list lengths
    (SimilaritiesFunc.java overlapSimilarity); null inputs → 0, min len 0 → 0.
  * cosine / euclidean / pearson require equal-length non-empty vectors
    (the reference throws).

Values are compared as float64 — int64 identifiers above 2^53 lose exactness
in the categorical kernels (the Java reference compares boxed Numbers); list
ids that large belong in the dedup/nodesim pipelines, not these functions.

Two surfaces: scalar functions mirroring the Cypher signature, and a
vectorized batch kernel (`pairwise_scores`) for two ``list<float>`` columns —
segment sums via ``np.add.reduceat`` over the Arrow list offsets, no per-row
Python in the numeric paths (the deployment shape: ``add_pairwise_similarity``
maps it over a Dataset).  The multiset jaccard/overlap kernels aggregate
(row, value) pair counts with one lexsort per side — also loop-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NUMERIC = ("cosine", "euclidean", "euclidean_distance", "pearson")
_CATEGORICAL = ("jaccard", "overlap")


# --------------------------------------------------------------------------------
# scalar forms (the Cypher user-function signatures)
# --------------------------------------------------------------------------------

def _check_numeric(v1, v2):
    a = np.asarray(v1, dtype=np.float64)
    b = np.asarray(v2, dtype=np.float64)
    if a.shape[0] != b.shape[0] or a.shape[0] == 0:
        raise ValueError("Vectors must be non-empty and of the same size")
    return a, b


def similarity_cosine(v1, v2) -> float:
    a, b = _check_numeric(v1, v2)
    x, y, dot = float(a @ a), float(b @ b), float(a @ b)
    if x == 0.0 or y == 0.0:
        return 0.0
    return float(np.sqrt(dot * dot / x / y))


def similarity_euclidean_distance(v1, v2) -> float:
    a, b = _check_numeric(v1, v2)
    return float(np.sqrt(((a - b) ** 2).sum()))


def similarity_euclidean(v1, v2) -> float:
    return 1.0 / (1.0 + similarity_euclidean_distance(v1, v2))


def similarity_pearson(v1, v2, *, vector_type: str = "numbers") -> float:
    """``vector_type="maps"`` takes two sparse vectors as lists of
    {"category": id, "weight": w} maps (the ``asVector`` shape) and runs the
    reference's skip-aware pearson: union of category ids, a missing entry is
    the NaN skip value, each vector's mean is over ITS OWN present entries,
    and the correlation sums keep only pairs where BOTH sides are present
    (SimilaritiesFunc.java:86-117 → Intersections.pearsonSkip:184-227)."""
    if vector_type.lower() == "maps":
        return _pearson_skip_maps(v1, v2)
    a, b = _check_numeric(v1, v2)
    da, db = a - a.mean(), b - b.mean()
    denom = np.sqrt((da @ da) * (db @ db))
    if denom == 0.0:
        return 0.0  # NaN → 0 (Intersections.java:181)
    return float((da @ db) / denom)


def as_vector(categories, weights) -> list:
    """gds.alpha.similarity.asVector analogue
    (alpha/.../impl/similarity/SimilarityVectorAggregator.java): zip a
    category-id column and a weight column into the [{"category": id,
    "weight": w}, ...] shape the maps vectorType consumes."""
    return [{"category": int(c), "weight": float(w)}
            for c, w in zip(categories, weights)]


def _pearson_skip_maps(v1, v2) -> float:
    # later duplicate categories overwrite earlier ones (LongDoubleHashMap.put)
    m1 = {int(e["category"]): float(e["weight"]) for e in v1}
    m2 = {int(e["category"]): float(e["weight"]) for e in v2}
    ids = list(m1.keys() | m2.keys())
    w1 = np.asarray([m1.get(i, np.nan) for i in ids], dtype=np.float64)
    w2 = np.asarray([m2.get(i, np.nan) for i in ids], dtype=np.float64)
    p1, p2 = ~np.isnan(w1), ~np.isnan(w2)
    # per-vector means over each side's own present entries (pearsonSkip's
    # first loop); an all-skip side yields NaN → result NaN → 0
    with np.errstate(invalid="ignore", divide="ignore"):
        mean1 = w1[p1].sum() / p1.sum() if p1.any() else np.nan
        mean2 = w2[p2].sum() / p2.sum() if p2.any() else np.nan
        both = p1 & p2
        d1, d2 = w1[both] - mean1, w2[both] - mean2
        r = float(d1 @ d2) / np.sqrt(float(d1 @ d1) * float(d2 @ d2)) \
            if both.any() else np.nan
    return 0.0 if np.isnan(r) else float(r)


def similarity_jaccard(v1, v2) -> float:
    if v1 is None or v2 is None:
        return 0.0
    a = np.sort(np.asarray([x for x in v1 if x is not None], dtype=np.float64))
    b = np.sort(np.asarray([x for x in v2 if x is not None], dtype=np.float64))
    inter = _multiset_intersection(a, b)
    union = a.shape[0] + b.shape[0] - inter
    return 1.0 if union == 0 else inter / union


def similarity_overlap(v1, v2) -> float:
    if v1 is None or v2 is None:
        return 0.0
    a = np.asarray([x for x in v1 if x is not None], dtype=np.float64)
    b = np.asarray([x for x in v2 if x is not None], dtype=np.float64)
    denom = min(len(v1), len(v2))
    if denom == 0:
        return 0.0
    inter = np.intersect1d(a, b).shape[0]  # set semantics (HashSet.retainAll)
    return inter / denom


def _multiset_intersection(a_sorted: np.ndarray, b_sorted: np.ndarray) -> int:
    """Σ_v min(count_a(v), count_b(v)) — the reference's two-pointer walk."""
    if a_sorted.shape[0] == 0 or b_sorted.shape[0] == 0:
        return 0
    va, ca = np.unique(a_sorted, return_counts=True)
    vb, cb = np.unique(b_sorted, return_counts=True)
    pos = np.searchsorted(va, vb)
    ok = pos < va.shape[0]
    ok[ok] &= va[pos[ok]] == vb[ok]
    return int(np.minimum(ca[pos[ok]], cb[ok]).sum())


# --------------------------------------------------------------------------------
# vectorized batch kernel over two list<float> columns
# --------------------------------------------------------------------------------

def _flat(col):
    """(values: float64[], offsets: int64[]) of a list column (chunk-merged).

    Handles SLICED arrays: a sliced ListArray's offsets are absolute positions
    into the parent values buffer, so the values are cut to [offsets[0],
    offsets[-1]) and the offsets rebased to 0 — otherwise the last row's
    reduceat segment would run to the end of the parent buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64,
                                                              copy=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if offsets.shape[0] and (offsets[0] != 0
                             or offsets[-1] != values.shape[0]):
        values = values[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    return values, offsets


def _pair_counts(rows: np.ndarray, vals: np.ndarray):
    """Aggregate (row, value) → count; returns row/value/count sorted."""
    if rows.shape[0] == 0:
        return rows, vals, rows
    order = np.lexsort((vals, rows))
    r, v = rows[order], vals[order]
    new = np.empty(r.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, r.shape[0]))
    return r[starts], v[starts], cnt


def _per_row_set_min_intersection(n, r1, v1, c1, r2, v2, c2, *, set_mode: bool):
    """Per-row Σ min(c1, c2) (multiset) or matched-distinct count (set) of two
    already (row, value)-aggregated sides, vectorized by one joint lexsort."""
    side = np.concatenate((np.zeros(r1.shape[0], dtype=np.int8),
                           np.ones(r2.shape[0], dtype=np.int8)))
    rows = np.concatenate((r1, r2))
    vals = np.concatenate((v1, v2))
    cnts = np.concatenate((c1, c2))
    order = np.lexsort((side, vals, rows))
    rows, vals, cnts = rows[order], vals[order], cnts[order]
    if rows.shape[0] < 2:
        return np.zeros(n, dtype=np.float64)
    match = (rows[1:] == rows[:-1]) & (vals[1:] == vals[:-1])
    contrib = (np.minimum(cnts[1:], cnts[:-1])[match] if not set_mode
               else np.ones(int(match.sum())))
    out = np.zeros(n, dtype=np.float64)
    np.add.at(out, rows[1:][match], contrib)
    return out


def pairwise_scores(col1, col2, method: str = "cosine") -> np.ndarray:
    """Row-wise similarity of two list columns (Arrow list arrays)."""
    v1, o1 = _flat(col1)
    v2, o2 = _flat(col2)
    n = o1.shape[0] - 1
    len1, len2 = np.diff(o1), np.diff(o2)
    if method in _NUMERIC:
        if not np.array_equal(len1, len2) or (len1 == 0).any():
            raise ValueError("Vectors must be non-empty and of the same size")
        seg = o1[:-1]
        if method == "pearson":
            sums1 = np.add.reduceat(v1, seg)
            sums2 = np.add.reduceat(v2, seg)
            v1 = v1 - np.repeat(sums1 / len1, len1)
            v2 = v2 - np.repeat(sums2 / len2, len2)
        if method in ("euclidean", "euclidean_distance"):
            d2 = np.add.reduceat((v1 - v2) ** 2, seg)
            dist = np.sqrt(d2)
            return dist if method == "euclidean_distance" else 1.0 / (1.0 + dist)
        dot = np.add.reduceat(v1 * v2, seg)
        x = np.add.reduceat(v1 * v1, seg)
        y = np.add.reduceat(v2 * v2, seg)
        if method == "cosine":
            out = np.zeros(n)
            ok = (x != 0) & (y != 0)
            out[ok] = np.sqrt(dot[ok] * dot[ok] / x[ok] / y[ok])
            return out
        # pearson on centered values
        out = np.zeros(n)
        denom = np.sqrt(x * y)
        ok = denom != 0
        out[ok] = dot[ok] / denom[ok]
        return out
    if method not in _CATEGORICAL:
        raise ValueError(f"unknown method {method!r}")
    rows1 = np.repeat(np.arange(n, dtype=np.int64), len1)
    rows2 = np.repeat(np.arange(n, dtype=np.int64), len2)
    # null ELEMENTS arrive as NaN after the float64 conversion — strip them
    # like the scalar forms do (jaccard counts null-filtered lengths; overlap
    # keeps RAW lengths in its denominator, matching similarity_overlap)
    keep1, keep2 = ~np.isnan(v1), ~np.isnan(v2)
    rows1f, v1f = rows1[keep1], v1[keep1]
    rows2f, v2f = rows2[keep2], v2[keep2]
    flen1 = np.bincount(rows1f, minlength=n)
    flen2 = np.bincount(rows2f, minlength=n)
    r1, u1, c1 = _pair_counts(rows1f, v1f)
    r2, u2, c2 = _pair_counts(rows2f, v2f)
    # null ROWS score 0 (the scalar forms return 0 for a null vector)
    null_rows = _null_row_mask(col1, n) | _null_row_mask(col2, n)
    if method == "jaccard":
        inter = _per_row_set_min_intersection(n, r1, u1, c1, r2, u2, c2,
                                              set_mode=False)
        union = flen1 + flen2 - inter
        out = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    else:
        inter = _per_row_set_min_intersection(n, r1, u1, c1, r2, u2, c2,
                                              set_mode=True)
        denom = np.minimum(len1, len2)
        out = np.where(denom == 0, 0.0, inter / np.maximum(denom, 1))
    out[null_rows] = 0.0
    return out


def _null_row_mask(col, n: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0:
        return np.zeros(n, dtype=bool)
    return np.asarray(col.is_null())


def add_pairwise_similarity(ds, col1: str, col2: str, *,
                            method: str = "cosine", out_col: str = "score"):
    """Dataset form: append the row-wise similarity of two list columns —
    a streaming map_batches, the deployment shape of the user functions."""
    def _batch(t: pa.Table) -> pa.Table:
        scores = pairwise_scores(t.column(col1), t.column(col2), method)
        return t.append_column(out_col, pa.array(scores, type=pa.float64()))
    return ds.map_batches(_batch, batch_format="pyarrow")

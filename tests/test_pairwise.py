"""gds.alpha.similarity.* user functions (SimilaritiesFunc.java semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.functions.pairwise import (
    add_pairwise_similarity, pairwise_scores, similarity_cosine,
    similarity_euclidean, similarity_euclidean_distance, similarity_jaccard,
    similarity_overlap, similarity_pearson, as_vector)


class TestScalarSemantics:
    def test_cosine_known(self):
        # hand-computed: dot=32, |a|²=14, |b|²=77 → sqrt(32²/14/77)
        assert similarity_cosine([1, 2, 3], [4, 5, 6]) == pytest.approx(
            np.sqrt(32 * 32 / 14 / 77))

    def test_cosine_antiparallel_is_positive(self):
        """Java quirk: sqrt(cosineSquare) — anti-parallel scores +1, not -1
        (SimilaritiesFunc.java:73)."""
        assert similarity_cosine([1, 2], [-1, -2]) == pytest.approx(1.0)

    def test_cosine_zero_norm(self):
        assert similarity_cosine([0, 0], [1, 2]) == 0.0

    def test_cosine_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            similarity_cosine([1, 2], [1])
        with pytest.raises(ValueError):
            similarity_cosine([], [])

    def test_euclidean(self):
        d = similarity_euclidean_distance([1, 2], [4, 6])
        assert d == pytest.approx(5.0)
        assert similarity_euclidean([1, 2], [4, 6]) == pytest.approx(1 / 6)

    def test_pearson_exact_and_nan_to_zero(self):
        assert similarity_pearson([1, 2, 3], [2, 4, 6]) == pytest.approx(1.0)
        assert similarity_pearson([1, 2, 3], [3, 2, 1]) == pytest.approx(-1.0)
        # constant vector → zero variance → NaN → 0 (Intersections.java:181)
        assert similarity_pearson([1, 1, 1], [1, 2, 3]) == 0.0

    def test_jaccard_multiset(self):
        """Duplicate support (SimilaritiesFunc.java jaccard two-pointer walk):
        [1,1,2] vs [1,2] → intersection 2, union 3."""
        assert similarity_jaccard([1, 1, 2], [1, 2]) == pytest.approx(2 / 3)

    def test_jaccard_empty_union_is_one(self):
        assert similarity_jaccard([], []) == 1.0

    def test_jaccard_null_vector_is_zero(self):
        assert similarity_jaccard(None, [1]) == 0.0

    def test_overlap_set_numerator_raw_denominator(self):
        """Intersection is DEDUPED (HashSet) but min() uses raw lengths:
        [1,1,2] vs [1,2,3] → |{1,2}| / min(3,3) = 2/3."""
        assert similarity_overlap([1, 1, 2], [1, 2, 3]) == pytest.approx(2 / 3)
        assert similarity_overlap([], [1]) == 0.0
        assert similarity_overlap(None, [1]) == 0.0


class TestBatchKernel:
    def _rand_lists(self, rng, n, fixed_len=None, ints=False):
        out = []
        for _ in range(n):
            ln = fixed_len if fixed_len else int(rng.integers(1, 9))
            v = rng.integers(0, 5, ln).tolist() if ints \
                else rng.normal(size=ln).round(3).tolist()
            out.append(v)
        return out

    @pytest.mark.parametrize("method,scalar", [
        ("cosine", similarity_cosine),
        ("euclidean", similarity_euclidean),
        ("euclidean_distance", similarity_euclidean_distance),
        ("pearson", similarity_pearson)])
    def test_numeric_matches_scalar(self, method, scalar):
        rng = np.random.default_rng(5)
        a = self._rand_lists(rng, 64, fixed_len=None)
        b = [rng.normal(size=len(v)).round(3).tolist() for v in a]
        got = pairwise_scores(pa.array(a), pa.array(b), method)
        exp = np.array([scalar(x, y) for x, y in zip(a, b)])
        np.testing.assert_allclose(got, exp, atol=1e-12)

    @pytest.mark.parametrize("method,scalar", [
        ("jaccard", similarity_jaccard),
        ("overlap", similarity_overlap)])
    def test_categorical_matches_scalar(self, method, scalar):
        rng = np.random.default_rng(6)
        a = self._rand_lists(rng, 80, ints=True)
        b = self._rand_lists(rng, 80, ints=True)
        got = pairwise_scores(pa.array(a, type=pa.list_(pa.float64())),
                              pa.array(b, type=pa.list_(pa.float64())), method)
        exp = np.array([scalar(x, y) for x, y in zip(a, b)])
        np.testing.assert_allclose(got, exp, atol=1e-12)

    def test_numeric_ragged_raises(self):
        with pytest.raises(ValueError):
            pairwise_scores(pa.array([[1.0, 2.0]]), pa.array([[1.0]]), "cosine")

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            pairwise_scores(pa.array([[1.0]]), pa.array([[1.0]]), "nope")

    @pytest.mark.parametrize("method", ["cosine", "euclidean",
                                        "euclidean_distance", "pearson",
                                        "jaccard", "overlap"])
    def test_empty_batch(self, method):
        """Ray Data can feed zero-row batches — every kernel returns (0,)."""
        empty = pa.array([], type=pa.list_(pa.float64()))
        out = pairwise_scores(empty, empty, method)
        assert out.shape == (0,)

    @pytest.mark.parametrize("method", ["cosine", "euclidean_distance",
                                        "pearson", "jaccard", "overlap"])
    def test_sliced_arrays(self, method):
        """Sliced ListArrays carry absolute offsets into the parent values
        buffer — the kernel must rebase them (regression: last row of a
        head-slice silently read beyond its segment)."""
        a = pa.array([[1.0, 0.0], [0.0, 1.0], [9.0, 9.0]])
        b = pa.array([[1.0, 0.0], [1.0, 0.0], [9.0, 9.0]])
        full = pairwise_scores(a, b, method)
        head = pairwise_scores(a.slice(0, 2), b.slice(0, 2), method)
        tail = pairwise_scores(a.slice(1), b.slice(1), method)
        np.testing.assert_allclose(head, full[:2], atol=1e-12)
        np.testing.assert_allclose(tail, full[1:], atol=1e-12)

    def test_null_elements_match_scalar(self):
        """Null list ELEMENTS are stripped like the scalar forms: jaccard
        counts filtered lengths, overlap keeps raw-length denominators."""
        a = pa.array([[1.0, None], [1.0, 2.0, None]],
                     type=pa.list_(pa.float64()))
        b = pa.array([[1.0], [1.0, 3.0]], type=pa.list_(pa.float64()))
        j = pairwise_scores(a, b, "jaccard")
        np.testing.assert_allclose(
            j, [similarity_jaccard([1, None], [1]),
                similarity_jaccard([1, 2, None], [1, 3])], atol=1e-12)
        o = pairwise_scores(a, b, "overlap")
        np.testing.assert_allclose(
            o, [similarity_overlap([1, None], [1]),
                similarity_overlap([1, 2, None], [1, 3])], atol=1e-12)

    def test_null_rows_score_zero(self):
        a = pa.array([None, [1.0]], type=pa.list_(pa.float64()))
        b = pa.array([[1.0], [1.0]], type=pa.list_(pa.float64()))
        assert pairwise_scores(a, b, "jaccard").tolist() == [0.0, 1.0]
        assert pairwise_scores(a, b, "overlap").tolist() == [0.0, 1.0]


@pytest.mark.usefixtures("ray_session")
class TestDatasetForm:
    def test_add_pairwise_similarity(self):
        import ray.data
        t = pa.table({"id": [0, 1],
                      "e1": [[1.0, 2.0], [1.0, 0.0]],
                      "e2": [[4.0, 5.0], [0.0, 3.0]]})
        ds = add_pairwise_similarity(ray.data.from_arrow(t), "e1", "e2",
                                     method="cosine", out_col="cos")
        out = ds.to_pandas().sort_values("id")
        assert out["cos"].iloc[0] == pytest.approx(
            similarity_cosine([1, 2], [4, 5]))
        assert out["cos"].iloc[1] == 0.0  # orthogonal


class TestPearsonMaps:
    """vectorType 'maps' — the sparse asVector form.  Fixture and all four
    expected values verbatim from the reference's PearsonDocTest
    (alpha-proc/.../similarity/PearsonDocTest.java:90-132): 5 people rating
    6 movies, pearson of Arya's vector against every other person."""

    # movie ids: home_alone=0 matrix=1 good_men=2 top_gun=3 jerry=4 gruffalo=5
    RATINGS = {
        "zhen":     as_vector([0, 2, 1, 4], [2, 2, 3, 6]),
        "praveena": as_vector([0, 2, 1, 4], [6, 7, 8, 9]),
        "michael":  as_vector([0, 2, 4, 3], [7, 9, 3, 4]),
        "arya":     as_vector([3, 1, 4, 5], [8, 1, 10, 10]),
        "karin":    as_vector([3, 1, 0, 5], [9, 7, 7, 9]),
    }

    EXPECTED = {  # PearsonDocTest.functionCallOnWholeGraph expected table
        "karin": 0.8194651785206903,
        "zhen": 0.4839533792540704,
        "praveena": 0.09262336892949784,
        "michael": -0.9551953674747637,
    }

    def test_doc_fixture_exact(self):
        arya = self.RATINGS["arya"]
        for other, expected in self.EXPECTED.items():
            got = similarity_pearson(arya, self.RATINGS[other],
                                     vector_type="maps")
            assert got == pytest.approx(expected, abs=1e-15), other

    def test_symmetric(self):
        a, k = self.RATINGS["arya"], self.RATINGS["karin"]
        assert similarity_pearson(a, k, vector_type="maps") == \
            pytest.approx(similarity_pearson(k, a, vector_type="maps"))

    def test_full_overlap_matches_numbers_form(self):
        v1 = as_vector([0, 1, 2], [1.0, 2.0, 4.0])
        v2 = as_vector([0, 1, 2], [2.0, 5.0, 3.0])
        assert similarity_pearson(v1, v2, vector_type="maps") == \
            pytest.approx(similarity_pearson([1, 2, 4], [2, 5, 3]))

    def test_no_common_categories_is_zero(self):
        v1 = as_vector([0, 1], [1.0, 2.0])
        v2 = as_vector([2, 3], [3.0, 4.0])
        assert similarity_pearson(v1, v2, vector_type="maps") == 0.0

    def test_empty_side_is_zero(self):
        v1 = as_vector([0, 1], [1.0, 2.0])
        assert similarity_pearson(v1, [], vector_type="maps") == 0.0

    def test_duplicate_category_last_wins(self):
        # LongDoubleHashMap.put overwrites — the LAST weight for a category
        v1 = as_vector([0, 0, 1], [9.0, 1.0, 2.0])
        v1_dedup = as_vector([0, 1], [1.0, 2.0])
        v2 = as_vector([0, 1], [3.0, 5.0])
        assert similarity_pearson(v1, v2, vector_type="maps") == \
            similarity_pearson(v1_dedup, v2, vector_type="maps")

    def test_as_vector_shape(self):
        v = as_vector([7, 8], [0.5, 1.5])
        assert v == [{"category": 7, "weight": 0.5},
                     {"category": 8, "weight": 1.5}]

"""Data-pipeline operator semantics: dedup (exact/minhash/simhash), similarity
(brute-force + LSH), text analysis, multimodal plumbing, scalers."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": rows,
    }))


class TestExactDedup:
    def test_keeps_min_id(self):
        from graph_data_science_ray.functions.dedup import exact_dedup
        ds = _docs_ds(["aaa bbb", "ccc", "aaa bbb", "ddd", "aaa bbb"])
        out = exact_dedup(ds).to_pandas().sort_values("doc_id")
        got = dict(zip(out["doc_id"], out["dup_count"]))
        assert got == {0: 3, 1: 1, 3: 1}


class TestMinHash:
    def test_planted_near_dups_recovered(self):
        from graph_data_science_ray.functions.dedup import (exact_jaccard,
                                                            minhash_near_dups)
        rng = np.random.default_rng(4)
        vocab = [f"w{i}" for i in range(500)]
        base = " ".join(rng.choice(vocab, 60))
        near = base.rsplit(" ", 3)[0] + " zz1 zz2 zz3"  # ~90% shingle overlap
        others = [" ".join(rng.choice(vocab, 60)) for _ in range(30)]
        ds = _docs_ds([base, near] + others)
        out = minhash_near_dups(ds, threshold=0.5).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs
        # no false positives among the random docs
        assert all(a == 0 and b == 1 for a, b in pairs)
        j = out.set_index(["doc_a", "doc_b"]).loc[(0, 1), "jaccard"]
        assert j == pytest.approx(exact_jaccard(base, near), abs=1e-6)

    def test_md5_pipeline_matches_bruteforce_banding(self):
        """minhash_md5_near_dups must emit exactly the pairs a brute-force
        replay of the md5 banding + exact-Jaccard verify produces (the same
        invariant the DuckDB oracle checks at sf0.01, here self-contained)."""
        from graph_data_science_ray.functions.dedup import (_hash64_md5,
                                                            _token_shingles,
                                                            exact_jaccard,
                                                            minhash_md5_near_dups)
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(400)]
        texts = [" ".join(rng.choice(vocab, 50)) for _ in range(20)]
        texts.append(texts[0])                      # exact dup
        texts.append(texts[3] + " q1 q2")           # near dup
        ds = _docs_ds(texts)
        out = minhash_md5_near_dups(ds, num_perms=16, num_bands=4,
                                    threshold=0.5).to_pandas()
        got = {(a, b): j for a, b, j in
               zip(out["doc_a"], out["doc_b"], out["jaccard"])}

        def bands(text):
            sh = _token_shingles(text, 3)
            mins = [min(_hash64_md5(f"{i}:" + s) for s in sh) >> 1
                    for i in range(16)]
            return [tuple(mins[b * 4:(b + 1) * 4]) for b in range(4)]

        bb = [bands(t) for t in texts]
        exp = {}
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                if any(x == y for x, y in zip(bb[i], bb[j])):
                    jac = exact_jaccard(texts[i], texts[j])
                    if jac >= 0.5:
                        exp[(i, j)] = round(jac, 6)
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-6)
        assert (0, 20) in got and got[(0, 20)] == 1.0  # planted exact dup

    def test_verify_join_path_equals_small_path(self, monkeypatch):
        """The >gate verify path (two partitioned hash joins — the 100 TB
        shape) must produce exactly the small-path result; forced by dropping
        the gate to 0 so every candidate set takes the join path."""
        from graph_data_science_ray.functions import dedup as dd
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(400)]
        texts = [" ".join(rng.choice(vocab, 50)) for _ in range(15)]
        texts += [texts[0], texts[2] + " x1", texts[4] + " x1 x2"]
        ds = _docs_ds(texts)
        small = dd.minhash_near_dups(ds, threshold=0.5).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        monkeypatch.setattr(dd, "_VERIFY_SMALL_GATE", 0)
        join = dd.minhash_near_dups(ds, threshold=0.5).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        assert len(small) > 0
        assert small[["doc_a", "doc_b"]].equals(join[["doc_a", "doc_b"]])
        np.testing.assert_allclose(small["jaccard"], join["jaccard"],
                                   atol=1e-12)

    def test_signature_similarity_estimates_jaccard(self):
        from graph_data_science_ray.functions.dedup import MinHasher, exact_jaccard
        mh = MinHasher(num_perms=128)
        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = "the quick brown fox jumps over the lazy cat again and again today"
        sa, sb = mh.signature(a), mh.signature(b)
        est = float(np.mean(sa == sb))
        assert abs(est - exact_jaccard(a, b)) < 0.25


class TestSimHash:
    def test_similar_docs_close_hamming(self):
        from graph_data_science_ray.functions.dedup import SimHasher, hamming64
        sh = SimHasher()
        a = " ".join(f"tok{i}" for i in range(80))
        b = " ".join(f"tok{i}" for i in range(78)) + " other1 other2"
        c = " ".join(f"zz{i}" for i in range(80))
        ha, hb, hc = (np.array([sh.simhash(x)], dtype=np.uint64) for x in (a, b, c))
        assert hamming64(ha, hb)[0] < hamming64(ha, hc)[0]
        assert hamming64(ha, hb)[0] <= 12

    @pytest.mark.parametrize("hash_fn", ["blake2b", "md5"])
    def test_banded_hamming_join_matches_bruteforce(self, hash_fn):
        """simhash_near_dups must find EXACTLY the pairs brute-force all-pairs
        hamming ≤ d finds (pigeonhole guarantee: d < num_bands) — for both
        the production blake2b and the SQL-oracle md5 token-hash families."""
        from graph_data_science_ray.functions.dedup import (SimHasher,
                                                            hamming64,
                                                            simhash_near_dups)
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(300)]
        texts = [" ".join(rng.choice(vocab, 60)) for _ in range(25)]
        texts.append(texts[0])                       # exact dup → distance 0
        texts.append(texts[1] + " extra1")           # near dup
        texts.append(texts[2] + " extra1 extra2")    # near dup
        ds = _docs_ds(texts)
        out = simhash_near_dups(ds, max_hamming=3, num_bands=4,
                                hash_fn=hash_fn).to_pandas()
        got = {(a, b): h for a, b, h in
               zip(out["doc_a"], out["doc_b"], out["hamming"])}
        sh = SimHasher(hash_fn)
        sig = np.asarray([sh.simhash(t) >> 1 for t in texts], dtype=np.uint64)
        exp = {}
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                d = int(hamming64(sig[i:i + 1], sig[j:j + 1])[0])
                if d <= 3:
                    exp[(i, j)] = d
        assert got == exp
        assert got[(0, 25)] == 0  # the planted exact dup

    def test_banded_hamming_join_rejects_bad_band_count(self):
        from graph_data_science_ray.functions.dedup import simhash_near_dups
        with pytest.raises(ValueError):
            simhash_near_dups(_docs_ds(["x"]), max_hamming=4, num_bands=4)


class TestSimilarity:
    def _emb_ds(self, n=200, d=16, seed=8):
        import ray.data
        rng = np.random.default_rng(seed)
        v = rng.standard_normal((n, d))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return ray.data.from_arrow(pa.table({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(v.astype(np.float32)),
                                  pa.list_(pa.float32())),
        })), v

    def test_bruteforce_topk_exact(self):
        from graph_data_science_ray.functions.similarity import cosine_topk
        ds, v = self._emb_ds()
        q = v[0]
        out = cosine_topk(ds, q, k=5, exclude_id=0).to_pandas()
        sims = (v.astype(np.float64) @ q) / np.linalg.norm(v, axis=1)
        sims[0] = -np.inf
        expected = np.argsort(-sims)[:5]
        assert list(out["vec_id"]) == list(expected)

    def test_lsh_topk_high_recall(self):
        from graph_data_science_ray.functions.similarity import lsh_topk
        ds, v = self._emb_ds(n=400)
        q = v[7]
        out = lsh_topk(ds, q, k=10, num_planes=8).to_pandas()
        sims = v.astype(np.float64) @ q
        exact_top = set(np.argsort(-sims)[:10])
        recall = len(set(out["vec_id"]) & exact_top) / 10
        assert recall >= 0.5  # approximate, but must find a decent fraction

    def _clustered_emb_ds(self, clusters=8, per=50, d=16, seed=12):
        import ray.data
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((clusters, d)) * 3.0
        v = np.concatenate([centers[c] + rng.standard_normal((per, d)) * 0.3
                            for c in range(clusters)])
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return ray.data.from_arrow(pa.table({
            "vec_id": np.arange(len(v), dtype=np.int64),
            "embedding": pa.array(list(v.astype(np.float32)),
                                  pa.list_(pa.float32())),
        })), v

    def test_ivf_topk_high_recall_on_clustered_data(self):
        """On cluster-structured embeddings the true neighbors live in the
        query's (few nearest) inverted lists — the regime IVF is built for."""
        from graph_data_science_ray.functions.similarity import ivf_topk
        ds, v = self._clustered_emb_ds()
        q = v[3]
        out = ivf_topk(ds, q, k=10, num_lists=8, nprobe=2).to_pandas()
        sims = v.astype(np.float64) @ q
        exact_top = set(np.argsort(-sims)[:10])
        recall = len(set(out["vec_id"]) & exact_top) / 10
        assert recall >= 0.9

    def test_ivf_topk_exhaustive_probe_is_exact(self):
        """nprobe == num_lists scores every vector → identical to the exact
        brute-force top-k (the oracle-checkable configuration of
        `knn_cosine_ivf_full`), incl. the exclude_id pass-through."""
        from graph_data_science_ray.functions.similarity import (cosine_topk,
                                                                  ivf_topk)
        ds, v = self._clustered_emb_ds()
        q = v[3]
        got = ivf_topk(ds, q, k=10, num_lists=8, nprobe=8,
                       exclude_id=3).to_pandas()
        exp = cosine_topk(ds, q, k=10, exclude_id=3).to_pandas()
        assert list(got["vec_id"]) == list(exp["vec_id"])
        assert np.allclose(got["cos_sim"], exp["cos_sim"], atol=0)
        assert 3 not in set(got["vec_id"])

    def test_ivf_partition_covers_every_row_once(self):
        from graph_data_science_ray.functions.similarity import (
            ivf_partition, train_ivf_centroids)
        ds, v = self._clustered_emb_ds(clusters=4, per=30)
        cent = train_ivf_centroids(ds, num_lists=4, sample_rows=120)
        part = ivf_partition(ds, cent).to_pandas()
        assert sorted(part["vec_id"]) == list(range(len(v)))
        lists = part.set_index("vec_id")["ivf_list"]
        assert set(lists.unique()) <= set(range(4))
        # assignment is the argmax-cosine of the trained centroids
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        exp = np.argmax(vn @ cent.T, axis=1)
        assert list(lists.loc[np.arange(len(v))]) == list(exp)

    def test_ivf_centroids_deterministic_and_total(self):
        from graph_data_science_ray.functions.similarity import \
            train_ivf_centroids
        ds, _ = self._clustered_emb_ds(clusters=3, per=20)
        c1 = train_ivf_centroids(ds, num_lists=6, sample_rows=60, seed=29)
        c2 = train_ivf_centroids(ds, num_lists=6, sample_rows=60, seed=29)
        assert np.array_equal(c1, c2)
        assert c1.shape == (6, 16)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


class TestMultimodal:
    def test_image_feature_plumbing(self):
        import ray.data

        from graph_data_science_ray.functions.multimodal import (
            ImageFeatureExtractor, synthetic_media_table)
        media = ray.data.from_arrow(synthetic_media_table(50))
        out = media.map_batches(ImageFeatureExtractor(fake=True),
                                batch_format="pyarrow", batch_size=16).to_pandas()
        assert len(out) == 50
        assert all(len(f) == 16 for f in out["feature"])
        # deterministic: same payload → same feature
        out2 = media.map_batches(ImageFeatureExtractor(fake=True),
                                 batch_format="pyarrow", batch_size=16).to_pandas()
        assert np.allclose(np.stack(out["feature"].map(np.asarray)),
                           np.stack(out2["feature"].map(np.asarray)))

    def test_decode_unsupported_format_raises(self):
        from graph_data_science_ray.functions.multimodal import ImageFeatureExtractor
        with pytest.raises(NotImplementedError):
            ImageFeatureExtractor(fake=False)._decode(b"\x89PNG....")

    def test_ppm_roundtrip_and_comments(self):
        from graph_data_science_ray.functions.multimodal import (
            decode_image, encode_ppm)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        # header comments are legal PPM
        commented = b"P6\n# a comment\n5 7\n# another\n255\n" + img.tobytes()
        assert np.array_equal(decode_image(commented), img)

    def test_bmp_decode_bottom_up_bgr_padding(self):
        from graph_data_science_ray.functions.multimodal import decode_image
        # 2x2 24-bit BMP, rows padded to 4 bytes, bottom-up, BGR storage
        px = {(0, 0): (255, 0, 0), (0, 1): (0, 255, 0),
              (1, 0): (0, 0, 255), (1, 1): (10, 20, 30)}  # RGB truth
        w = h = 2
        stride = (w * 3 + 3) & ~3
        rows = bytearray()
        for y in reversed(range(h)):      # bottom-up
            row = bytearray()
            for x in range(w):
                r, g, b = px[(y, x)]
                row += bytes([b, g, r])   # BGR
            row += b"\x00" * (stride - len(row))
            rows += row
        header = (b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
                  + (54).to_bytes(4, "little")
                  + (40).to_bytes(4, "little")
                  + w.to_bytes(4, "little", signed=True)
                  + h.to_bytes(4, "little", signed=True)
                  + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
                  + (0).to_bytes(4, "little") + b"\x00" * 20)
        img = decode_image(bytes(header) + bytes(rows))
        for (y, x), rgb in px.items():
            assert tuple(img[y, x]) == rgb

    def test_resize_and_feature(self):
        from graph_data_science_ray.functions.multimodal import (
            image_feature, resize_nearest)
        img = np.zeros((10, 20, 3), dtype=np.uint8)
        img[:, 10:, :] = 255  # right half white
        small = resize_nearest(img, 4, 2)
        assert small.shape == (2, 4, 3)
        assert small[:, :2].max() == 0 and small[:, 2:].min() == 255
        f = image_feature(img)
        assert f.shape == (16,)
        assert abs(f[0] - 0.5) < 1e-6        # mean R of half-white image
        assert abs(f[15] - 2.0) < 1e-6       # aspect ratio w/h
        assert f[6] == 0.0 and abs(f[8] - 1.0) < 1e-6  # left/right grid cells

    def test_real_decode_pipeline(self):
        import ray.data

        from graph_data_science_ray.functions.multimodal import (
            ImageFeatureExtractor, decode_image, image_feature,
            resize_nearest, synthetic_media_table)
        media = synthetic_media_table(40, real_images=True)
        import pyarrow.compute as pc
        images = media.filter(pc.equal(media.column("kind"), "image"))
        assert images.num_rows > 0
        out = ray.data.from_arrow(images).map_batches(
            ImageFeatureExtractor(fake=False, resize_to=16),
            batch_format="pyarrow", batch_size=8).to_pandas() \
            .set_index("media_id")
        # spot-check one row against the sequential kernel
        mid = int(images.column("media_id")[0].as_py())
        payload = images.column("payload")[0].as_py()
        want = image_feature(resize_nearest(decode_image(payload), 16, 16))
        assert np.allclose(np.asarray(out.loc[mid].feature), want, atol=1e-6)
        # metadata matches decoded pixels
        img = decode_image(payload)
        assert (img.shape[1], img.shape[0]) == \
            (images.column("width")[0].as_py(), images.column("height")[0].as_py())

    def test_frame_sampler(self):
        from graph_data_science_ray.functions.multimodal import FrameSampler
        t = pa.table({"media_id": np.array([1, 2], dtype=np.int64),
                      "duration_ms": np.array([2500, 900], dtype=np.int32)})
        out = FrameSampler(every_ms=1000)(t).to_pandas()
        assert list(out[out.media_id == 1]["frame_idx"]) == [0, 1]
        assert list(out[out.media_id == 2]["frame_idx"]) == [0]


class TestScalers:
    def test_all_variants(self):
        from graph_data_science_ray.functions.scalers import scale
        v = np.array([1.0, 2.0, 3.0, 4.0])
        np.testing.assert_allclose(scale(v, "max"), v / 4)
        np.testing.assert_allclose(scale(v, "minmax"), (v - 1) / 3)
        np.testing.assert_allclose(scale(v, "mean"), (v - 2.5) / 3)
        np.testing.assert_allclose(scale(v, "l1norm"), v / 10)
        np.testing.assert_allclose(scale(v, "l2norm"), v / np.sqrt(30))
        np.testing.assert_allclose(scale(v, "log"), np.log(v))
        std = np.sqrt(((v - 2.5) ** 2).mean())
        np.testing.assert_allclose(scale(v, "stdscore"), (v - 2.5) / std)

    def test_degenerate_to_zero(self):
        from graph_data_science_ray.functions.scalers import scale
        v = np.zeros(4)
        for variant in ("max", "minmax", "mean", "stdscore", "l1norm", "l2norm"):
            np.testing.assert_array_equal(scale(v, variant), np.zeros(4))


class TestTextOps:
    def test_token_counter_empty_and_whitespace(self):
        from graph_data_science_ray.functions.text import TokenCounter
        t = pa.table({"doc_id": np.arange(3, dtype=np.int64),
                      "text": ["a b  c", "", "   "]})
        out = TokenCounter()(t)
        # DuckDB semantics: split('') = [''] → 1
        assert out.column("n_tokens").to_pylist() == [3, 1, 1]

    def test_sha256_matches_hashlib_and_duckdb(self):
        import duckdb

        from graph_data_science_ray.functions.text import Sha256
        t = pa.table({"doc_id": np.arange(3, dtype=np.int64),
                      "text": ["abc", "", "héllo wörld"]})
        out = Sha256()(t)
        import hashlib
        want = [hashlib.sha256(s.encode()).hexdigest()
                for s in t.column("text").to_pylist()]
        assert out.column("sha256").to_pylist() == want
        sql = duckdb.connect().execute(
            "SELECT sha256(x) FROM (VALUES ('abc'), (''), ('héllo wörld')) "
            "t(x)").fetchall()
        assert [r[0] for r in sql] == want

    def test_lang_id(self):
        from graph_data_science_ray.functions.text import LanguageId
        t = pa.table({"doc_id": np.arange(3, dtype=np.int64),
                      "text": ["the cat and the dog of a house",
                               "der hund und die katze ist ein tier",
                               "xyzzy qwfp"]})
        out = LanguageId()(t)
        assert out.column("lang_pred").to_pylist() == ["en", "de", "und"]


class TestJoins:
    def _two_tables(self):
        import ray.data
        rng = np.random.default_rng(17)
        left = pa.table({"k": rng.integers(0, 50, 200),
                         "lv": rng.random(200)})
        right = pa.table({"k": np.arange(0, 60, 2, dtype=np.int64),
                          "rv": np.arange(30, dtype=np.int64) * 10})
        return ray.data.from_arrow(left), ray.data.from_arrow(right), left, right

    def test_hash_join_matches_pandas(self):
        from graph_data_science_ray.functions.joins import hash_join
        lds, rds, lt, rt = self._two_tables()
        got = hash_join(lds, rds, "k", num_buckets=8).to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k", how="inner")
        key = lambda df: df.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(key(got[["k", "lv", "rv"]]), key(exp),
                                      check_dtype=False)

    def test_semi_and_anti_join(self):
        from graph_data_science_ray.functions.joins import semi_join_filter
        lds, _, lt, _ = self._two_tables()
        keep = {1, 2, 3}
        semi = semi_join_filter(lds, "k", keep).to_pandas()
        anti = semi_join_filter(lds, "k", keep, anti=True).to_pandas()
        assert set(semi["k"]) <= keep
        assert set(anti["k"]).isdisjoint(keep)
        assert len(semi) + len(anti) == lt.num_rows


def test_semi_join_empty_key_set():
    import ray.data

    from graph_data_science_ray.functions.joins import semi_join_filter
    ds = ray.data.from_items([{"k": 1}, {"k": 2}])
    assert semi_join_filter(ds, "k", []).count() == 0
    assert semi_join_filter(ds, "k", [], anti=True).count() == 2


class TestEmbeddingDup:
    def _planted_ds(self, n=300, d=16, seed=12, dups=20):
        """Random unit vectors plus `dups` planted near-duplicates (tiny
        perturbations of existing rows — cosine >> 0.9)."""
        import ray.data
        rng = np.random.default_rng(seed)
        v = rng.standard_normal((n, d))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        src = rng.choice(n, size=dups, replace=False)
        pert = v[src] + 0.02 * rng.standard_normal((dups, d))
        pert /= np.linalg.norm(pert, axis=1, keepdims=True)
        allv = np.vstack([v, pert]).astype(np.float32)
        ds = ray.data.from_arrow(pa.table({
            "vec_id": np.arange(n + dups, dtype=np.int64),
            "embedding": pa.array(list(allv), pa.list_(pa.float32())),
        })).repartition(8)
        return ds, allv, {(int(min(s, n + i)), int(max(s, n + i)))
                          for i, s in enumerate(src)}

    def test_exact_pairs_match_bruteforce(self):
        from graph_data_science_ray.functions.dedup import embedding_dup_pairs
        ds, allv, planted = self._planted_ds()
        t = embedding_dup_pairs(ds, threshold=0.9, arithmetic="float64")
        got = {(int(a), int(b)) for a, b in zip(t.column("id1").to_pylist(),
                                                t.column("id2").to_pylist())}
        m = allv.astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        iu = np.triu_indices(len(m), k=1)
        exp = {(int(a), int(b)) for a, b in
               zip(iu[0][sims[iu] >= 0.9], iu[1][sims[iu] >= 0.9])}
        assert got == exp
        assert planted <= got  # every planted dup recovered

    def test_lsh_pairs_high_recall_exact_precision(self):
        from graph_data_science_ray.functions.dedup import (
            embedding_dup_pairs, embedding_dup_pairs_lsh)
        ds, _, _ = self._planted_ds()
        exact = embedding_dup_pairs(ds, threshold=0.9, arithmetic="f32seq")
        exact_pairs = {(int(a), int(b)) for a, b in
                       zip(exact.column("id1").to_pylist(),
                           exact.column("id2").to_pylist())}
        lsh = embedding_dup_pairs_lsh(ds, threshold=0.9,
                                      num_bands=24, planes_per_band=3)
        lt = lsh.to_pandas() if hasattr(lsh, "to_pandas") else lsh
        got = {(int(a), int(b)) for a, b in zip(lt["id1"], lt["id2"])}
        assert got <= exact_pairs          # precision exact (verified pairs)
        assert len(got) >= 0.9 * len(exact_pairs)  # high-cosine pairs: high recall

    def test_lsh_fast_path_equals_join_path(self, monkeypatch):
        """The broadcast-gather verify fast path and the hash-join path must
        produce the identical pair set AND identical similarity values (both
        run the per-dimension float32-sequential kernel)."""
        from graph_data_science_ray.functions import dedup as dd
        ds, _, _ = self._planted_ds()

        def run():
            out = dd.embedding_dup_pairs_lsh(ds, threshold=0.9,
                                             num_bands=24, planes_per_band=3)
            df = out.to_pandas()
            return df.sort_values(["id1", "id2"]).reset_index(drop=True)

        fast = run()
        monkeypatch.setattr(dd, "_EMB_VERIFY_ID_GATE", 0)  # force join path
        joined = run()
        assert len(fast) == len(joined)
        assert (fast["id1"].to_numpy() == joined["id1"].to_numpy()).all()
        assert (fast["id2"].to_numpy() == joined["id2"].to_numpy()).all()
        np.testing.assert_array_equal(fast["similarity"].to_numpy(),
                                      joined["similarity"].to_numpy())


class TestSimilarityReviewRegressions:
    def test_stack_zero_copy_matches_pylist(self):
        import pyarrow as pa

        from graph_data_science_ray.functions.similarity import _stack
        col = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                       type=pa.list_(pa.float32()))
        np.testing.assert_array_equal(
            _stack(col), np.asarray(col.to_pylist(), dtype=np.float64))
        # sliced columns carry absolute offsets — must still align
        np.testing.assert_array_equal(
            _stack(col.slice(1)), np.asarray(col.slice(1).to_pylist(),
                                             dtype=np.float64))
        ragged = pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float64()))
        with pytest.raises(ValueError, match="ragged"):
            _stack(ragged)

    def test_lsh_probe_hamming_two_reaches_distance_two(self, ray_session):
        """probe_hamming=2 must probe distance-2 buckets (only distance-1
        flips were generated before, silently lowering recall)."""
        import pyarrow as pa
        import ray.data as rd

        from graph_data_science_ray.functions.similarity import (
            HyperplaneLsh, lsh_topk)
        rng = np.random.default_rng(31)
        dim, planes, seed = 16, 8, 23
        lsh = HyperplaneLsh(dim, planes, seed)
        q = rng.normal(size=dim)

        def code_of(v):
            bits = (np.asarray(v, dtype=np.float64) @ lsh.planes) > 0
            return sum(int(b) << i for i, b in enumerate(bits))

        qcode = code_of(q)
        # find a vector whose bucket is exactly Hamming-2 from the query's
        target = None
        for _ in range(3000):
            v = rng.normal(size=dim)
            if bin(code_of(v) ^ qcode).count("1") == 2:
                target = v
                break
        assert target is not None
        tab = pa.table({"vec_id": pa.array([0], pa.int64()),
                        "embedding": pa.array([target.tolist()],
                                              pa.list_(pa.float64()))})
        ds = rd.from_arrow(tab)
        near = lsh_topk(ds, q, k=1, dim=dim, num_planes=planes,
                        probe_hamming=2, seed=seed)
        far = lsh_topk(ds, q, k=1, dim=dim, num_planes=planes,
                       probe_hamming=1, seed=seed)
        n_near = near.count() if hasattr(near, "count") else near.num_rows
        n_far = far.count() if hasattr(far, "count") else far.num_rows
        assert n_near == 1 and n_far == 0

    def test_ivf_empty_dataset_friendly_error(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from graph_data_science_ray.functions.similarity import \
            train_ivf_centroids
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "embedding": pa.array([], pa.list_(pa.float64()))})
        with pytest.raises(ValueError, match="empty"):
            train_ivf_centroids(rd.from_arrow(empty))


class TestClusterDedup:
    """cluster_dedup: connected components over near-dup pairs, min-id keep."""

    def _docs(self, ids):
        import ray.data as rd
        return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))

    def test_transitive_clusters(self):
        from graph_data_science_ray.functions.dedup import cluster_dedup
        # 1~2, 2~3 (never 1~3) must land in ONE cluster; 5~6 separate
        pairs = pa.table({"doc_a": pa.array([1, 2, 5], pa.int64()),
                          "doc_b": pa.array([2, 3, 6], pa.int64())})
        out = cluster_dedup(self._docs(range(8)), pairs) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out.cluster_id.tolist() == [0, 1, 1, 1, 4, 5, 5, 7]
        assert out.kept.tolist() == [True, True, False, False,
                                     True, True, False, True]

    def test_empty_pairs_identity(self):
        from graph_data_science_ray.functions.dedup import cluster_dedup
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        out = cluster_dedup(self._docs([3, 9, 11]), empty) \
            .to_pandas().sort_values("doc_id")
        assert out.cluster_id.tolist() == [3, 9, 11]
        assert out.kept.all()

    def test_dataset_pairs_and_sparse_ids(self):
        import ray.data as rd
        from graph_data_science_ray.functions.dedup import cluster_dedup
        # pair ids are sparse / non-contiguous; pairs arrive as a Dataset
        pairs = rd.from_arrow(pa.table({
            "doc_a": pa.array([1000, 7], pa.int64()),
            "doc_b": pa.array([2000000, 1000], pa.int64())}))
        out = cluster_dedup(self._docs([7, 1000, 2000000, 42]), pairs) \
            .to_pandas().set_index("doc_id")
        assert out.loc[7].cluster_id == 7
        assert out.loc[1000].cluster_id == 7
        assert out.loc[2000000].cluster_id == 7
        assert out.loc[42].cluster_id == 42 and out.loc[42].kept


class TestQuantizeEmbeddings:
    def _ds(self, vecs, parts=3):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64()))})) \
            .repartition(parts)

    def test_roundtrip_error_and_range(self):
        from graph_data_science_ray.functions.similarity import (
            quantize_embeddings)
        rng = np.random.default_rng(4)
        vecs = [list(rng.normal(0, 2, 16)) for _ in range(40)]
        out = quantize_embeddings(self._ds(vecs)).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        for i, v in enumerate(vecs):
            q = np.asarray(out.qvec[i], dtype=np.float64)
            s = out.scale[i]
            assert np.abs(q).max() <= 127
            # dequantized error bounded by half a quantization step
            assert np.abs(q * s - np.asarray(v)).max() <= s / 2 + 1e-12

    def test_zero_vector(self):
        from graph_data_science_ray.functions.similarity import (
            quantize_embeddings)
        out = quantize_embeddings(self._ds([[0.0, 0.0, 0.0], [1.0, -2.0, 0.5]],
                                           parts=1)).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert list(out.qvec[0]) == [0, 0, 0] and out.scale[0] == 0.0
        assert list(out.qvec[1]) == [64, -127, 32]  # 1*127/2=63.5 -> away=64


class TestIncrementalDedup:
    def _ds(self, ids, texts, parts=3):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string())})).repartition(parts)

    def test_exact_vs_store_with_tight_bloom(self):
        import hashlib
        import ray.data as rd
        from graph_data_science_ray.functions.dedup import incremental_dedup
        old = [f"old doc {i} content" for i in range(60)]
        new = [f"new doc {i} content" for i in range(40)] + old[:15]
        store = rd.from_arrow(pa.table({"fp": pa.array(
            [hashlib.sha256(t.encode()).hexdigest() for t in old])}))
        # tiny filter → bloom false positives guaranteed; verify must fix them
        out = incremental_dedup(self._ds(range(len(new)), new), store,
                                num_bits=256, num_hashes=2) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert (~out.is_new[40:]).all()      # the 15 re-ingested docs
        assert out.is_new[:40].all()         # genuinely new docs survive FPs

    def test_empty_store_all_new(self):
        import ray.data as rd
        from graph_data_science_ray.functions.dedup import incremental_dedup
        store = rd.from_arrow(pa.table({"fp": pa.array([], pa.string())}))
        out = incremental_dedup(self._ds([1, 2], ["a", "b"]), store) \
            .to_pandas()
        assert out.is_new.all()


class TestSemanticDedup:
    def _emb(self, m=300, d=12, seed=5, dup_every=13):
        rng = np.random.default_rng(seed)
        base = rng.normal(0, 1, (m, d)).astype(np.float32)
        for i in range(0, m - 7, dup_every):
            base[i + 7] = base[i] + rng.normal(0, .01, d).astype(np.float32)
        return pa.table({
            "vec_id": np.arange(m, dtype=np.int64),
            "embedding": pa.array(base.tolist(), pa.list_(pa.float32()))})

    def _brute(self, t, threshold, num_clusters):
        """Driver-side reference: nearest-seed assignment + per-cluster
        any-smaller-id pairwise cut, float32 sequential arithmetic."""
        from graph_data_science_ray.functions.compat import (
            cosine_f32_sequential)
        ids = t.column("vec_id").to_numpy()
        m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        c = m[:num_clusters]
        cl = np.argmax(cosine_f32_sequential(m, c), axis=1)
        is_dup = np.zeros(ids.shape[0], dtype=np.int64)
        sims = cosine_f32_sequential(m, m).astype(np.float64)
        for j in range(ids.shape[0]):
            same = (cl == cl[j]) & (ids < ids[j]) & (sims[:, j] >= threshold)
            is_dup[j] = int(same.any())
        return ids, cl.astype(np.int64), is_dup

    def test_matches_brute_force_seed_mode(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        t = self._emb()
        ds = ray.data.from_arrow(t).repartition(5)
        out = semantic_dedup(ds, threshold=0.85, num_clusters=6,
                     as_dataset=False).sort_by(
            "vec_id")
        ids, cl, is_dup = self._brute(t, 0.85, 6)
        assert is_dup.sum() > 0, "fixture must plant same-cluster dups"
        np.testing.assert_array_equal(out.column("vec_id").to_numpy(), ids)
        np.testing.assert_array_equal(out.column("cluster").to_numpy(), cl)
        np.testing.assert_array_equal(out.column("is_dup").to_numpy(), is_dup)

    def test_layout_invariance_and_dataset_mode(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        t = self._emb(m=120)
        a = semantic_dedup(ray.data.from_arrow(t).repartition(2),
                           threshold=0.9, num_clusters=4,
                           as_dataset=False).sort_by("vec_id")
        dsb = semantic_dedup(ray.data.from_arrow(t).repartition(9),
                             threshold=0.9, num_clusters=4, as_dataset=True)
        import ray
        b = pa.concat_tables(
            [x for x in ray.get(dsb.materialize().to_arrow_refs())
             if x.num_rows and x.num_columns]).sort_by("vec_id")
        assert a.equals(b)

    def test_kmeans_mode_flags_planted_dups(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        t = self._emb(m=200)
        out = semantic_dedup(ray.data.from_arrow(t).repartition(3),
                             threshold=0.95, num_clusters=5,
                             centroids="kmeans", arithmetic="float64",
                             seed=11, as_dataset=False).sort_by("vec_id")
        assert out.num_rows == 200
        dup = out.column("is_dup").to_numpy()
        # planted near-identical rows land in the planted row's cluster and
        # must be flagged; every flagged id has a smaller-id near neighbor
        assert dup.sum() >= 5
        assert dup[0] == 0  # smallest id can never be a dup

    def test_validation(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        ds = ray.data.from_arrow(self._emb(m=20))
        with pytest.raises(ValueError, match="arithmetic"):
            semantic_dedup(ds, arithmetic="f16")
        with pytest.raises(ValueError, match="centroids"):
            semantic_dedup(ds, centroids="random")
        with pytest.raises(ValueError, match="num_clusters"):
            semantic_dedup(ds, num_clusters=0)


class TestSubstringDupStats:
    def _docs(self):
        sent = "the quick brown fox jumps over the lazy dog again and again"
        return pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                sent + " unique tail zero",      # shares a window with doc 1
                sent + " different ending one",
                "totally unrelated words nowhere repeated in corpus",
                "short"], pa.string())})

    def test_planted_duplication_and_short_doc(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import substring_dup_stats
        t = self._docs()
        out = substring_dup_stats(
            ray.data.from_arrow(t).repartition(3), k=8, stride=4,
            num_buckets=8, as_dataset=False).sort_by("doc_id")
        assert out.column("doc_id").to_pylist() == [0, 1, 2, 3]
        nd = out.column("n_dup_windows").to_numpy()
        # docs 0 and 1 share their first 8-token window; 2 and 3 share none
        assert nd[0] >= 1 and nd[1] >= 1 and nd[2] == 0 and nd[3] == 0
        # a doc shorter than k tokens still contributes exactly one window
        assert out.column("n_windows").to_numpy()[3] == 1

    def test_within_doc_repetition_counts(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import substring_dup_stats
        rep = " ".join(["alpha beta gamma delta"] * 6)   # self-repeating
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([rep], pa.string())})
        out = substring_dup_stats(ray.data.from_arrow(t), k=4, stride=4,
                                  num_buckets=4, as_dataset=False)
        assert out.column("dup_fraction").to_numpy()[0] == 1.0

    def test_layout_invariance_and_families(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import substring_dup_stats
        rng = np.random.default_rng(3)
        words = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(words, rng.integers(5, 60)))
                 for _ in range(40)]
        t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        a = substring_dup_stats(ray.data.from_arrow(t).repartition(2),
                                k=5, stride=2, num_buckets=4,
                                as_dataset=False).sort_by("doc_id")
        b = substring_dup_stats(ray.data.from_arrow(t).repartition(11),
                                k=5, stride=2, num_buckets=16,
                                hash_fn="md5",
                                as_dataset=False).sort_by("doc_id")
        # md5 and blake2b families count identical window-text multiplicity
        for c in ("doc_id", "n_windows", "n_dup_windows", "dup_fraction"):
            np.testing.assert_array_equal(a.column(c).to_numpy(),
                                          b.column(c).to_numpy())

    def test_empty_text_skipped_and_validation(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import substring_dup_stats
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["", "some actual words"], pa.string())})
        out = substring_dup_stats(ray.data.from_arrow(t), k=4, stride=2,
                                  as_dataset=False)
        assert out.column("doc_id").to_pylist() == [1]
        with pytest.raises(ValueError, match="k and stride"):
            substring_dup_stats(ray.data.from_arrow(t), k=0)
        with pytest.raises(ValueError, match="hash_fn"):
            substring_dup_stats(ray.data.from_arrow(t), hash_fn="sha1")


class TestSemanticDedupReviewRegressions:
    def test_zero_vector_rejected_in_f32seq(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                      "embedding": pa.array([[1.0, 0.0], [0.0, 0.0],
                                             [0.0, 1.0]],
                                            pa.list_(pa.float32()))})
        with pytest.raises(Exception, match="zero-norm"):
            semantic_dedup(ray.data.from_arrow(t), threshold=0.5,
                           num_clusters=2, as_dataset=False)

    def test_duplicate_vec_ids_use_strict_id_compare(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        # two rows share vec_id 5 with near-identical vectors: the oracle's
        # strict b.vec_id < a.vec_id flags NEITHER from that pair; row 9
        # (same vector, larger id) IS flagged by both
        t = pa.table({"vec_id": pa.array([5, 5, 9], pa.int64()),
                      "embedding": pa.array([[1.0, 0.0], [1.0, 0.001],
                                             [1.0, 0.0]],
                                            pa.list_(pa.float32()))})
        out = semantic_dedup(ray.data.from_arrow(t).repartition(2),
                             threshold=0.99, num_clusters=1,
                             as_dataset=False).sort_by("vec_id")
        assert out.column("vec_id").to_pylist() == [5, 5, 9]
        assert out.column("is_dup").to_pylist() == [0, 0, 1]

    def test_empty_table_raises_cleanly(self):
        import ray.data
        from graph_data_science_ray.functions.dedup import semantic_dedup
        t = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
        with pytest.raises(ValueError, match="empty embedding table"):
            semantic_dedup(ray.data.from_arrow(t), num_clusters=2)


class TestIvfParquetIndex:
    def _emb(self, m=240, d=8, seed=9):
        rng = np.random.default_rng(seed)
        # clustered data so lists are meaningful
        centers = rng.normal(0, 5, (4, d))
        x = (centers[rng.integers(0, 4, m)] +
             rng.normal(0, .5, (m, d))).astype(np.float32)
        return pa.table({"vec_id": np.arange(m, dtype=np.int64),
                         "embedding": pa.array(x.tolist(),
                                               pa.list_(pa.float32()))})

    def test_full_probe_is_exact_and_reads_only_probed_files(self, tmp_path):
        import os
        import ray.data
        from graph_data_science_ray.functions.similarity import (
            build_ivf_index, cosine_topk, ivf_topk_from_index)
        t = self._emb()
        ds = ray.data.from_arrow(t).repartition(4)
        idx = str(tmp_path / "ivf")
        cents, manifest = build_ivf_index(ds, idx, num_lists=6, seed=3)
        q = np.asarray(t.column("embedding").to_pylist()[5], dtype=np.float64)
        def _tab(ds):
            import ray
            return pa.concat_tables(
                [x for x in (ray.get(r) for r in
                             ds.materialize().to_arrow_refs())
                 if x.num_rows and x.num_columns])

        exact = _tab(cosine_topk(ray.data.from_arrow(t), q, k=5))
        full = _tab(ivf_topk_from_index(idx, q, k=5, nprobe=6))
        assert full.column("vec_id").to_pylist() == \
            exact.column("vec_id").to_pylist()
        np.testing.assert_allclose(full.column("cos_sim").to_numpy(),
                                   exact.column("cos_sim").to_numpy(),
                                   rtol=0, atol=1e-12)
        # nprobe=1 touches exactly one part file's rows
        one = _tab(ivf_topk_from_index(idx, q, k=5, nprobe=1))
        assert one.num_rows <= 5
        files = sorted(f for f in os.listdir(idx) if f.endswith(".parquet"))
        assert 1 <= len(files) <= 6

    def test_index_resume_skips_complete_parts(self, tmp_path):
        import ray.data
        from graph_data_science_ray.functions.similarity import (
            build_ivf_index)
        t = self._emb(m=120)
        idx = str(tmp_path / "ivf2")
        ds = ray.data.from_arrow(t)
        _, m1 = build_ivf_index(ds, idx, num_lists=4, seed=3)
        assert not any(m1.column("skipped").to_pylist())
        _, m2 = build_ivf_index(ds, idx, num_lists=4, seed=3)
        assert all(m2.column("skipped").to_pylist())

    def test_recall_with_partial_probe(self):
        import tempfile
        import ray.data
        from graph_data_science_ray.functions.similarity import (
            build_ivf_index, cosine_topk, ivf_topk_from_index)
        t = self._emb(m=300)
        with tempfile.TemporaryDirectory() as d:
            build_ivf_index(ray.data.from_arrow(t), d, num_lists=4, seed=3)
            q = np.asarray(t.column("embedding").to_pylist()[0],
                           dtype=np.float64)
            import ray as _r

            def _ids(ds):
                out = []
                for r in ds.materialize().to_arrow_refs():
                    x = _r.get(r)
                    if x.num_rows and x.num_columns:
                        out.extend(x.column("vec_id").to_pylist())
                return out

            exact = set(_ids(cosine_topk(ray.data.from_arrow(t), q, k=10)))
            part = set(_ids(ivf_topk_from_index(d, q, k=10, nprobe=2)))
            assert len(exact & part) / 10 >= 0.8  # clustered data: high recall

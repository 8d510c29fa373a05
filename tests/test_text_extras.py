"""json_extract_scalar and redact_pii (functions/text.py) vs DuckDB RE2."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from graph_data_science_ray.functions.text import (json_extract_scalar,
                                                   redact_pii, PII_PATTERNS)


class TestJsonExtractScalar:
    def _ds(self):
        return ray.data.from_pandas(pd.DataFrame({
            "id": [0, 1, 2, 3, 4, 5],
            "props": ['{"k": 87, "v": 1.5}',
                      '{"k": -3}',
                      '{"v": 9}',                 # key absent -> null
                      '{"k": 2.5e2, "s": "ab"}',  # exponent float
                      '{"s": "x y", "k": 0}',     # key not first
                      '{}'],
        })).repartition(2)

    def test_int64(self):
        out = json_extract_scalar(self._ds(), "props", "k",
                                  dtype="float64").to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        assert out["k"].tolist() == pytest.approx(
            [87.0, -3.0, None, 250.0, 0.0, None], nan_ok=True) or True
        got = out["k"].tolist()
        assert got[0] == 87.0 and got[1] == -3.0 and got[3] == 250.0 \
            and got[4] == 0.0
        assert pd.isna(got[2]) and pd.isna(got[5])

    def test_int_dtype(self):
        ds = ray.data.from_pandas(pd.DataFrame(
            {"id": [0, 1], "props": ['{"k": 7}', '{"x": 1}']}))
        out = json_extract_scalar(ds, "props", "k").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        assert out["k"].dtype.kind in "if"  # int64 w/ null -> pandas float
        assert out["k"][0] == 7 and pd.isna(out["k"][1])

    def test_string(self):
        ds = ray.data.from_pandas(pd.DataFrame(
            {"id": [0, 1], "props": ['{"s": "hello", "k": 1}', '{"k": 2}']}))
        out = json_extract_scalar(ds, "props", "s", dtype="string") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        assert out["s"][0] == "hello" and pd.isna(out["s"][1])

    def test_out_col_and_bad_dtype(self):
        ds = ray.data.from_pandas(pd.DataFrame({"props": ['{"k": 1}']}))
        out = json_extract_scalar(ds, "props", "k", out_col="kk").to_pandas()
        assert "kk" in out.columns
        with pytest.raises(ValueError):
            json_extract_scalar(ds, "props", "k", dtype="bool")

    def test_matches_duckdb(self):
        df = pd.DataFrame({"id": range(5),
                           "props": [f'{{"k": {i * 7 - 3}}}' for i in range(4)]
                           + ['{"other": 1}']})
        out = json_extract_scalar(ray.data.from_pandas(df), "props", "k") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            "SELECT CAST(nullif(regexp_extract(props,"
            " '\"k\"\\s*:\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][-+]?\\d+)?)', 1), '')"
            " AS BIGINT) AS k FROM t ORDER BY id").df()
        assert out["k"].fillna(-1).tolist() == exp["k"].fillna(-1).tolist()


class TestRedactPii:
    CASES = [
        "write to bob.smith+x@sub.example.co.uk today",
        "server at 192.168.0.1 and 8.8.8.8 responded",
        "call +14155550100 or 415-555-0100 now",
        "mixed a@b.io 10.0.0.7 +4930123456 030-123-4567",
        "clean text with no pii at all",
        "",
    ]

    def test_matches_duckdb(self):
        df = pd.DataFrame({"id": range(len(self.CASES)), "text": self.CASES})
        out = redact_pii(ray.data.from_pandas(df).repartition(2)) \
            .to_pandas().sort_values("id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        expr = "text"
        for pat, repl in PII_PATTERNS:
            expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
        exp = con.execute(f"SELECT {expr} AS text FROM t ORDER BY id").df()
        assert out["text"].tolist() == exp["text"].tolist()

    def test_order_matters(self):
        # the email's host would match the phone/IP patterns if email ran last
        out = redact_pii(ray.data.from_pandas(pd.DataFrame(
            {"text": ["u1@10.0.0.1.example.com"]}))).to_pandas()
        assert out["text"][0] == "<EMAIL>"

    def test_all_redacted(self):
        out = redact_pii(ray.data.from_pandas(pd.DataFrame(
            {"text": ["x@y.io 1.2.3.4 +1234567 111-222-3333"]}))).to_pandas()
        t = out["text"][0]
        assert "@" not in t and "1.2.3.4" not in t
        assert t == "<EMAIL> <IP> <PHONE> <PHONE>"


class TestAddNgramJaccard:
    def test_matches_exact_jaccard(self):
        from graph_data_science_ray.functions.dedup import (add_ngram_jaccard,
                                                            exact_jaccard)
        rng = np.random.default_rng(7)
        words = ["a", "bb", "ccc", "dd", "e"]
        ta = [" ".join(rng.choice(words, rng.integers(1, 20)))
              for _ in range(40)]
        tb = [" ".join(rng.choice(words, rng.integers(1, 20)))
              for _ in range(40)]
        df = pd.DataFrame({"id": range(40), "text_a": ta, "text_b": tb})
        out = (add_ngram_jaccard(ray.data.from_pandas(df).repartition(3))
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = [exact_jaccard(a, b) for a, b in zip(ta, tb)]
        assert out["jaccard"].tolist() == pytest.approx(exp)

    def test_short_and_identical_texts(self):
        from graph_data_science_ray.functions.dedup import add_ngram_jaccard
        df = pd.DataFrame({"text_a": ["x y", "p q r s", ""],
                           "text_b": ["x y", "p q r s", ""]})
        out = add_ngram_jaccard(ray.data.from_pandas(df)).to_pandas()
        # <k tokens -> whole text is the single shingle; both empty -> 1.0
        assert out["jaccard"].tolist() == [1.0, 1.0, 1.0]

    def test_k_param(self):
        from graph_data_science_ray.functions.dedup import add_ngram_jaccard
        df = pd.DataFrame({"text_a": ["a b c d"], "text_b": ["b c d e"]})
        out2 = add_ngram_jaccard(ray.data.from_pandas(df), k=2).to_pandas()
        # 2-grams: {ab,bc,cd} vs {bc,cd,de} -> 2/4
        assert out2["jaccard"][0] == pytest.approx(0.5)


class TestNgramContamination:
    def test_exact_fractions(self):
        from graph_data_science_ray.functions.dedup import ngram_contamination
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c d e",        # shingles abc bcd cde
                     "a b c x y",        # abc bcx cxy -> 1/3 hit vs probe
                     "q r s t",          # none
                     ""]})               # zero shingles -> dropped
        probe = ["a b c d"]              # probe shingles: abc bcd
        out = (ngram_contamination(ray.data.from_pandas(docs), probe)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [0, 1, 2]
        assert out["n_shingles"].tolist() == [3, 3, 2]
        assert out["n_hit"].tolist() == [2, 1, 0]
        assert out["frac"].tolist() == pytest.approx([2 / 3, 1 / 3, 0.0])

    def test_dataset_probe_side(self):
        from graph_data_science_ray.functions.dedup import ngram_contamination
        docs = pd.DataFrame({"doc_id": [0, 1],
                             "text": ["u v w x", "m n o p"]})
        probe_ds = ray.data.from_pandas(
            pd.DataFrame({"text": ["u v w"]})).repartition(2)
        out = (ngram_contamination(ray.data.from_pandas(docs), probe_ds)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_hit"].tolist() == [1, 0]


class TestChunkDocuments:
    def test_exact_windows(self):
        from graph_data_science_ray.functions.text import chunk_documents
        toks = " ".join(f"t{i}" for i in range(7))
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [7],
                                                "text": [toks]}))
        out = (chunk_documents(ds, 5, overlap=2).to_pandas()
               .sort_values("chunk_id").reset_index(drop=True))
        assert out["start_tok"].tolist() == [0, 3, 6]
        assert out["n_chunk_tokens"].tolist() == [5, 4, 1]
        assert out["chunk_text"].tolist() == ["t0 t1 t2 t3 t4",
                                              "t3 t4 t5 t6", "t6"]

    def test_no_overlap_and_empty(self):
        from graph_data_science_ray.functions.text import chunk_documents
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": [0, 1], "text": ["a b c d", ""]}))
        out = chunk_documents(ds, 2).to_pandas()
        assert set(out.doc_id) == {0}  # empty text -> no chunks
        assert len(out) == 2 and out["chunk_text"].tolist() == ["a b", "c d"]

    def test_bad_params(self):
        from graph_data_science_ray.functions.text import chunk_documents
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0],
                                                "text": ["x"]}))
        with pytest.raises(ValueError):
            chunk_documents(ds, 0)
        with pytest.raises(ValueError):
            chunk_documents(ds, 4, overlap=4)

    def test_matches_duckdb(self):
        from graph_data_science_ray.functions.text import chunk_documents
        rng = np.random.default_rng(3)
        texts = [" ".join(rng.choice(["aa", "b", "ccc"], rng.integers(1, 40)))
                 for _ in range(60)]
        df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                           "text": texts})
        out = (chunk_documents(ray.data.from_pandas(df).repartition(3),
                               8, overlap=3)
               .to_pandas().sort_values(["doc_id", "chunk_id"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute("""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           FROM t WHERE trim(text) <> ''),
c AS (SELECT doc_id, ws, unnest(range(0, len(ws), 5)) AS s FROM w)
SELECT doc_id, s // 5 AS chunk_id, s AS start_tok,
       least(8, len(ws) - s) AS n_chunk_tokens,
       array_to_string(ws[s + 1 : s + 8], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id""").df()
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)


class TestUnigramLm:
    def _ds(self, texts, parts=3):
        import ray.data as rd
        import pyarrow as pa
        return rd.from_arrow(pa.table({
            "doc_id": list(range(len(texts))), "text": texts})).repartition(parts)

    def test_known_distribution(self):
        import numpy as np
        from graph_data_science_ray.functions.text import unigram_lm_scores
        # corpus: "a" x3, "b" x1 -> p(a)=3/4, p(b)=1/4
        out = unigram_lm_scores(self._ds(["a a b", "a"])) \
            .to_pandas().set_index("doc_id")
        import math
        pa_, pb = 3 / 4, 1 / 4
        want0 = -(2 * math.log(pa_) + math.log(pb)) / 3
        assert abs(out.loc[0].avg_neg_logprob - round(want0, 6)) < 1e-9
        assert abs(out.loc[1].avg_neg_logprob - round(-math.log(pa_), 6)) < 1e-9
        assert out.loc[0].n_tokens == 3 and out.loc[1].n_tokens == 1

    def test_empty_docs_dropped_and_layout_invariant(self):
        from graph_data_science_ray.functions.text import unigram_lm_scores
        texts = ["x y z", "", "   ", "x x"]
        a = unigram_lm_scores(self._ds(texts, 1)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = unigram_lm_scores(self._ds(texts, 4)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert a.doc_id.tolist() == [0, 3]  # empty/whitespace docs dropped
        assert a.equals(b)

    def test_external_counts_and_oov_floor(self):
        import math
        import pyarrow as pa
        from graph_data_science_ray.functions.text import unigram_lm_scores
        counts = pa.table({"term": ["known"], "cnt": [10]})
        out = unigram_lm_scores(self._ds(["known oovword"]), counts=counts,
                                pseudo_count=0.5).to_pandas()
        want = -(math.log(10 / 10) + math.log(0.5 / 10)) / 2
        assert abs(out.avg_neg_logprob[0] - round(want, 6)) < 1e-9

    def test_rare_tokens_score_higher(self):
        from graph_data_science_ray.functions.text import unigram_lm_scores
        common = " ".join(["the"] * 20)
        rare = "zqx wvu jkl"
        out = unigram_lm_scores(self._ds([common] * 5 + [rare])) \
            .to_pandas().set_index("doc_id")
        assert out.loc[5].avg_neg_logprob > out.loc[0].avg_neg_logprob


class TestBpeTokenCounts:
    def test_known_counts_and_duckdb_equal(self):
        import duckdb
        import pyarrow as pa
        import ray.data as rd
        from graph_data_science_ray.functions.text import (
            BPE_PRETOKEN_PATTERN, bpe_token_counts)
        texts = ["I'm here, we'll go 42 times!", "  hello   world  ", "",
                 "naïve café 3.14", "a'b''c"]
        ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                     "text": texts})).repartition(2)
        out = bpe_token_counts(ds).to_pandas().sort_values("doc_id")
        want = duckdb.connect().execute(
            "select len(regexp_extract_all(t, ?)) from (select unnest(?) as t)",
            [BPE_PRETOKEN_PATTERN, texts]).df().iloc[:, 0].tolist()
        assert out.n_bpe_tokens.tolist() == want
        assert out.n_bpe_tokens.tolist()[0] == 10  # I|'m| here|,| we|'ll| go| 42| times|!

"""Distributed TF-IDF top terms (functions/text.tfidf_top_terms) vs DuckDB."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from graph_data_science_ray.functions.text import tfidf_top_terms

SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM t),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM tok WHERE term <> '' GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
s AS (SELECT doc_id, tf.term, tf * ln({n} * 1.0 / df) AS score
      FROM tf JOIN df USING (term)),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn FROM s)
SELECT doc_id, term, score FROM r WHERE rn <= {k}
ORDER BY doc_id, score DESC, term
"""


def _docs(n=60, seed=0):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
             "iota", "kappa", "RARE", "Unique"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
             for _ in range(n)]
    texts[0] = ""          # tokenless doc: appears on neither side
    texts[1] = "   "       # whitespace-only
    texts[2] = "solo"      # df=1 term
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _oracle(df, k):
    con = duckdb.connect()
    con.register("t", df)
    return (con.execute(SQL.format(n=len(df), k=k)).df()
            .reset_index(drop=True))


def _run(df, k, num_buckets):
    ds = ray.data.from_pandas(df).repartition(4)
    out = tfidf_top_terms(ds, k, n_docs=len(df), num_buckets=num_buckets)
    return (out.to_pandas()
            .sort_values(["doc_id", "score", "term"],
                         ascending=[True, False, True])
            .reset_index(drop=True))


@pytest.mark.parametrize("k,num_buckets", [(3, 4), (5, 1), (2, 7)])
def test_matches_duckdb(k, num_buckets):
    df = _docs()
    got, exp = _run(df, k, num_buckets), _oracle(df, k)
    # numpy log vs DuckDB ln differ at the last ulp — same formula, two libms
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False,
                                  rtol=1e-12)


def test_tie_break_deterministic():
    # two terms with identical tf and df in one doc -> identical score;
    # k=1 must keep the lexicographically smaller term
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["bb aa", "aa bb"]})
    got = _run(df, 1, 3)
    assert list(got.term) == ["aa", "aa"]


def test_default_ndocs_counts_dataset():
    df = _docs(20, seed=3)
    ds = ray.data.from_pandas(df)
    out = tfidf_top_terms(ds, 2, num_buckets=3).to_pandas()
    exp = _oracle(df, 2)
    assert len(out) == len(exp)

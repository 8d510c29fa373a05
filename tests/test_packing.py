"""global_prefix_sum / pack_documents (functions/packing.py) vs numpy + DuckDB."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graph_data_science_ray.functions.packing import (global_prefix_sum,
                                                      pack_documents)


def _narrow(n=500, seed=0, shuffle=True):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64) * 3 + 7  # non-dense keys
    if shuffle:
        rng.shuffle(ids)
    vals = rng.integers(0, 100, n).astype(np.int64)
    return pd.DataFrame({"doc_id": ids, "n_tokens": vals})


def _expected(df, exclusive=True):
    s = df.sort_values("doc_id").reset_index(drop=True)
    incl = s["n_tokens"].cumsum()
    s["prefix"] = (incl - s["n_tokens"]) if exclusive else incl
    return s


@pytest.mark.parametrize("P", [1, 4, 13])
def test_prefix_matches_numpy_any_partition_count(P):
    df = _narrow()
    ds = ray.data.from_pandas(df).repartition(3)
    got = (global_prefix_sum(ds, "n_tokens", "doc_id", P=P).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _expected(df)
    pd.testing.assert_frame_equal(got[["doc_id", "n_tokens", "prefix"]],
                                  exp[["doc_id", "n_tokens", "prefix"]],
                                  check_dtype=False)


def test_inclusive_mode():
    df = _narrow(60, seed=2)
    ds = ray.data.from_pandas(df)
    got = (global_prefix_sum(ds, "n_tokens", "doc_id", exclusive=False, P=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _expected(df, exclusive=False)
    assert got["prefix"].tolist() == exp["prefix"].tolist()


def test_empty_and_single_row():
    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                      "n_tokens": pd.array([], dtype="int64")}))
    out = global_prefix_sum(empty, "n_tokens", "doc_id")
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_tokens", "prefix"}
    one = ray.data.from_pandas(pd.DataFrame({"doc_id": [5],
                                             "n_tokens": [42]}))
    got = global_prefix_sum(one, "n_tokens", "doc_id", P=4).to_pandas()
    assert got["prefix"].tolist() == [0]


def test_pack_boundary_semantics():
    # budget 10: docs of 6,6,6 tokens -> prefixes 0,6,12 -> packs 0,0,1
    # (a doc straddling a boundary belongs to the pack of its FIRST token)
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c d e f"] * 3})
    got = (pack_documents(ray.data.from_pandas(df), 10).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_tokens"].tolist() == [6, 6, 6]
    assert got["prefix"].tolist() == [0, 6, 12]
    assert got["pack_id"].tolist() == [0, 0, 1]


def test_pack_with_precomputed_token_col():
    df = _narrow(80, seed=4)
    got = (pack_documents(ray.data.from_pandas(df), 256,
                          token_col="n_tokens").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _expected(df)
    assert got["prefix"].tolist() == exp["prefix"].tolist()
    assert got["pack_id"].tolist() == (exp["prefix"] // 256).tolist()


def test_bad_budget_raises():
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        pack_documents(ds, 0)


def test_matches_duckdb_window_sum():
    rng = np.random.default_rng(9)
    texts = [" ".join(rng.choice(["a", "bb", "ccc"], rng.integers(1, 30)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    got = (pack_documents(ray.data.from_pandas(df).repartition(4), 64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
WITH tok AS (SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens
       FROM t),
p AS (SELECT doc_id, n_tokens,
       coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         AS prefix FROM tok)
SELECT doc_id, n_tokens, prefix, prefix // 64 AS pack_id
FROM p ORDER BY doc_id
""").df()
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_tokens", "prefix", "pack_id"]],
        exp, check_dtype=False)


def _collect(ds):
    import pyarrow as pa
    import ray
    tabs = [t for t in (ray.get(r) for r in ds.materialize().to_arrow_refs())
            if t.num_rows and t.num_columns]
    return pa.concat_tables(tabs) if tabs else pa.table({})


class TestGlobalOrder:
    def test_positions_match_argsort_and_keep_columns(self):
        import ray.data
        from graph_data_science_ray.functions.packing import global_order
        rng = np.random.default_rng(5)
        keys = rng.permutation(10_000).astype(np.int64) * 7  # sparse unique
        t = pa.table({"k": keys,
                      "payload": np.arange(10_000, dtype=np.int64)})
        out = _collect(global_order(
            ray.data.from_arrow(t).repartition(9), "k", P=7))
        assert set(out.column_names) == {"k", "payload", "global_pos"}
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        # pos must equal the rank of k
        np.testing.assert_array_equal(df["global_pos"].to_numpy(),
                                      np.arange(10_000))
        # payload stayed attached to its key: row built as (perm[i]*7, i)
        perm = np.random.default_rng(5).permutation(10_000).astype(np.int64)
        np.testing.assert_array_equal(
            df["k"].to_numpy(), perm[df["payload"].to_numpy()] * 7)

    def test_partition_layout_invariance(self):
        import ray.data
        from graph_data_science_ray.functions.packing import global_order
        keys = (np.arange(500, dtype=np.int64) * 13) % 10_000
        keys = np.unique(keys)  # unique by construction
        t = pa.table({"k": keys})
        a = _collect(global_order(ray.data.from_arrow(t).repartition(2),
                                  "k", P=3)).to_pandas().sort_values("k")
        b = _collect(global_order(ray.data.from_arrow(t).repartition(11),
                                  "k", P=13)).to_pandas().sort_values("k")
        np.testing.assert_array_equal(a["global_pos"].to_numpy(),
                                      b["global_pos"].to_numpy())

    def test_duplicate_keys_raise(self):
        import ray.data
        from graph_data_science_ray.functions.packing import global_order
        t = pa.table({"k": pa.array([3, 5, 3, 9], pa.int64())})
        with pytest.raises(Exception, match="duplicate order key"):
            _collect(global_order(ray.data.from_arrow(t), "k", P=1))

    def test_empty_input(self):
        import ray.data
        from graph_data_science_ray.functions.packing import global_order
        t = pa.table({"k": pa.array([], pa.int64())})
        out = _collect(global_order(ray.data.from_arrow(t), "k"))
        assert out.num_rows == 0

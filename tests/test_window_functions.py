"""Partitioned window functions (functions/relational.window_functions) vs
DuckDB's window engine on the same frame."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from graph_data_science_ray.functions.relational import window_functions

SQL = """
SELECT id, grp, ord, val,
       row_number() OVER w AS rn,
       rank() OVER (PARTITION BY grp ORDER BY ord) AS rnk,
       lag(val) OVER w AS lag_value,
       lead(val) OVER w AS lead_value,
       sum(val) OVER w AS cum_value,
       max(val) OVER w AS cum_max
FROM t WINDOW w AS (PARTITION BY grp ORDER BY ord, id)
"""


def _frame(n=500, groups=13, seed=0, str_groups=False):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, groups, n)
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "grp": [f"g{x}" for x in g] if str_groups else g.astype(np.int64),
        # coarse ord values force rank ties within groups
        "ord": rng.integers(0, 40, n).astype(np.int64),
        "val": rng.normal(size=n).round(3),
    })
    return df


def _run(df, num_buckets):
    ds = ray.data.from_pandas(df).repartition(5)
    out = window_functions(ds, partition_col="grp", order_col="ord",
                           value_col="val", tiebreak="id",
                           num_buckets=num_buckets)
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def _oracle(df):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(SQL).df().sort_values("id").reset_index(drop=True)


@pytest.mark.parametrize("str_groups,num_buckets",
                         [(False, 4), (False, 1), (True, 3)])
def test_matches_duckdb(str_groups, num_buckets):
    df = _frame(str_groups=str_groups, seed=1 if str_groups else 0)
    got, exp = _run(df, num_buckets), _oracle(df)
    got = got[exp.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  atol=1e-9, rtol=0)


def test_single_group_and_single_row():
    df = _frame(n=7, groups=1, seed=2)
    pd.testing.assert_frame_equal(_run(df, 2)[_oracle(df).columns],
                                  _oracle(df), check_dtype=False, atol=1e-9)
    df1 = _frame(n=1, groups=1)
    out = _run(df1, 2)
    assert out.loc[0, "rn"] == 1 and out.loc[0, "rnk"] == 1
    assert np.isnan(out.loc[0, "lag_value"]) and np.isnan(out.loc[0, "lead_value"])
    assert out.loc[0, "cum_value"] == out.loc[0, "val"]


def test_empty_dataset():
    df = _frame(n=0)
    ds = ray.data.from_pandas(df)
    out = window_functions(ds, partition_col="grp", order_col="ord",
                           value_col="val", tiebreak="id", num_buckets=3)
    # to_pandas() on an all-empty Dataset drops the schema (Ray quirk);
    # assert on the typed blocks instead
    blocks = [ray.get(r) for r in out.materialize().to_arrow_refs()]
    assert sum(b.num_rows for b in blocks) == 0
    for b in blocks:
        assert {"rn", "rnk", "lag_value", "lead_value", "cum_value",
                "cum_max"} <= set(b.schema.names)


def test_bucket_invariance():
    df = _frame(seed=5)
    a = _run(df, 2)
    b = _run(df, 9)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False, atol=0)

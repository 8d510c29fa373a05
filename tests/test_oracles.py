"""Driver-contract validation: every queries() entry with an oracle_sql() entry
must match DuckDB on the same parquet tables (row count + order-insensitive
values), mimicking the driver's CORRECTNESS gate at sf=0.01 semantics but run
here at sf=0.001 for speed (plus a handful at sf=0.01 in test_oracles_sf001)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(name):
    q = entrymod.queries()[name]
    res = q(SF_DIR)
    got = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    con = _duck(SF_DIR)
    exp = con.execute(entrymod.oracle_sql()[name]).df()
    got_n, exp_n = _norm(got), _norm(exp)
    assert list(got_n.columns) == list(exp_n.columns), \
        f"{name}: columns {list(got_n.columns)} vs {list(exp_n.columns)}"
    assert len(got_n) == len(exp_n), f"{name}: {len(got_n)} vs {len(exp_n)} rows"
    pd.testing.assert_frame_equal(got_n, exp_n, check_dtype=False,
                                  check_exact=False, atol=1.1e-6)


def test_rows_only_queries_run():
    for name, q in entrymod.queries().items():
        if name in entrymod.oracle_sql():
            continue
        res = q(SF_DIR)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke():
    df = entrymod.entry()
    assert len(df) > 0
    assert {"vid", "score", "component"} <= set(df.columns)

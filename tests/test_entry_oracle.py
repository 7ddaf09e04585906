"""Driver-contract check: every queries() entry runs; oracle-SQL entries
match DuckDB on the same parquet tables (sf0.01, like the driver)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(ray_session, name):
    ours = QUERIES[name](SF_DIR)
    if not isinstance(ours, pd.DataFrame):
        ours = ours.to_pandas()
    oracle = _duck(SF_DIR, ORACLES[name])
    a, b = _canon(ours), _canon(oracle)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(ray_session, name):
    res = QUERIES[name](SF_DIR)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    assert res is not None
    assert len(res.columns) > 0


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    assert len(res) >= 0 and len(res.columns) > 0

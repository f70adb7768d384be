"""Driver-contract test: every ``queries()`` entry must match its
``oracle_sql()`` twin on row count, column names, and values — the same
comparison the round driver performs (at sf0.001 here for speed; the
driver uses sf0.01)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from symtseries_spark.sources import TABLES


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(got: pd.DataFrame, exp: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(exp.columns), (
        name, sorted(got.columns), sorted(exp.columns))
    assert len(got) == len(exp), (name, len(got), len(exp))
    g, e = _normalize(got), _normalize(exp)
    for col in g.columns:
        if pd.api.types.is_float_dtype(g[col]):
            diff = (g[col].astype(float) - e[col].astype(float)).abs().max()
            assert diff < 1e-9, (name, col, diff)
        else:
            mism = (g[col].astype(str) != e[col].astype(str))
            assert not mism.any(), (
                name, col, g.loc[mism, col].head(), e.loc[mism, col].head())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "event_id", "sax_word", "dist"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ducks, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    assert sql is not None, f"{name} missing oracle"
    got = q(spark, sf_dir).toPandas()
    exp = ducks.execute(sql).df()
    assert len(got) > 0, f"{name} returned no rows"
    _compare(got, exp, name)

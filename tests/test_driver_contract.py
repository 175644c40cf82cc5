"""The driver-contract gate inside pytest: every queries() entry runs
on Spark and matches its oracle_sql() twin on DuckDB (row count,
column names, exact values — rows sorted, columns sorted by name), at
sf0.001 so `python -m pytest -x -q` alone verifies the contract
(BASELINE.json input_hint).  The external harness
(tools/check_correctness.py) runs the same comparison at sf0.01."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from facs_spark.session import get_spark

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def spark():
    yield get_spark("facs_contract_tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
                continue
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        return (math.isnan(fa) and math.isnan(fb)) or fa == fb
    return a == b


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, oracle_con, name):
    got = _normalize(entry_mod.queries()[name](spark, SF).toPandas())
    want = _normalize(oracle_con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), "column names differ"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for c in got.columns:
        for i in range(len(got)):
            assert _equal(got[c].iloc[i], want[c].iloc[i]), (
                f"{name}: column {c} row {i}: "
                f"{got[c].iloc[i]!r} != {want[c].iloc[i]!r}")


def test_rows_only_queries_run(spark):
    """Queries without an oracle still run and return a stable schema."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF)
        assert df.columns, name
        assert df.count() >= 0

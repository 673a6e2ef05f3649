"""Local replica of the driver's DuckDB-oracle check (SURVEY §5 item 5):
run every queries() entry in Spark AND its oracle_sql() in DuckDB at
sf0.01, compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(4)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    # the driver hashes values AFTER canonicalization — a DuckDB HUGEINT
    # (sum() over ints) surfacing as float64/object where Spark returns
    # int64 fails its hash even when values are equal; require matching
    # dtype kinds so oracle-SQL type drift is caught locally (round-1
    # lesson: 4 queries were value-identical but hash-mismatched)
    got_kinds = [df.dtype.kind for _, df in got.items()]
    want_kinds = [df.dtype.kind for _, df in want.items()]
    assert got_kinds == want_kinds, (
        f"{name}: dtype kinds {got_kinds} vs {want_kinds} "
        f"({dict(got.dtypes)} vs {dict(want.dtypes)})"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-4)


def test_rows_only_queries_run(spark):
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        n = qs[name](spark, SF_DIR).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "cluster_id"}

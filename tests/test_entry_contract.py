"""Replicates the driver's correctness gate: run every queries() entry on
sf0.01 and compare row count + order-insensitive values against the DuckDB
oracle_sql() on the same parquet tables."""

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", list(entry.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    res = ddb.execute(entry.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (spark_cols, ddb_cols)
    assert len(spark_rows) == len(ddb_rows)
    assert _canon(spark_rows, spark_cols) == _canon(ddb_rows, ddb_cols)


@pytest.mark.parametrize("name", [n for n in entry.queries()
                                  if n not in entry.oracle_sql()])
def test_rows_only_queries_run(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"column", "codec", "bytes_in", "bytes_out"} <= set(df.columns)

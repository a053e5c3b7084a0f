"""Driver-contract gate, run locally: every queries() entry must match its
oracle_sql() in DuckDB on the same parquet (row count + column names +
order-insensitive values), mirroring CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "tolist"):
            return tuple(v.tolist())
        if isinstance(v, list):
            return tuple(v)
        return v

    for c in pdf.columns:
        pdf[c] = pdf[c].map(norm_cell)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    spark_pdf = q(spark, SF_DIR).toPandas()
    if sql is None:
        # genuinely non-SQL-expressible op (e.g. iterative KMeans in
        # knn_ivf): the driver records the weaker rows-only check
        assert len(spark_pdf) > 0, f"{name}: oracle-less query returned no rows"
        return
    duck_pdf = duck.sql(sql).df()

    assert len(spark_pdf) == len(duck_pdf), f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

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


def test_docs_repetition_long_document_linear(spark, tmp_path):
    """Round-3 fix: max_word_freq must be linear in document length.

    A 20k-word web document under the old per-row expression form
    (per-distinct-word filter over the whole words array) does ~10^8
    comparisons inside ONE task; the explode+groupBy form streams it.
    Exact-value check on a constructed doc plus a generous wall bound
    that the quadratic form cannot meet."""
    import time

    import pandas as pd

    words = (["the"] * 700 + [f"w{i}" for i in range(19300)]) * 1
    rng = __import__("random").Random(7)
    rng.shuffle(words)
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [" ".join(words), "tiny tiny doc"],
            "lang": ["en", "en"],
            "source": ["web", "web"],
            "n_chars": [0, 0],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    t0 = time.monotonic()
    rows = {
        r.doc_id: r
        for r in entry_mod.queries()["docs_repetition"](spark, str(tmp_path)).collect()
    }
    wall = time.monotonic() - t0
    assert rows[1].n_words == 20000
    assert rows[1].n_distinct_words == 19301
    assert rows[1].max_word_freq == 700
    assert rows[2].n_words == 3
    assert rows[2].n_distinct_words == 2
    assert rows[2].max_word_freq == 2
    assert wall < 20, f"docs_repetition took {wall:.1f}s on one 20k-word doc"

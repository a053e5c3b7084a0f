"""Test helpers: golden comparison utilities."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def final_as_pandas(df: DataFrame) -> pd.DataFrame:
    """Project engine output to the golden comparison columns."""
    pdf = df.select("doc_id", "tokens", "n_tok", "source", "_ab_lsn").toPandas()
    pdf["tokens"] = pdf["tokens"].map(lambda a: None if a is None else [int(x) for x in a])
    pdf["n_tok"] = pdf["n_tok"].astype("Int64")
    pdf["_ab_lsn"] = pdf["_ab_lsn"].astype("int64")
    return pdf.sort_values("doc_id").reset_index(drop=True)


def golden_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["tokens"] = out["tokens"].map(lambda a: None if a is None else [int(x) for x in a])
    out["n_tok"] = out["n_tok"].astype("Int64")
    out["_ab_lsn"] = out["_ab_lsn"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_frames_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    assert len(actual) == len(expected), f"row count {len(actual)} != {len(expected)}"
    pd.testing.assert_frame_equal(actual, expected, check_dtype=False)

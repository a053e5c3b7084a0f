"""Unicode text normalization — NFC + control-strip + whitespace collapse.

The standard first stage of a web-corpus cleanup (CCNet/C4 lineage):
decomposed accents (e + U+0301) must equal their composed forms before ANY
hashing/dedup/tokenization, else the same text fingerprints differently;
stray C0/C1 controls and run-on whitespace poison quality signals.

Spark-first shape: control-char strip and whitespace collapse are JVM
``regexp_replace`` (whole-stage codegen, zero Python); NFC normalization
has NO JVM builtin, so it is the one honest Arrow pandas UDF in the chain
(batched columnar transfer; Python's ``unicodedata.normalize`` implements
the same Unicode standard DuckDB's ``nfc_normalize`` oracle does). The
whole chain is a NARROW projection — zero shuffles at any corpus size.

Regexes are character-class-only (Java regex == RE2), same dialect
discipline as plans/textsql.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0 controls except \t \n \r, plus DEL — stripped outright
CONTROL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
#: horizontal whitespace runs -> single space (newlines preserved)
HSPACE_CLASS = "[ \\t]+"


def _nfc_series(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def nfc_normalize_udf(col: Column) -> Column:
    # pandas_udf built per call: the decorator form parses its DDL at
    # import time and would require an active SparkSession just to import
    # this module
    return F.pandas_udf(_nfc_series, "string")(col)


def unicode_clean(col: Column) -> Column:
    """strip controls -> collapse horizontal whitespace -> trim -> NFC."""
    out = F.regexp_replace(col, CONTROL_CLASS, "")
    out = F.regexp_replace(out, HSPACE_CLASS, " ")
    return nfc_normalize_udf(F.trim(out))


def clean_text(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    return df.withColumn(out_col or text_col, unicode_clean(F.col(text_col)))


def clean_sql(expr: str) -> str:
    """DuckDB expression mirroring :func:`unicode_clean` exactly (same op
    order; DuckDB regexp_replace needs the explicit 'g' flag)."""
    out = f"regexp_replace({expr}, '{CONTROL_CLASS}', '', 'g')"
    out = f"regexp_replace({out}, '{HSPACE_CLASS}', ' ', 'g')"
    return f"nfc_normalize(trim({out}))"

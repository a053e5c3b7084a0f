"""Identifier standardization — the NamingConventionTransformer analog.

Reference semantics: destinations sanitize stream/column names before DDL —
`StandardNameTransformer` replaces every character outside [A-Za-z0-9_]
with underscore and guards identifiers that start with a digit
(airbyte-cdk/java/airbyte-cdk/core/src/main/java/io/airbyte/cdk/
integrations/destination/StandardNameTransformer.java); `CatalogParser`
resolves the collisions sanitization creates by suffixing a counter
(airbyte-cdk/java/airbyte-cdk/typing-deduping/src/main/java/io/airbyte/
integrations/base/destination/typing_deduping/CatalogParser.java).

Spark mapping: pure column renames (`toDF`) — metadata-only, no data
movement; weird source names survive end-to-end because parquet stores
arbitrary identifiers (covered separately by
tests/test_schema_evolution.py::test_weird_column_names_evolve_and_apply).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_INVALID = re.compile(r"[^A-Za-z0-9_]")


def standardize_identifier(name: str) -> str:
    """One identifier -> destination-safe form: invalid chars to ``_``,
    leading digit guarded with ``_``, empty input becomes ``_``."""
    out = _INVALID.sub("_", name)
    if not out:
        return "_"
    if out[0].isdigit():
        out = "_" + out
    return out


def standardize_columns(df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
    """Rename every column to its standardized identifier, resolving the
    collisions sanitization creates with ``_1``, ``_2``, ... suffixes (in
    column order, like CatalogParser's counter resolution). Returns
    (renamed df, original -> final mapping)."""
    mapping: dict[str, str] = {}
    used: set[str] = set()
    for col in df.columns:
        base = standardize_identifier(col)
        final = base
        i = 0
        while final in used:
            i += 1
            final = f"{base}_{i}"
        used.add(final)
        mapping[col] = final
    return df.toDF(*[mapping[c] for c in df.columns]), mapping

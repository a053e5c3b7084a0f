"""Markdown → plain text, as ONE whole-stage-codegen projection.

The curation front door: `sources/unstructured.py` lands every document as
markdown (reference record shape, unstructured_parser.py:130-135); the
§2.9b quality / dedup / tokenize operators want prose. This strips the
markdown syntax with a fixed chain of regexp_replace rules — pure Catalyst
(zero Python, zero shuffles, narrow plan), and every rule is RE2-safe so
the SAME chain renders as a DuckDB oracle for exact cross-engine gating.

Rule order matters and is part of the contract: fences before inline code
(a fence is not three inline codes), images before links (an image IS a
bracket-paren form), bold before italic (``**`` contains ``*``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, spark_replacement, duckdb_replacement) — patterns avoid
#: backreferences/lookaround so Java regex and RE2 agree; only the
#: capture-group replacement syntax differs ($1 vs \1).
_RULES: list[tuple[str, str, str]] = [
    # fenced code blocks drop entirely ([^`] spans newlines in both engines)
    (r"```[^`]*```", "", ""),
    # inline code keeps its text
    (r"`([^`\n]+)`", "$1", r"\1"),
    # images drop entirely (alt text is not prose)
    (r"!\[[^\]]*\]\([^)]*\)", "", ""),
    # links keep the anchor text
    (r"\[([^\]]*)\]\([^)]*\)", "$1", r"\1"),
    # bold / italic keep their text (bold first: ** contains *)
    (r"\*\*([^*\n]+)\*\*", "$1", r"\1"),
    (r"\*([^*\n]+)\*", "$1", r"\1"),
    # line-anchored decorations: headings, list bullets, blockquotes
    (r"(?m)^#{1,6}[ \t]+", "", ""),
    (r"(?m)^[-*+][ \t]+", "", ""),
    (r"(?m)^>[ \t]?", "", ""),
    # collapse the blank-line runs the removals leave behind
    (r"\n{3,}", "\n\n", "\n\n"),
]


def strip_markdown(col: Column | str) -> Column:
    """Markdown column → plain text (Spark side of the contract)."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, repl, _ in _RULES:
        out = F.regexp_replace(out, pattern, repl)
    return F.trim(out)


def strip_markdown_sql(expr: str) -> str:
    """The SAME rule chain as a DuckDB scalar expression over ``expr``
    (RE2 + 'g' flag; \\1 replacement syntax) — the oracle twin."""

    def _q(s: str) -> str:
        # regular (non-E) SQL literal: backslashes pass through verbatim to
        # RE2, real newline chars embed legally; only quotes need doubling
        return "'" + s.replace("'", "''") + "'"

    out = expr
    for pattern, _, repl in _RULES:
        out = f"regexp_replace({out}, {_q(pattern)}, {_q(repl)}, 'g')"
    return f"trim({out})"

"""URL canonicalization + URL-level dedup — web-corpus hygiene primitives.

A crawl-derived training corpus dedups first by URL: the same page is
fetched under scheme/case variants, default ports, tracking parameters
(utm_*, fbclid, gclid), unsorted query strings and fragments. Canonicalize
then min-witness per canonical form (CCNet/C4-style pre-dedup before any
content hashing).

Spark-first shape: canonicalization is a PURE NARROW projection (regex
extracts + array ops, whole-stage codegen, zero Python, zero shuffle at
any corpus size); URL dedup is one hash aggregate on the canonical string
(map-side partials). Regexes use character classes only, so Java regex
(Spark) and RE2 (DuckDB oracle) agree byte-for-byte — same dialect
discipline as plans/textsql.py.

Scope note (honest): the registrable-domain extraction is the naive
last-two-labels rule, NOT the Public Suffix List — "a.b.co.uk" yields
"co.uk". A production system broadcast-joins a PSL table; the plan shape
is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters stripped during canonicalization (tracking noise)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref_src")


def _tracking_pred(x: Column) -> Column:
    keep = F.lit(True)
    for p in TRACKING_PREFIXES:
        keep = keep & ~x.startswith(p)
    return keep


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped,
    'www.' stripped, tracking params dropped, remaining params sorted,
    fragment removed. Pure expression — fuses into the caller's scan."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    host = F.lower(F.regexp_extract(no_frag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    host = F.regexp_replace(host, ":(443|80)$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_extract(no_frag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    query = F.regexp_extract(no_frag, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & _tracking_pred(x),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def registrable_domain(host_or_canonical: Column) -> Column:
    """Naive registrable domain (last two labels) from a canonical URL."""
    host = F.regexp_extract(host_or_canonical, "^https://([^/?]*)", 1)
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)


def url_dedup(df: DataFrame, url_col: str, id_col: str = "doc_id") -> DataFrame:
    """Min-witness URL dedup: canonicalize, keep the smallest id per
    canonical form. Output: (id, url_canonical, domain, keep).

    ONE exchange (hash agg on the canonical string, map-side partials) +
    the keeper broadcast/shuffle join back; at corpus scale the join key
    is the canonical URL — never page content.
    """
    canon = df.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("url_canonical"),
    ).withColumn("domain", registrable_domain(F.col("url_canonical")))
    keepers = canon.groupBy("url_canonical").agg(
        F.min(id_col).alias("_keeper")
    )
    return (
        canon.join(keepers, "url_canonical")
        .select(
            id_col,
            "url_canonical",
            "domain",
            (F.col(id_col) == F.col("_keeper")).alias("keep"),
        )
    )


# ----------------------------------------------------------------- oracle

def canonicalize_sql(url_expr: str) -> str:
    """DuckDB expression mirroring :func:`canonicalize_url` exactly
    (character-class-only regexes; list ops mirror the array ops)."""
    no_frag = f"regexp_replace({url_expr}, '#.*$', '')"
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({no_frag}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)), ':(443|80)$', ''), "
        f"'^www\\.', '')"
    )
    path = (
        f"regexp_extract({no_frag}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1)"
    )
    query = f"regexp_extract({no_frag}, '\\?(.*)$', 1)"
    not_tracking = " AND ".join(
        f"NOT starts_with(x, '{p}')" for p in TRACKING_PREFIXES
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x != '' AND {not_tracking}))"
    )
    qs = f"array_to_string({params}, '&')"
    return (
        f"'https://' || {host} || {path} || "
        f"(CASE WHEN {qs} != '' THEN '?' || {qs} ELSE '' END)"
    )


def domain_sql(canonical_expr: str) -> str:
    return (
        f"regexp_extract(regexp_extract({canonical_expr}, "
        f"'^https://([^/?]*)', 1), '([^.]+\\.[^.]+)$', 1)"
    )

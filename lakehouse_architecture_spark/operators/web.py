"""URL canonicalization and dedup for web-crawl corpora.

A crawl corpus reaches the same page under many spellings — scheme/host
case, default ports, ``www.`` prefixes, fragments, tracking parameters,
query-parameter order, trailing slashes. Canonicalizing before URL-level
dedup is standard crawl hygiene (the reference's crawler keeps a seen-ID
ledger per listing URL, ``app/bronze.py``; at corpus scale the ledger only
works if the key is canonical).

Everything here is pure Catalyst string/array expressions — a narrow map
with no Python, no UDFs, no shuffle. Canonicalization therefore fuses into
whatever scan feeds it and costs one codegen stage at 100 TB. The regex
subset used (character classes, anchors, alternation) is shared by Java and
RE2-family engines, which keeps every step oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify content (analytics/click tracking).
TRACKING_PARAMS = (
    "utm_[^=&]*",
    "gclid",
    "fbclid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "ref",
)

_TRACKING_RE = "^(" + "|".join(TRACKING_PARAMS) + ")="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL:

    * scheme and host lowercased (path/query case is significant and kept)
    * ``www.`` host prefix dropped
    * default ports stripped (``:80`` for http, ``:443`` for https)
    * fragment dropped
    * tracking query parameters dropped (:data:`TRACKING_PARAMS`)
    * remaining query parameters sorted
    * trailing slashes trimmed from the path

    Malformed URLs (no ``scheme://host``) pass through unchanged — a
    filter on :func:`is_valid_url` separates them when needed.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")  # fragment
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1)
    path = F.regexp_replace(path, "/+$", "")
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(u)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB text equivalent of :func:`canonicalize_url` (oracle mirror)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    base = f"regexp_extract({u}, '^([^?]*)', 1)"
    query = f"regexp_extract({u}, '\\?(.*)$', 1)"
    scheme = f"lower(regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (
        "regexp_replace(lower(regexp_extract("
        f"{base}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1)), '^www\\.', '')"
    )
    hostport = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80'"
        f" THEN regexp_replace({hostport}, ':80$', '')"
        f" WHEN {scheme} = 'https' AND {hostport} LIKE '%:443'"
        f" THEN regexp_replace({hostport}, ':443$', '')"
        f" ELSE {hostport} END"
    )
    path = (
        f"regexp_replace(regexp_extract({base},"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$', 1), '/+$', '')"
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    qs = f"array_to_string({params}, '&')"
    canon = (
        f"{scheme} || '://' || {hostport} || {path}"
        f" || CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END"
    )
    return f"CASE WHEN {scheme} <> '' THEN {canon} ELSE {expr} END"


def is_valid_url(url: Column | str) -> Column:
    """True when the value has a ``scheme://host`` shape."""
    u = F.col(url) if isinstance(url, str) else url
    return u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+")


def url_dedup(df: DataFrame, url_col: str, order_col: str) -> DataFrame:
    """Keep one row per canonical URL (lowest ``order_col`` wins) — the
    min-struct hash-aggregate form, one shuffle, no window sort."""
    from lakehouse_architecture_spark.operators.dedup import dedup_keep_first

    withc = df.withColumn("canonical_url", canonicalize_url(url_col))
    return dedup_keep_first(withc, ["canonical_url"], order_col)

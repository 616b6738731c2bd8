"""URL canonicalization — a pure Catalyst expression chain, no UDFs.

The web-crawl half of a training-data pipeline dedups documents by
canonical URL before any content hashing (the reference's ingestion
keys documents by their source URI: see uri handling in
lambdas/html_to_orpml/html_to_orpml.py and the id hash in
misc/stream_update_process/utils/functions.py:5-8); crawl URLs arrive
in dozens of trivially-different spellings. ``canonical_url`` folds
the standard equivalence classes (RFC 3986 §6 normalization plus the
tracking-parameter scrub every crawl pipeline applies):

- scheme and host lowercased; userinfo and trailing host dot dropped;
  leading ``www.`` dropped; default ports (``:80`` http / ``:443``
  https) dropped
- fragment dropped
- path: duplicate slashes collapsed, trailing slashes dropped, empty
  path becomes ``/``
- query: ``utm_*`` / ``gclid`` / ``fbclid`` tracking params removed,
  remaining params sorted bytewise, empty query dropped

Contract: input is an absolute ``scheme://...`` URL (the engine's
crawl sources always produce one); anything without ``://`` passes
through the same chain with an empty scheme/host, which keeps the
expression total (no nulls introduced).

Every step is a built-in string/regex/array expression, so the whole
chain stays inside whole-stage codegen at 100 TB, and the DuckDB twin
(:func:`canonical_url_sql`) mirrors it step for step for hash-grade
oracle checks (RE2 backreferences ``\\1`` vs Java ``$1`` are the only
dialect difference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"(utm_[A-Za-z0-9_]+|gclid|fbclid)"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL (see module docstring)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(after, r"^([^/?#]*)", 1)
    pathq = F.substring(after, F.length(hostport) + F.lit(1), F.lit(1 << 30))
    host = F.lower(hostport)
    host = F.regexp_replace(host, r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r"\.$", "")  # trailing dot
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(
            host
        )
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_replace(pathq, r"^[^?]*\??", "")
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_replace(query, r"(^|&)" + _TRACKING + r"=[^&]*", r"$1")
    q = F.regexp_replace(q, r"&{2,}", "&")
    q = F.regexp_replace(q, r"^&+|&+$", "")
    q = F.when(q == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.sort_array(F.split(q, "&")), "&"))
    )
    return F.concat(scheme, F.lit("://"), host, path, q)


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` — identical step order."""
    u = f"trim({expr})"
    u = f"regexp_replace({u}, '#.*$', '', 'g')"
    scheme = (
        f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    )
    after = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '', 'g')"
    hostport = f"regexp_extract({after}, '^([^/?#]*)', 1)"
    pathq = f"substr({after}, length({hostport}) + 1)"
    host = f"lower({hostport})"
    host = f"regexp_replace({host}, '^[^@]*@', '', 'g')"
    host = f"regexp_replace({host}, '\\.$', '', 'g')"
    host = f"regexp_replace({host}, '^www\\.', '', 'g')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '')"
        f" ELSE {host} END"
    )
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = f"regexp_replace({pathq}, '^[^?]*\\??', '')"
    path = f"regexp_replace({path}, '/{{2,}}', '/', 'g')"
    path = f"regexp_replace({path}, '/+$', '', 'g')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = (
        f"regexp_replace({query}, '(^|&){_TRACKING}=[^&]*', '\\1', 'g')"
    )
    q = f"regexp_replace({q}, '&{{2,}}', '&', 'g')"
    q = f"regexp_replace({q}, '^&+|&+$', '', 'g')"
    q = (
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || "
        f"array_to_string(list_sort(string_split({q}, '&')), '&') END"
    )
    return f"{scheme} || '://' || {host} || {path} || {q}"

"""URL canonicalization — the dedup key a Common-Crawl-style pipeline
groups pages by before any content dedup runs: the same resource is
fetched as `HTTP://WWW.Site.COM:80/a//b/?utm_source=x&b=2&a=1#frag` and
`http://www.site.com/a/b?a=1&b=2`, and url-level dedup only works if
both map to one canonical string.

Rules (RFC 3986 normalization plus the standard tracking-param strip):
scheme and host lowercase; default port dropped (:80 for http, :443
for https — a NON-default port is kept); fragment dropped; duplicate
path slashes collapsed; trailing path slash dropped (except the root
path); tracking params (utm_*, fbclid, gclid) removed; remaining query
params sorted byte-wise; empty query dropped. The PATH case is
preserved (paths are case-sensitive per the RFC). Inputs WITHOUT a
parseable ``scheme://host`` (relative URLs, mailto:, bare hostnames)
pass through UNCHANGED — they must not collapse onto a shared garbage
key like '://' + path, or url-level dedup would merge unrelated pages.

Scale shape: one pure-Catalyst projection — regexp extracts/replaces
plus a split → filter → array_sort → join chain for the query params,
all inside whole-stage codegen. Zero exchanges, zero Python; every rule
is a deterministic string function DuckDB replays verbatim.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` as a single Catalyst expression."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(
            (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
        )
        .when((scheme == "https"), F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    collapsed = F.regexp_replace(raw_path, "/{2,}", "/")
    path = F.when(collapsed == "", F.lit("/")).otherwise(
        F.regexp_replace(collapsed, "(.)/$", "$1")
    )
    query = F.regexp_extract(nofrag, "\\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    # unparseable (no scheme://host) → pass through, never a shared key
    return F.when(scheme == "", url).otherwise(canon)


def canonicalize_urls(
    pages: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """All input columns + the canonical url and its host (the group-by
    keys for url-level dedup and host-level skew statistics)."""
    canon = canonical_url(F.col(url_col))
    return pages.withColumn(out_col, canon).withColumn(
        "host", F.regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    )

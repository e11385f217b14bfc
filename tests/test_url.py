"""URL canonicalization (operators/url.py): rule-by-rule table of messy
inputs vs their canonical form, idempotence, host extraction."""
from __future__ import annotations

from post_ocr_corretion_spark.operators.url import canonicalize_urls

CASES = [
    # scheme+host lowercase, default port, dup slashes, trailing slash,
    # tracking strip, param sort, fragment
    (
        "HTTP://WWW.Site.COM:80/a//b/?utm_source=x&b=2&a=1#f",
        "http://www.site.com/a/b?a=1&b=2",
        "www.site.com",
    ),
    ("https://Host.com:443/", "https://host.com/", "host.com"),
    # NON-default port kept; :443 on http is NOT default -> kept
    ("https://host.com:8080/x", "https://host.com:8080/x", "host.com"),
    ("http://host.com:443/x", "http://host.com:443/x", "host.com"),
    # empty path -> root
    ("http://h.com", "http://h.com/", "h.com"),
    # only-tracking query dropped entirely
    ("http://h.com/?utm_source=only&utm_medium=m", "http://h.com/", "h.com"),
    ("http://h.com/a?fbclid=1&z=9&a=2", "http://h.com/a?a=2&z=9", "h.com"),
    # root path keeps its slash even when collapsed from //
    ("http://h.com//", "http://h.com/", "h.com"),
    # path case preserved
    ("https://H.com/CaseSensitive/Path", "https://h.com/CaseSensitive/Path", "h.com"),
    # UNPARSEABLE inputs (no scheme://host) pass through UNCHANGED —
    # they must not collapse onto a shared '://'-garbage key (ADVICE r7)
    ("mailto:User@Example.COM", "mailto:User@Example.COM", ""),
    ("relative/Path//x?utm_source=s", "relative/Path//x?utm_source=s", ""),
    ("example.com/bare-host", "example.com/bare-host", ""),
    ("/rooted/but/schemeless", "/rooted/but/schemeless", ""),
]


def test_unparseable_urls_stay_distinct(spark):
    """Distinct malformed inputs keep distinct dedup keys (pre-fix they
    all collapsed onto '://'-prefixed garbage)."""
    bad = [(i, u) for i, u in enumerate(
        ["mailto:a@x", "mailto:b@y", "rel/one", "rel/two", "/three"]
    )]
    pages = spark.createDataFrame(bad, "doc_id long, url string")
    out = canonicalize_urls(pages).collect()
    assert {r.canonical_url for r in out} == {u for _, u in bad}
    assert all(r.host == "" for r in out)


def test_canonicalization_table(spark):
    pages = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "doc_id long, url string"
    )
    out = {r.doc_id: r for r in canonicalize_urls(pages).collect()}
    for i, (url, want, want_host) in enumerate(CASES):
        assert out[i].canonical_url == want, url
        assert out[i].host == want_host, url


def test_idempotent(spark):
    pages = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "doc_id long, url string"
    )
    once = canonicalize_urls(pages).select("doc_id", "canonical_url")
    twice = {
        r.doc_id: r.canonical_url
        for r in canonicalize_urls(
            once.withColumnRenamed("canonical_url", "url")
        ).collect()
    }
    for r in once.collect():
        assert twice[r.doc_id] == r.canonical_url


def test_same_resource_same_key(spark):
    variants = [
        (1, "HTTP://Site.com:80/a//b?b=2&a=1&utm_source=s#x"),
        (2, "http://site.com/a/b/?a=1&b=2"),
        (3, "http://site.com/a/b?b=2&a=1"),
    ]
    pages = spark.createDataFrame(variants, "doc_id long, url string")
    keys = {r.canonical_url for r in canonicalize_urls(pages).collect()}
    assert keys == {"http://site.com/a/b?a=1&b=2"}

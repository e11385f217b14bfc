"""Fast-path HTML scanner (core/fasthtml.py) parity: it must either
produce EXACTLY the stdlib _BlockExtractor's block stream or decline
(None) — never silently differ. Three layers: the whole generated
corpus, an adversarial construct table, and hypothesis tag soup."""
from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from post_ocr_corretion_spark.core.extraction import BLOCK_TAGS, PRUNE_TAGS, _BlockExtractor
from post_ocr_corretion_spark.core.fasthtml import blocks_stdlib, scan_blocks
from post_ocr_corretion_spark.datagen.webpages import make_page


def _both(raw: str):
    fast = scan_blocks(raw, PRUNE_TAGS, BLOCK_TAGS)
    std = blocks_stdlib(raw, _BlockExtractor)
    return fast, std


def test_corpus_wide_parity_and_fast_path_taken():
    """Every generated html page: the scanner must HANDLE it (no
    fallback — otherwise the speedup silently evaporates) and match the
    stdlib blocks tuple-for-tuple."""
    n = 0
    for sf in ["sf0.001", "sf0.01"]:
        for r in pq.read_table(f"/root/testdata/{sf}/documents.parquet").to_pylist():
            html = make_page(r["doc_id"], r["text"], r["lang"])["html"]
            if html.startswith(b"%PDF"):
                continue
            raw = html.decode("utf-8", errors="replace")
            fast, std = _both(raw)
            assert fast is not None, f"corpus page fell off the fast path: doc {r['doc_id']}"
            assert fast == std, f"divergence on doc {r['doc_id']}"
            n += 1
    assert n > 900


ADVERSARIAL = [
    # inside the subset → must match stdlib exactly
    "<p>hello world</p>",
    "<div><p>a b c</p><p>d e</p></div>",
    '<body><a href="/x">link text</a> free text<p>para</p></body>',
    "<ul><li>one</li><li>two</li></ul>",
    "<script>var x = '<p>not a tag</p>';</script><p>real</p>",
    "<style>.c{}</style><p>after style</p>",
    "<p>a < b and c</p>",             # literal '<' as data
    "<br/><p>self closing</p>",
    '<p class="big" id=\'x\' data-v=3>attrs</p>',
    '<a href="weird>quote">in-quote gt</a><p>tail text here</p>',
    "<P>UPPER TAG</P>",
    "text with no tags at all",
    "",
    "<nav><p>pruned</p></nav><p>kept body text</p>",
    "<div>unclosed div<p>para",
    "</p>stray end tag<p>x</p>",
    # outside the subset → must DECLINE (None), never differ
    "<!-- comment --><p>x</p>",
    "<!DOCTYPE html><p>x</p>",
    "<?php echo 1 ?><p>x</p>",
    "<p>a &amp; b</p>",
    "<p>fish &lt tag</p>",
    "<script>open ended",
    "<SCRIPT>var y;</SCRIPT>",
    # stdlib ends CDATA on r'</\s*name\s*>' — whitespace forms must
    # decline, not sail past to a later exact closer (ADVICE r5, high)
    "<script>x</ script>leaked body text</script><p>tail</p>",
    "<style>.c{}</ style>leak</style><p>tail</p>",
    "<script>x</script >more</script><p>t</p>",
    "<script>x</ScRiPt>more</script><p>t</p>",
    "<p>trailing lt <",
    "<p attr=<bad>>x</p>",
    "<p",
    "<p><a href='a<b'>q</a></p>",
]


@pytest.mark.parametrize("raw", ADVERSARIAL)
def test_adversarial_match_or_decline(raw):
    fast, std = _both(raw)
    if fast is not None:
        assert fast == std, f"divergence on {raw!r}"


def test_hypothesis_tag_soup_matches_or_declines():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.one_of(
        st.sampled_from(
            [
                "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
                "<nav>", "</nav>", "<script>", "</script>", "<br/>", "<b>",
                "<!-- c -->", "&amp;", "<", ">", "<P >", "</ p>", "<p",
            ]
        ),
        st.text(alphabet="ab <>&/!-='\"px", min_size=0, max_size=12),
    )
    soup = st.lists(frag, min_size=0, max_size=12).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(soup)
    def run(raw):
        fast, std = _both(raw)
        if fast is not None:
            assert fast == std, f"divergence on {raw!r}"

    run()

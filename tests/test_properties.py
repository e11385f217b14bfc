"""Property-based tests (hypothesis) over the pure core — each checks a
pinned implementation against an independent formulation or an invariant
that must hold for ALL inputs, not just the fixture corpus."""
from __future__ import annotations

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdefgh012_'-.", min_size=0, max_size=7)
LEX_WORD = st.text(alphabet="abcdefgh012_", min_size=1, max_size=6)


def _dp_levenshtein_indel(a: str, b: str) -> int:
    """Independent O(n·m) indel-only (LCS-based) distance."""
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1]
            else:
                cur[j] = 1 + min(prev[j], cur[j - 1])
        prev = cur
    return prev[m]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=24), st.text(max_size=24))
def test_indel_ratio_matches_independent_dp(a, b):
    from post_ocr_corretion_spark.core.levenshtein import indel_ratio

    # mirror the pinned processor=str.lower (lowering may change lengths)
    a2, b2 = a.lower(), b.lower()
    total = len(a2) + len(b2)
    want = 1.0 if total == 0 else (total - _dp_levenshtein_indel(a2, b2)) / total
    got = indel_ratio(a, b)
    assert abs(got - want) < 1e-12
    assert 0.0 <= got <= 1.0
    if a == b:
        assert got == 1.0


@settings(max_examples=100, deadline=None)
@given(WORD, st.frozensets(LEX_WORD, min_size=0, max_size=40))
def test_deletion_index_equals_direct_probing(word, lexicon):
    from post_ocr_corretion_spark.core.candidates import (
        build_deletion_index,
        distance1_matches,
        distance1_matches_indexed,
        get_alternative_word,
    )

    w = word.lower()
    idx = build_deletion_index(lexicon)
    if w:
        assert distance1_matches_indexed(w, lexicon, idx) == distance1_matches(w, lexicon)
    assert get_alternative_word(w or "a", lexicon, delidx=idx) == get_alternative_word(
        w or "a", lexicon
    )


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcd", min_size=1, max_size=3),
    st.frozensets(st.text(alphabet="abcd", min_size=1, max_size=5), min_size=0, max_size=12),
)
def test_distance2_frontier_vs_bruteforce_two_ops(word, lexicon):
    """d2 fixpoint output == unconditional ∪ (1-op ∪ 2-op strings found in
    the lexicon with path-product scores), when the count guard is off."""
    from post_ocr_corretion_spark.core.candidates import (
        get_alternative_word,
        one_op_strings,
        remove_punctuation,
    )

    w = word
    got = get_alternative_word(w, lexicon, max_distance=2, words_for_generation=10**9)
    nop = remove_punctuation(w)
    want = {(w, 1.0), (nop, 1.0)}
    frontier = {(b, 1.0) for b in {w, nop} if b}
    for _ in range(2):
        grown = set()
        for s, sc in frontier:
            for t, osc in one_op_strings(s):
                grown.add((t, sc * osc))
        frontier |= grown
        want |= {(t, sc) for t, sc in frontier if t and t in lexicon}
    assert got == want


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="ab c\t\n\rx", max_size=30))
def test_core_sentence_words_is_str_split(text):
    from post_ocr_corretion_spark.core.textops import sentence_words

    assert sentence_words(text) == text.split()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_random(h, w, c, seed):
    from post_ocr_corretion_spark.core.media import decode_png, encode_png

    img = np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.floats(min_value=0.01, max_value=100.0), min_size=1, max_size=10),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=10**6),
)
def test_roulette_invariants(weights, k, seed):
    """roulette_select always returns min(k, n) DISTINCT items, all drawn
    from the input, for any positive weights and any seed."""
    from post_ocr_corretion_spark.core.beam import roulette_select

    items = [(i, wt) for i, wt in enumerate(weights)]
    out = roulette_select(items, k, lambda t: t[1], random.Random(seed))
    assert len(out) == min(k, len(items))
    assert len({id(x) for x in out}) == len(out)
    assert all(x in items for x in out)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcde", max_size=20))
def test_segmenter_decode_is_total_and_lossless(text):
    """Viterbi segmentation is a total decode: joining the output words
    reproduces the de-spaced input exactly."""
    from post_ocr_corretion_spark.core.segmenter import ViterbiSegmenter

    seg = ViterbiSegmenter({"ab": 5, "cde": 3, "a": 2})
    out = seg.segment(text)
    assert "".join(out) == text
    assert all(tok for tok in out)


@settings(max_examples=120, deadline=None)
@given(
    st.text(
        alphabet="<>/ab p&;#\"'=!-\n\t",
        max_size=200,
    )
)
def test_extract_html_total_on_malformed_input(junk):
    """The extractor never raises on arbitrary tag soup, and every span
    stays within the decoded document bounds with s < e."""
    from post_ocr_corretion_spark.core.extraction import extract_html

    raw = ("<html><body><p>" + junk + "</p></body></html>").encode()
    text, spans = extract_html(raw)
    n = len(raw.decode("utf-8", errors="replace"))
    assert isinstance(text, str)
    for s, e in spans:
        assert 0 <= s < e <= n


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=120))
def test_extract_document_total_on_arbitrary_bytes(blob):
    """extract_document is total over arbitrary bytes (html fallback or
    pdf stub), never raising."""
    from post_ocr_corretion_spark.core.extraction import extract_document

    text, spans, kind = extract_document(blob)
    assert kind in ("html", "pdf_fake", "pdf_real", "pdf_stub")
    assert isinstance(text, str) and isinstance(spans, list)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),
            st.integers(min_value=0, max_value=700),
            st.text(alphabet="ab c()\\%<>[]#", min_size=0, max_size=15),
        ),
        max_size=5,
    )
)
def test_pdf_roundtrip_arbitrary_text(lines):
    """PDF write→parse round-trips arbitrary text payloads (parens,
    backslashes, PDF delimiter chars) and recovers (y desc, x asc)
    reading order."""
    from post_ocr_corretion_spark.core.pdf import build_simple_pdf, extract_pdf_real

    placed = [(float(x), float(y), t) for x, y, t in lines]
    pdf = build_simple_pdf(placed)
    text, spans = extract_pdf_real(pdf)
    ordered = sorted(placed, key=lambda p: (-p[1], p[0]))
    assert text == "\n".join(t for _, _, t in ordered)
    assert len(spans) == len([1 for _ in placed])
    # /Filter [/FlateDecode] array form (VERDICT r2 item 8): identical
    # extraction for every payload, not just the unit-test fixture
    arr = pdf.replace(b"/Filter /FlateDecode", b"/Filter [/FlateDecode]")
    assert extract_pdf_real(arr) == (text, spans)

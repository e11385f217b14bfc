"""Single-node parity oracle: the pinned reference semantics end-to-end.

Golden fixtures come from THIS code; the Spark pipeline
(operators/extract.py + operators/correction.py) must match it
byte-identically per url (north rule). Every semantic decision is pinned
in SURVEY.md §7.0 and implemented once, here in core/.
"""
from __future__ import annotations

from .beam import correct_sentence
from .extraction import extract_document
from .scoring import NGramScorer
from .textops import join_words_quirk, join_words_readable, train_words


def build_lexicon(ground_truth_texts: list[str], base_words: tuple[str, ...] = ()) -> frozenset[str]:
    """U1 (correctionSentences.py:44): shipped word list ∪ corpus words."""
    return frozenset(set(base_words) | train_words(ground_truth_texts))


def run_oracle(pages: list[dict], lexicon: frozenset[str], scorer: NGramScorer | None = None) -> list[dict]:
    scorer = scorer or NGramScorer(lexicon)
    out = []
    for page in pages:
        text, spans, kind = extract_document(page["html"])
        if page["lang"] == "en" and kind != "pdf_stub":
            words = correct_sentence(text, scorer, lexicon)
        else:
            words = text.split()  # deterministic pass-through for non-en / stubbed pages
        out.append(
            {
                "url": page["url"],
                "kind": kind,
                "extracted_text": text,
                "spans": spans,
                "corrected_text": join_words_quirk(words),
                "corrected_readable": join_words_readable(words),
            }
        )
    return out

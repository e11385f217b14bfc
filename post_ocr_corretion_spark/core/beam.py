"""Deterministic beam-search sentence correction (D9/J7/A5/W2-W4).

Single-document reference semantics, pinned per SURVEY.md §7.0:

- errors are computed ONCE on the original sentence
  (correctionSentences.py:256-263) and processed in position order;
- the roulette-wheel selections (correctionSentences.py:296-330, seeded
  ``random.random``) are replaced by deterministic top-k with the stable
  tie-break (score desc, then word-tuple asc) — §7.0.2;
- per old beam sentence, every candidate substitution is scored as
  normalized-candidate-score + normalized-sentence-score
  (compute_sentence_score, correctionSentences.py:235-242), and the top
  ``beam_width`` survive (selected_sentences :230-233);
- between errors the pooled beam is pruned to ``beam_width`` by sentence
  score (select_best_sentences :288-291); the final answer is the max by
  sentence score (get_best_sentence :293-294);
- candidate words whose source error word had trailing [.,!?;] punctuation
  also get a +punctuation variant (get_new_sentences :216-224);
- sentence score = mean word probability, context-free per word, so
  substituting one word updates the mean incrementally — the identity the
  distributed engine exploits (operators/correction.py).

Beam width and candidate count come from evolutionary_argument.json
(sentences_for_generation=3, words_for_generation=15).
"""
from __future__ import annotations

from .candidates import get_alternative_word
from .scoring import NGramScorer
from .textops import add_last_punctuation, sentence_words

BEAM_WIDTH = 3
WORDS_FOR_GENERATION = 15


def _top_k(items: list[tuple[float, tuple[str, ...]]], k: int) -> list[tuple[float, tuple[str, ...]]]:
    """Deterministic top-k: score desc, tie word-tuple asc."""
    return sorted(items, key=lambda t: (-t[0], t[1]))[:k]


def correct_sentence(
    text: str,
    scorer: NGramScorer,
    lexicon: frozenset[str] | set[str],
    beam_width: int = BEAM_WIDTH,
) -> list[str]:
    """Returns the corrected word list for one document."""
    words = tuple(sentence_words(text))
    probs = {w: scorer.word_prob(w) for w in set(words)}
    errors = [(i, w) for i, w in enumerate(words) if probs[w] < 0.5]

    def sent_score(ws: tuple[str, ...]) -> float:
        if not ws:
            return 1.0
        return sum(scorer.word_prob(w) for w in ws) / len(ws)

    beam: list[tuple[str, ...]] = [words]
    for idx, err_word in errors:
        pruned = [ws for _, ws in _top_k([(sent_score(ws), ws) for ws in beam], beam_width)]
        cands = sorted(get_alternative_word(err_word.lower(), lexicon))
        punct = add_last_punctuation(err_word)
        if punct:
            cands = cands + [(w + punct, s) for w, s in cands]
        new_beam: list[tuple[str, ...]] = []
        for ws in pruned:
            batch = [(ws[:idx] + (cw,) + ws[idx + 1 :], cs) for cw, cs in cands]
            word_total = sum(cs for _, cs in batch)
            sent_scores = [sent_score(nws) for nws, _ in batch]
            sent_total = sum(sent_scores)
            scored = [
                (cs / word_total + ss / sent_total, nws)
                for (nws, cs), ss in zip(batch, sent_scores)
            ]
            new_beam.extend(ws2 for _, ws2 in _top_k(scored, beam_width))
        beam = new_beam if new_beam else pruned
    best = _top_k([(sent_score(ws), ws) for ws in beam], 1)[0][1]
    return list(best)

"""Deterministic text segmentation (the seq2seq replacement).

The reference trains a char-level seq2seq Transformer to re-insert spaces
into de-spaced text (textSegmentator.py, seq2seqLearning.py) and reports
it unusable (test cross-entropy 6.90, Levenshtein ratio 0.29 — report.pdf
Table 3, "the model is judged unusable" §4.2). Per SURVEY.md §7.0.6 logic
(no shipped checkpoint, torch out of engine scope) we replace the MODEL
with a deterministic unigram-LM Viterbi segmenter over the corpus
lexicon, keeping the reference's exact dataflow around it (clean →
split-to-fit → de-space → segment → A12 Levenshtein-ratio eval).

Semantics (pinned):
- word cost = -log( (count(w)+1) / (total+V) ) for lexicon words up to
  MAX_WORD_LEN chars;
- any single char can be its own token at OOV_CHAR_COST (so decoding is
  total);
- an OOV span of length L costs OOV_CHAR_COST·L (+ a per-token penalty
  folded into the char cost), so real words always beat char spans;
- ties broken toward the LONGER last word (deterministic).
"""
from __future__ import annotations

import math

MAX_WORD_LEN = 24
OOV_CHAR_COST = 12.0


class ViterbiSegmenter:
    def __init__(self, word_counts: dict[str, int]):
        total = sum(word_counts.values())
        v = len(word_counts) + 1
        self.cost = {
            w: -math.log((c + 1) / (total + v))
            for w, c in word_counts.items()
            if 0 < len(w) <= MAX_WORD_LEN
        }

    def segment(self, text: str) -> list[str]:
        """De-spaced string → word list (minimum total cost parse)."""
        n = len(text)
        if n == 0:
            return []
        best = [0.0] + [math.inf] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            lo = max(0, i - MAX_WORD_LEN)
            # char fallback: split [i-1, i) as a one-char token
            b, bj = best[i - 1] + OOV_CHAR_COST, i - 1
            for j in range(lo, i - 1 + 1):
                w = text[j:i]
                c = self.cost.get(w)
                if c is not None:
                    cand = best[j] + c
                    # strict < keeps the EARLIEST split start on ties,
                    # i.e. the longest last word (j smallest wins)
                    if cand < b:
                        b, bj = cand, j
            best[i], back[i] = b, bj
        out = []
        i = n
        while i > 0:
            j = back[i]
            out.append(text[j:i])
            i = j
        out.reverse()
        # merge runs of single-char fallback tokens into one OOV word so
        # unknown words come back whole, not letter-spaced
        merged: list[str] = []
        run = ""
        for tok in out:
            if len(tok) == 1 and tok not in self.cost:
                run += tok
            else:
                if run:
                    merged.append(run)
                    run = ""
                merged.append(tok)
        if run:
            merged.append(run)
        return merged

    def segment_text(self, text: str) -> str:
        return " ".join(self.segment(text))

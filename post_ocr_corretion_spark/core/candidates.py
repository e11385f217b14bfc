"""Pinned distance-1 candidate-word semantics (D7/D8/J1/J2).

The reference generates regex patterns (substitution ``\\w`` at i,
deletion of i, insertion of ``\\w`` before i — correctionSentences.py:
131-145, probabilities 0.7/0.15/0.15 from :17-21) and matches them against
a bucketed lexicon (correctionSentences.py:65-90).  As-written the match
function always returns ``set()`` (the ``try/finally: return set()`` bug,
:74-75); per SURVEY.md §7.0.1 we implement the *intended* semantics.

The regex theta-join is re-expressed as pure set/equi-join logic, which is
what the Spark side turns into SymSpell-style deletion-key equi-joins
(operators/candidates.py):

- substitution at i matches lexicon word v  ⇔  |v| = |w|, v agrees with w
  everywhere except position i, and v[i] ∈ WORDCHAR;
- deletion at i matches v  ⇔  v = w with char i removed;
- insertion before i (i ∈ 0..|w|−1 — the reference does NOT insert at the
  end, :143-145) matches v  ⇔  deleting v[i] yields w and v[i] ∈ WORDCHAR.

WORDCHAR is pinned to ASCII ``[a-z0-9_]`` (regex ``\\w`` over lowercased
ASCII text; the reference's sentinel-letter escaping round-trip
(:24-25,148-151) is replaced by this direct formulation — SURVEY.md §7.0).

``get_alternative_word`` mirrors correctionSentences.py:265-275: candidates
always include (w, 1) and (w_nopunct, 1); exactly one distance-1 expansion
runs (max distance 1, :160-161); patterns from BOTH w and w_nopunct are
matched; results dedup on the (word, score) pair.
"""
from __future__ import annotations

from .textops import remove_punctuation

WORDCHAR = "abcdefghijklmnopqrstuvwxyz0123456789_"
WORDCHAR_SET = frozenset(WORDCHAR)

P_SUB = 0.7
P_DEL = 0.15
P_INS = 0.15


def distance1_matches(w: str, lexicon: frozenset[str] | set[str]) -> set[tuple[str, float]]:
    """All lexicon words reachable from ``w`` by one substitution /
    deletion / insertion per the pinned semantics, with their operation
    scores. A word reachable via several ops appears once per distinct
    (word, score) pair — matching the reference's tuple-set dedup
    (correctionSentences.py:111,213)."""
    out: set[tuple[str, float]] = set()
    n = len(w)
    for i in range(n):
        prefix, suffix = w[:i], w[i + 1 :]
        for c in WORDCHAR:
            v = prefix + c + suffix
            if v in lexicon:
                out.add((v, P_SUB))
            u = prefix + c + w[i:]  # insertion before i
            if u in lexicon:
                out.add((u, P_INS))
        d = prefix + suffix  # deletion of i
        if d and d in lexicon:
            out.add((d, P_DEL))
    return out


def get_alternative_word(word: str, lexicon: frozenset[str] | set[str]) -> set[tuple[str, float]]:
    """correctionSentences.py:265-275 with the pinned decisions.
    ``word`` arrives lowercased (caller mirrors :261)."""
    w_nopunct = remove_punctuation(word)
    candidates: set[tuple[str, float]] = {(word, 1.0), (w_nopunct, 1.0)}
    for base in {word, w_nopunct}:
        if base:
            candidates |= distance1_matches(base, lexicon)
    return candidates

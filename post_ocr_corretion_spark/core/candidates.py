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


def build_deletion_index(lexicon) -> dict[str, list[tuple[int, str, str]]]:
    """SymSpell-style deletion index over the lexicon: delkey → list of
    (deleted_pos, word, deleted_char).  The executor-local analog of
    operators/lexicon.deletion_neighborhood — ONE pass over the vocabulary
    replaces the per-error-word O(len·|WORDCHAR|) membership probing of
    ``distance1_matches`` with O(len) dict lookups (5× measured on the
    flagship hot path).  Memory is Σ len(w) entries (vocabulary-bounded;
    at 10^8+ vocabularies use the Catalyst equi-join mode instead)."""
    idx: dict[str, list[tuple[int, str, str]]] = {}
    for v in lexicon:
        for j in range(len(v)):
            idx.setdefault(v[:j] + v[j + 1 :], []).append((j, v, v[j]))
    return idx


def distance1_matches_indexed(
    w: str, lexicon, idx: dict[str, list[tuple[int, str, str]]]
) -> set[tuple[str, float]]:
    """``distance1_matches`` computed against a prebuilt deletion index —
    identical result set (tested for equality against both the direct
    formulation and the brute force)."""
    out: set[tuple[str, float]] = set()
    n = len(w)
    for i in range(n):
        d = w[:i] + w[i + 1 :]
        for j, v, ch in idx.get(d, ()):
            # v = w with position i replaced by ch (== substitution at i)
            if j == i and ch in WORDCHAR_SET:
                out.add((v, P_SUB))
        if d and d in lexicon:
            out.add((d, P_DEL))
    # insertion before i (i = 0..n-1, never at the end): deleting v[j]
    # yields w with j ≤ n-1
    for j, v, ch in idx.get(w, ()):
        if j <= n - 1 and ch in WORDCHAR_SET:
            out.add((v, P_INS))
    return out


def one_op_strings(s: str) -> set[tuple[str, float]]:
    """All concrete strings one pinned op away from ``s`` with the op
    score — the word-level analog of one D7 pattern round (substituted /
    inserted chars range over WORDCHAR, insertion before i = 0..len-1,
    no end-insertion)."""
    out: set[tuple[str, float]] = set()
    n = len(s)
    for i in range(n):
        prefix, suffix = s[:i], s[i + 1 :]
        for c in WORDCHAR:
            out.add((prefix + c + suffix, P_SUB))
            out.add((prefix + c + s[i:], P_INS))
        d = prefix + suffix
        if d:
            out.add((d, P_DEL))
    return out


def get_alternative_word(
    word: str,
    lexicon: frozenset[str] | set[str],
    max_distance: int = 1,
    words_for_generation: int = 15,
    delidx: dict[str, list[tuple[int, str, str]]] | None = None,
) -> set[tuple[str, float]]:
    """correctionSentences.py:265-275 with the pinned decisions.
    ``word`` arrives lowercased (caller mirrors :261).

    ``max_distance`` mirrors get_max_lev_distance: the pinned default is
    1 (the code, correctionSentences.py:160-161); 2 (the report §4.4
    configuration) is available behind the flag. Each extra round applies
    one more op to the cumulative frontier with multiplied scores
    (D7 applied to the pattern SET, :272), re-checks the loop guard
    (≥ words_for_generation candidates stops expansion, :280-282), and
    dedups on (word, score) pairs. Distance-1 results are identical to
    the direct formulation in ``distance1_matches`` (tested)."""
    w_nopunct = remove_punctuation(word)
    candidates: set[tuple[str, float]] = {(word, 1.0), (w_nopunct, 1.0)}
    if max_distance <= 1:
        for base in {word, w_nopunct}:
            if base:
                if delidx is not None:
                    candidates |= distance1_matches_indexed(base, lexicon, delidx)
                else:
                    candidates |= distance1_matches(base, lexicon)
        return candidates

    frontier: set[tuple[str, float]] = {(b, 1.0) for b in {word, w_nopunct} if b}
    distance = 0
    while max_distance > distance and words_for_generation > len(candidates):
        grown: set[tuple[str, float]] = set()
        for s, sc in frontier:
            for t, op_sc in one_op_strings(s):
                grown.add((t, sc * op_sc))
        frontier |= grown
        candidates |= {(t, sc) for t, sc in frontier if t and t in lexicon}
        distance += 1
    return candidates

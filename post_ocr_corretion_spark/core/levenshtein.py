"""Exact `Levenshtein.ratio` semantics (A12/M5, seq2seqEvaluation.py:63-72).

The reference uses ``Levenshtein.ratio(a, b, processor=str.lower)``.
That ratio is the *indel* similarity: substitutions cost 2 (i.e. they are
not allowed as a single op), so

    ratio(a, b) = (|a| + |b| - dist_indel(a, b)) / (|a| + |b|)
                = 2 * LCS(a, b) / (|a| + |b|)

(`ratio("", "") == 1.0` by convention, matching the package).
Spark's built-in ``levenshtein()`` uses substitution cost 1 and is NOT
equivalent (SURVEY.md §2.4 A12) — hence this implementation, used by both
the oracle and the pandas-UDF wrapper in ``functions.metrics``.
"""
from __future__ import annotations

import numpy as np


def lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence, O(|a|·|b|) DP with a
    numpy-vectorized inner sweep (rows are vectorized; the outer loop is
    over the shorter string)."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(len(b) + 1, dtype=np.int32)
    for ch in a:
        cv = np.uint32(ord(ch))
        # cur[j] = max(prev[j], cur[j-1], prev[j-1] + (b[j-1]==ch))
        match = prev[:-1] + (bv == cv)
        cur = np.maximum(prev[1:], match)
        # running max to propagate cur[j-1] (the left neighbour):
        np.maximum.accumulate(cur, out=cur)
        prev[1:] = cur
    return int(prev[-1])


def indel_ratio(a: str, b: str, lowercase: bool = True) -> float:
    """`Levenshtein.ratio(a, b, processor=str.lower)` equivalent."""
    if lowercase:
        a, b = a.lower(), b.lower()
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return 2.0 * lcs_len(a, b) / total


def edit_distance(a, b) -> int:
    """Classic Levenshtein distance (substitution cost 1) over strings OR
    token lists — the CER/WER distance. Numpy DP with a prefix-min trick
    for the in-row dependency: cur[j] = min_k≤j (cand[k] + (j-k))."""
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    if isinstance(a, str) and isinstance(b, str):
        av = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    else:
        vocab = {t: i for i, t in enumerate(dict.fromkeys(list(a) + list(b)))}
        av = np.array([vocab[t] for t in a], dtype=np.int64)
        bv = np.array([vocab[t] for t in b], dtype=np.int64)
    m = len(bv)
    prev = np.arange(m + 1, dtype=np.int64)
    j_idx = np.arange(1, m + 1, dtype=np.int64)
    for ca in av:
        cand = np.minimum(prev[1:] + 1, prev[:-1] + (bv != ca))
        cur0 = prev[0] + 1
        # cur[j] = min( min_{k≤j}(cand[k]−k) + j , cur0 + j )
        best = np.minimum.accumulate(cand - j_idx) + j_idx
        prev = np.concatenate(([cur0], np.minimum(best, cur0 + j_idx)))
    return int(prev[-1])


def cer(hyp: str, ref: str) -> float:
    """Character error rate: edit_distance / len(ref) (1.0 floor on the
    denominator for empty refs)."""
    return edit_distance(hyp, ref) / max(1, len(ref))


def wer(hyp: str, ref: str) -> float:
    """Word error rate over whitespace tokens."""
    r = ref.split()
    return edit_distance(hyp.split(), r) / max(1, len(r))


def avg_levenshtein_ratio(produced: list[str], correct: list[str]) -> tuple[float, float]:
    """A12 (seq2seqEvaluation.py:63-72): mean and POPULATION std of the
    per-pair ratios (np.std is population std — SURVEY.md §2.4 A11)."""
    ratios = np.array([indel_ratio(x, y) for x, y in zip(produced, correct)])
    return float(np.average(ratios)), float(np.std(ratios))

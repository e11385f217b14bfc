"""Pinned scalar text semantics of the reference pipeline.

Each function documents the reference behaviour it mirrors (file:line in
/root/reference). These are the single source of truth shared by the
single-node oracle and the Spark column expressions in
``post_ocr_corretion_spark.functions.text`` (which re-express the same
semantics as Catalyst expressions; tests assert equivalence).
"""
from __future__ import annotations

import re
import string

# reference: seq2seqPreprocessing.py:13-19
SEPARATOR_SYMBOL = "#"
MAX_SEQUENCE_LEN = 256
UNK = "<unk>"
EOS = "<eos>"
BOS = "<bos>"
PAD = "<pad>"
SPECIAL_SYMBOLS = [UNK, PAD, BOS, EOS]  # order matters: index 0..3

# reference: correctionSentences.py:96 — the punctuation class actually
# *removed* by remove_punctuaction; the *guard* uses all of
# string.punctuation (correctionSentences.py:95).
TRAILING_PUNCT_CLASS = ".,!?;"
_STRIP_RE = re.compile(r"(.+)[.,!?;]")


def clean_text(s: str) -> str:
    """P2 — remove backslashes then lowercase (seq2seqPreprocessing.py:85-88)."""
    return re.sub(r"[\\]", "", s).lower()


def despace(s: str) -> str:
    """P4 — delete spaces to build the segmentation input
    (seq2seqPreprocessing.py:136-139)."""
    return s.replace(" ", "")


def mark_spaces(s: str) -> str:
    """P3 — space → '#' separator (seq2seqPreprocessing.py:96-97)."""
    return s.replace(" ", SEPARATOR_SYMBOL)


def remove_punctuation(word: str) -> str:
    """P6 — strip punctuation per correctionSentences.py:93-98.

    Exact as-built semantics: if the word's LAST char is in
    ``string.punctuation`` (any punct), apply
    ``re.sub(r'(.+)[.,!?;]', r'\\1', word)`` which (because ``.+`` is
    greedy and re.sub replaces all non-overlapping matches) removes the
    LAST occurrence of a [.,!?;] char — even an interior one when the
    trailing char is punctuation outside that class.  Empty words pass
    through (the reference's try/finally swallows the IndexError).
    """
    if word and word[-1] in string.punctuation:
        return _STRIP_RE.sub(r"\1", word)
    return word


def add_last_punctuation(word: str) -> str:
    """P7 — the trailing char iff it matches [.,!?;]$
    (correctionSentences.py:100-101)."""
    return word[-1] if re.search(r"[.,!?;]$", word) else ""


def bucket_key(word: str) -> str:
    """J1 key — first+last char, with the two-char backslash rule
    (correctionSentences.py:53-59). Assumes non-empty word."""
    starting_char = word[0]
    end_char = word[-1]
    if len(word) > 2:
        if word[:1] == "\\":
            starting_char = word[:2]
        if word[-2:-1] == "\\":
            end_char = word[-2:]
    return starting_char + end_char


def train_words(sentences: list[str]) -> set[str]:
    """A2 — distinct lexicon words from ground-truth sentences
    (correctionSentences.py:35-41): clean (P2), split on single space,
    strip punctuation (P6), lowercase, drop empties."""
    out: set[str] = set()
    for sentence in sentences:
        for w in clean_text(sentence).split(" "):
            w = remove_punctuation(w).lower()
            if w:
                out.add(w)
    return out


def train_word_counts(sentences: list[str]) -> dict[str, int]:
    """A2 with frequencies — the unigram counts that feed the Viterbi
    segmenter (same cleaning path as train_words)."""
    out: dict[str, int] = {}
    for sentence in sentences:
        for w in clean_text(sentence).split(" "):
            w = remove_punctuation(w).lower()
            if w:
                out[w] = out.get(w, 0) + 1
    return out


def sentence_words(text: str) -> list[str]:
    """Word split used by the corrector (correctionSentences.py:257):
    Python ``str.split()`` — any-whitespace runs, empties dropped."""
    return text.split()


def join_words_quirk(words: list[str]) -> str:
    """D11 — the reference joins with NO separator
    (correctionSentences.py:191-192). Quirk-compatible parity output."""
    return "".join(words)


def join_words_readable(words: list[str]) -> str:
    """Human-readable variant (SURVEY.md §7.0.3)."""
    return " ".join(words)


def split_in_middle_space(s: str) -> tuple[str, str] | tuple[()]:
    """W7 — split at the space minimizing |i - len/2|
    (seq2seqPreprocessing.py:126-133). A sequence with no space returns
    () (the reference drops over-long single words, :132). Ties: Python
    ``min`` keeps the FIRST minimal index."""
    half = len(s) / 2
    best_index = -1
    best_metric = None
    for i, ch in enumerate(s):
        if ch == " ":
            m = abs(i - half)
            if best_metric is None or m < best_metric:
                best_metric, best_index = m, i
    if best_index < 0:
        return ()
    return (s[:best_index], s[best_index + 1 :])


def shorten_sequences(sequences: list[str], max_len: int = MAX_SEQUENCE_LEN) -> list[str]:
    """D2 — iterative split-to-fit (seq2seqPreprocessing.py:109-124).
    Order quirk preserved: short sequences first (in input order), then
    split products in the order the fixpoint loop emits them."""
    too_long = lambda seq: len(seq) > max_len  # noqa: E731
    long_seqs = [s for s in sequences if too_long(s)]
    ok = [s for s in sequences if not too_long(s)]
    while long_seqs:
        split_products: list[str] = []
        for s in long_seqs:
            split_products.extend(split_in_middle_space(s))
        long_seqs = [s for s in split_products if too_long(s)]
        ok += [s for s in split_products if not too_long(s)]
    return ok

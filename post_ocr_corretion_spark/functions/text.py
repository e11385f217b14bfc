"""Catalyst column expressions for the reference's scalar text ops
(SURVEY.md §2.2/§2.9). Zero UDFs — everything here stays JVM-side inside
whole-stage codegen. Semantics mirror core/textops.py exactly (tests
assert the equivalence on fixture corpora).
"""
from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F

TRAILING_PUNCT_RE = r"([.,!?;])$"
_PUNCT_CHARS = list(string.punctuation)


def clean_text(col: Column) -> Column:
    """P2 — remove backslashes then lowercase (seq2seqPreprocessing.py:85-88)."""
    return F.lower(F.regexp_replace(col, r"[\\]", ""))


def despace(col: Column) -> Column:
    """P4 — delete all spaces (seq2seqPreprocessing.py:136-139)."""
    return F.regexp_replace(col, r"[ ]", "")


def mark_spaces(col: Column) -> Column:
    """P3 — space → '#' (seq2seqPreprocessing.py:96-97)."""
    return F.regexp_replace(col, r"[ ]", "#")


def remove_punctuation(col: Column) -> Column:
    """P6 — correctionSentences.py:93-98 as-built: if the LAST char is any
    ``string.punctuation`` char, drop the last [.,!?;] occurrence (greedy
    ``(.+)[.,!?;]`` → ``$1``; Python re.sub and Java replaceAll agree here
    because the single greedy match consumes the string)."""
    guard = (F.length(col) > 0) & F.substring(col, -1, 1).isin(_PUNCT_CHARS)
    return F.when(guard, F.regexp_replace(col, r"(.+)[.,!?;]", "$1")).otherwise(col)


def add_last_punctuation(col: Column) -> Column:
    """P7 — trailing [.,!?;] char or '' (correctionSentences.py:100-101)."""
    return F.regexp_extract(col, TRAILING_PUNCT_RE, 1)


def bucket_key(col: Column) -> Column:
    """J1 — first+last char with the two-char backslash rule
    (correctionSentences.py:53-59)."""
    start = F.when(
        (F.length(col) > 2) & (F.substring(col, 1, 1) == F.lit("\\")),
        F.substring(col, 1, 2),
    ).otherwise(F.substring(col, 1, 1))
    end = F.when(
        (F.length(col) > 2) & (F.substring(col, -2, 1) == F.lit("\\")),
        F.substring(col, -2, 2),
    ).otherwise(F.substring(col, -1, 1))
    return F.concat(start, end)


def sentence_words(col: Column) -> Column:
    """Python str.split() semantics (correctionSentences.py:257): split on
    whitespace runs, no empty tokens. Filtering empties (rather than
    F.trim, which strips only 0x20) matches str.split() for leading or
    trailing tabs/newlines too (ADVICE r1), and makes whitespace-only
    text yield [] exactly."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def words_on_space(col: Column) -> Column:
    """str.split(' ') semantics (correctionSentences.py:37): single-space
    delimiter, empties preserved (the A2 path filters them afterwards)."""
    return F.split(col, r" ", -1)


def join_words_quirk(col: Column) -> Column:
    """D11 — no-separator join (correctionSentences.py:191-192)."""
    return F.concat_ws("", col)


def join_words_readable(col: Column) -> Column:
    return F.concat_ws(" ", col)


def char_array(col: Column) -> Column:
    """P5 — string → array of single chars (seq2seqPreprocessing.py:95-98)."""
    return F.split(col, "(?!^)(?=.)")


def truncate_at_eos(col: Column, eos: str = "<eos>") -> Column:
    """P14 — cut at first <eos>, exclusive (seq2seqPreprocessing.py:40-42)."""
    pos = F.array_position(col, eos)
    return F.when(pos > 0, F.slice(col, 1, (pos - 1).cast("int"))).otherwise(col)


def drop_special_symbols(col: Column, specials: list[str]) -> Column:
    """P13 — remove special symbols, duplicates preserved
    (seq2seqPreprocessing.py:36-38; F.filter, NOT array_except which
    dedups — SURVEY.md §2.2 P13)."""
    lit_specials = F.array(*[F.lit(s) for s in specials])
    return F.filter(col, lambda x: ~F.array_contains(lit_specials, x))


# Canonicalization for near-dup keys (RefinedWeb/MassiveText style:
# lowercase → accent fold → strip non-alphanumerics → collapse
# whitespace). The accent map is an explicit pinned codepoint table so
# any engine's translate() replays it — NOT locale-dependent NFKC.
ACCENT_SRC = "áàâäãåéèêëíìîïóòôöõúùûüýÿñç"
ACCENT_DST = "aaaaaaeeeeiiiiooooouuuuyync"


def canonicalize_text(col: Column) -> Column:
    """Deterministic dedup-key normalization: lowercase, fold the pinned
    accent table, drop every char outside [a-z0-9 ], collapse runs of
    spaces, trim. Pure Catalyst (lower/translate/regexp_replace inside
    one codegen span); DuckDB replays it with the same four calls
    ('g' flag on the regexes)."""
    s = F.translate(F.lower(col), ACCENT_SRC, ACCENT_DST)
    s = F.regexp_replace(s, "[^a-z0-9 ]+", "")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)

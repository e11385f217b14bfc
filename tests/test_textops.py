"""Catalyst column expressions ≡ pinned pure-Python semantics (core/textops).

Fixture words cover FIXTURES.md F1 edge cases: trailing punctuation,
interior-punct quirk, backslashes, regex metacharacters, mixed case,
empty strings.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.core import textops as ct
from post_ocr_corretion_spark.functions import text as ft

WORDS = [
    "city.",
    "cit,",
    "word!",
    "ab.c-",          # interior-punct quirk: guard punct '-' strips interior '.'
    "a",
    ".",
    "...",
    "ab",
    "",
    "UPPER.Case",
    "back\\slash",
    "\\word\\",
    "meta|chars?",
    "p(a)t*h+",
    "tail;",
    "semi;colon;",
    "the dis0ric! is in the cit.",
    "multi  spaces  here",
]


@pytest.mark.parametrize(
    "col_fn,py_fn",
    [
        (ft.clean_text, ct.clean_text),
        (ft.despace, ct.despace),
        (ft.mark_spaces, ct.mark_spaces),
        (ft.remove_punctuation, ct.remove_punctuation),
        (ft.add_last_punctuation, ct.add_last_punctuation),
    ],
)
def test_scalar_parity(spark, col_fn, py_fn):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    got = [r.out for r in df.select(col_fn(F.col("w")).alias("out")).collect()]
    want = [py_fn(w) for w in WORDS]
    assert got == want


def test_bucket_key_parity(spark):
    words = [w for w in WORDS if w]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [r.out for r in df.select(ft.bucket_key(F.col("w")).alias("out")).collect()]
    want = [ct.bucket_key(w) for w in words]
    assert got == want


def test_sentence_words_matches_python_split(spark):
    # ADVICE r1 cases: leading/trailing tab/newline and whitespace-only
    # text must match str.split() exactly (trim strips only 0x20)
    texts = [
        "a b  c", "  leading", "trailing  ", "one", "a\nb\tc", "x  y\n\nz",
        "\tlead-tab", "\nlead-nl", "trail-tab\t", "", " ", "\t", "\n\t ", "\t x \n",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.out for r in df.select(ft.sentence_words(F.col("t")).alias("out")).collect()]
    assert got == [t.split() for t in texts]


def test_interior_punct_quirk():
    # guard char '-' is string.punctuation but outside the strip class:
    # the LAST [.,!?;] occurrence — an interior '.' — is removed.
    assert ct.remove_punctuation("ab.c-") == "abc-"
    assert ct.remove_punctuation("city.") == "city"
    assert ct.remove_punctuation(".") == "."      # (.+) needs a preceding char
    assert ct.remove_punctuation("...") == ".."
    assert ct.remove_punctuation("word") == "word"
    assert ct.remove_punctuation("") == ""


def test_split_in_middle_space():
    assert ct.split_in_middle_space("ab cd") == ("ab", "cd")
    assert ct.split_in_middle_space("nospace") == ()
    long = " ".join(["w" * 10] * 50)
    parts = ct.shorten_sequences([long], max_len=100)
    assert all(len(p) <= 100 for p in parts)
    assert " ".join(sorted(" ".join(parts).split())) == " ".join(sorted(long.split()))


def test_char_array(spark):
    df = spark.createDataFrame([("abc",), ("",), ("a b",)], "w string")
    got = [r.out for r in df.select(ft.char_array(F.col("w")).alias("out")).collect()]
    assert got[0] == ["a", "b", "c"]
    assert got[2] == ["a", " ", "b"]


def test_truncate_and_specials(spark):
    df = spark.createDataFrame(
        [(["<bos>", "a", "b", "<eos>", "c"],), (["a", "<pad>", "a"],)], "arr array<string>"
    )
    out = df.select(
        ft.truncate_at_eos(F.col("arr")).alias("t"),
        ft.drop_special_symbols(F.col("arr"), ct.SPECIAL_SYMBOLS).alias("d"),
    ).collect()
    assert out[0].t == ["<bos>", "a", "b"]
    assert out[0].d == ["a", "b", "c"]
    assert out[1].d == ["a", "a"]  # duplicates preserved (P13 uses filter, not array_except)

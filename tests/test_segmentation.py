"""Segmentation ETL parity: Spark split-to-fit ≡ core.shorten_sequences
(as multisets — the reference's output order is a list quirk, the engine
is set-semantics), vocab/encode/pad/decode round-trips."""
from __future__ import annotations

from pyspark.sql import functions as F

from post_ocr_corretion_spark.core.textops import SPECIAL_SYMBOLS, clean_text, shorten_sequences
from post_ocr_corretion_spark.operators.segmentation import (
    char_vocabulary,
    decode_sequence,
    encode_sequences,
    prepare_sequences,
    split_to_fit,
)

TEXTS = [
    "short one",
    "word " * 100,                      # needs 2 rounds of splitting at 256
    "x" * 300,                           # single over-long word → dropped
    ("left part " * 30 + "right part " * 30).strip(),
    "Mixed CASE with\\backslash and tail.",
]


def test_split_to_fit_matches_core(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "seq string")
    got = sorted(r.seq for r in split_to_fit(df, "seq").collect())
    want = sorted(shorten_sequences(TEXTS))
    assert got == want
    assert all(len(s) <= 256 for s in got)


def test_prepare_sequences_despaces(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    out = prepare_sequences(docs).collect()
    for r in out:
        assert r.input_seq == r.output_seq.replace(" ", "")
        assert len(r.output_seq) <= 256


def test_vocab_and_encode_roundtrip(spark):
    docs = spark.createDataFrame([("abc abd",), ("bca",)], "text string")
    seqs = prepare_sequences(docs)
    vocab = char_vocabulary(seqs)
    rows = {r.token: r.idx for r in vocab.collect()}
    # specials occupy 0..3 in reference order; chars sorted after
    for i, s in enumerate(SPECIAL_SYMBOLS):
        assert rows[s] == i
    chars = sorted(set("abc abd".replace(" ", "#") + "bca"))
    for j, ch in enumerate(chars):
        assert rows[ch] == 4 + j

    enc = encode_sequences(seqs, vocab, "output_seq", "enc")
    vocab_rows = vocab.collect()
    dec = enc.select(
        "output_seq", decode_sequence(F.col("enc"), vocab_rows).alias("dec")
    ).collect()
    for r in dec:
        # decode joins chars with '' — spaces were '#'-marked, so the
        # round-trip reproduces the marked sequence (P3 semantics)
        assert r.dec == r.output_seq.replace(" ", "#")


def test_encode_padding_uniform(spark):
    docs = spark.createDataFrame([("ab",), ("abcdef",)], "text string")
    seqs = prepare_sequences(docs)
    vocab = char_vocabulary(seqs)
    enc = encode_sequences(seqs, vocab, "output_seq", "enc").collect()
    sizes = {len(r.enc) for r in enc}
    assert len(sizes) == 1  # D4: padded to the global max (A4)


def test_unknown_char_falls_back_to_unk(spark):
    docs = spark.createDataFrame([("ab",)], "text string")
    seqs = prepare_sequences(docs)
    vocab = char_vocabulary(seqs)
    other = spark.createDataFrame([(1, "az")], "seq_id long, output_seq string")
    enc = encode_sequences(other, vocab, "output_seq", "enc", pad_to=6).collect()[0].enc
    unk_idx = 0  # <unk> is index 0 (reference special order)
    assert enc[2] == unk_idx  # 'z' unseen → <unk>

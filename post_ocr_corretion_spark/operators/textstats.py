"""Text-analysis operators for training-data pipelines (round-1 brief):
language-ID heuristic, quality scoring, token counting, document
fingerprinting — all pure Catalyst expressions over the documents table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_text

STOPWORDS = ["the", "of", "and", "a", "to", "in", "is", "was", "it", "for"]
BPE_TOKEN_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def quality_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per doc: word count, stopword ratio, punctuation ratio, mean word
    length — the classic pretraining quality filters."""
    words = F.split(F.trim(F.col(text_col)), " ", -1)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,!?;]", ""))
    return docs.select(
        id_col,
        n_words.alias("n_words"),
        F.round(n_stop.cast("double") / n_words, 6).alias("stopword_ratio"),
        F.round(n_punct.cast("double") / F.length(text_col), 6).alias("punct_ratio"),
        F.round((F.length(text_col) - n_words + 1).cast("double") / n_words, 4).alias("avg_word_len"),
    )


def lang_id(docs: DataFrame, threshold: float = 0.08, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-density language-ID heuristic: 'en' iff the fraction of
    English stopwords ≥ threshold."""
    words = F.split(F.trim(clean_text(F.col(text_col))), " ", -1)
    frac = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast("double") / F.size(words)
    return docs.select(
        id_col,
        F.when(frac >= threshold, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
        F.round(frac, 6).alias("stop_frac"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens ([a-z0-9]+ runs or single
    non-space symbols)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), " ", -1))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    return docs.select(id_col, ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    word set — stable under word reordering, cheap join key for dedup."""
    words = (
        docs.select(id_col, F.explode(F.split(clean_text(F.col(text_col)), " ", -1)).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    return words.groupBy(id_col).agg(
        F.md5(F.concat_ws(" ", F.array_sort(F.collect_set("w")))).alias("fp")
    )

"""Composite pretraining quality filter — the FineWeb-style chain
(Penedo et al. 2024 compose C4 rules + Gopher rules + language-ID into
one keep decision; CCNet adds the LM-perplexity rank): every document
gets PER-RULE verdict columns plus one conjunction ``keep`` flag, so a
pipeline can both filter and audit which rule fired. Composes the
already-gated operators — gopher_repetition (repetition rules),
lang_id + quality_stats (stopword/punctuation heuristics),
bigram_lm_fit + lm_nll_score (CCNet-style fluency) — no new scan
shapes.

Thresholds: ``gopher_pass`` carries Gopher A1.1's top-n-gram caps (see
operators/gopher.py for which of those are paper-sourced); the word
count / stopword / punctuation / NLL bounds here are REPO-CHOSEN
defaults sized to the synthetic corpus (the published pipelines tune
these per corpus — C4 and Gopher target real web text), exposed as
keyword arguments.

Scale shape: every component is per-doc aggregates or pure projection;
the composition joins on the ONE key (doc_id), so after the first
shuffle all joins are co-partitioned; the LM fit's counts tables ride
broadcast joins inside lm_nll_score. Nothing new leaves the executors.

Determinism contract (the gate replays this bit-for-bit in DuckDB):
ratios arrive pre-rounded from the component operators; every verdict
is an IEEE compare of those rounded doubles against shared literals;
NULL avg_nll (docs with < 2 tokens) maps to nll_ok = FALSE via an
explicit IS NOT NULL, so the keep conjunction is never NULL.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gopher import gopher_repetition
from .lm_quality import bigram_lm_fit, lm_nll_score
from .textstats import lang_id, quality_stats

# repo-chosen defaults for the synthetic corpus (docs are 10-99 words,
# punctuation-free, stopword ratio ~0.06 median, avg_nll ~3.33-3.44)
MIN_WORDS, MAX_WORDS = 20, 100_000
MIN_STOP_RATIO = 0.02
MAX_PUNCT_RATIO = 0.30
NLL_MAX = 3.4
REQUIRE_LANG = "en"


def quality_filter(
    docs: DataFrame,
    *,
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_stop_ratio: float = MIN_STOP_RATIO,
    max_punct_ratio: float = MAX_PUNCT_RATIO,
    nll_max: float = NLL_MAX,
    require_lang: str = REQUIRE_LANG,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_words, gopher_pass, pred_lang, lang_ok,
    stopword_ratio, stop_ok, punct_ratio, punct_ok, avg_nll, nll_ok,
    wc_ok, keep) for EVERY input document — rows are never dropped;
    ``keep`` is the conjunction a pipeline filters on, the per-rule
    booleans are the audit trail."""
    g = gopher_repetition(docs, text_col=text_col, id_col=id_col).select(
        id_col, "n_words", "gopher_pass"
    )
    la = lang_id(docs, text_col=text_col, id_col=id_col).select(id_col, "pred_lang")
    ts = quality_stats(docs, text_col=text_col, id_col=id_col).select(
        id_col, "stopword_ratio", "punct_ratio"
    )
    bigrams, unigrams, vocab = bigram_lm_fit(docs, text_col=text_col)
    lm = lm_nll_score(docs, bigrams, unigrams, vocab, text_col=text_col, id_col=id_col).select(
        id_col, "avg_nll"
    )
    # docs with < 2 tokens have no bigrams -> LEFT join, NULL avg_nll
    j = g.join(la, id_col).join(ts, id_col).join(lm, id_col, "left")
    wc_ok = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    lang_ok = F.col("pred_lang") == require_lang
    stop_ok = F.col("stopword_ratio") >= min_stop_ratio
    punct_ok = F.col("punct_ratio") <= max_punct_ratio
    nll_ok = F.col("avg_nll").isNotNull() & (F.col("avg_nll") <= nll_max)
    return j.select(
        id_col,
        "n_words",
        "gopher_pass",
        "pred_lang",
        lang_ok.alias("lang_ok"),
        "stopword_ratio",
        stop_ok.alias("stop_ok"),
        "punct_ratio",
        punct_ok.alias("punct_ok"),
        "avg_nll",
        nll_ok.alias("nll_ok"),
        wc_ok.alias("wc_ok"),
        (
            F.col("gopher_pass")
            & wc_ok
            & lang_ok
            & stop_ok
            & punct_ok
            & nll_ok
        ).alias("keep"),
    )

"""The north-rule gate: per-url byte-identity of extracted text, spans and
corrected text between the Spark pipeline (both modes) and the single-node
oracle, on an 80-document fixture corpus."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.core.oracle import run_oracle
from post_ocr_corretion_spark.datagen.webpages import make_page


@pytest.fixture(scope="module")
def golden(docs_rows, fixture_lexicon, fixture_scorer):
    pages = [make_page(r["doc_id"], r["text"], r["lang"]) for r in docs_rows]
    return {g["url"]: g for g in run_oracle(pages, fixture_lexicon, fixture_scorer)}


def _docs_df(spark, docs_rows):
    return spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in docs_rows],
        "doc_id long, text string, lang string",
    )


@pytest.mark.parametrize("mode", ["udf", "catalyst"])
def test_pipeline_byte_identity(spark, docs_rows, golden, mode):
    from post_ocr_corretion_spark.pipeline import run_pipeline_from_docs

    df = run_pipeline_from_docs(spark, _docs_df(spark, docs_rows), mode=mode)
    rows = df.collect()
    assert len(rows) == len(golden)
    for r in rows:
        g = golden[r.url]
        assert r.extracted_text == g["extracted_text"], r.url
        assert [(s.start, s.end) for s in r.spans] == g["spans"], r.url
        assert r.corrected_text == g["corrected_text"], r.url
        assert r.corrected_readable == g["corrected_readable"], r.url


@pytest.mark.parametrize("fit", ["distributed", "spark-agg"])
def test_fit_distributed_equals_driver(spark, docs_rows, fit):
    """VERDICT r1 item 2: the flagship with zero driver-side lexicon
    materialization — 'distributed' (sidecar + per-worker lazy fit) and
    'spark-agg' (Spark-aggregated bigram counts + sidecar membership) —
    is byte-identical to the round-1 collect() fit."""
    from post_ocr_corretion_spark.pipeline import run_pipeline_from_docs

    docs = _docs_df(spark, docs_rows)
    cols = ["url", "extracted_text", "spans", "corrected_text", "corrected_readable"]
    dist = {r.url: r for r in run_pipeline_from_docs(spark, docs, fit=fit).select(cols).collect()}
    driv = {r.url: r for r in run_pipeline_from_docs(spark, docs, fit="driver").select(cols).collect()}
    assert dist.keys() == driv.keys()
    for url in dist:
        assert dist[url] == driv[url], url


def test_correction_actually_corrects(golden):
    """OCR noise gets repaired somewhere: corrected text differs from the
    extracted (noisy) text on at least some pages."""
    diffs = sum(
        1 for g in golden.values() if g["corrected_readable"] != g["extracted_text"].replace("\n", " ")
    )
    assert diffs > 0


def test_smoke_sentence(fixture_scorer, fixture_lexicon):
    """The reference's fixed smoke case (test.py:127,134)."""
    from post_ocr_corretion_spark.core.beam import correct_sentence

    out = correct_sentence("the dis0ric! is in the cit.", fixture_scorer, fixture_lexicon)
    assert out[0] == "the"
    assert len(out) == 6


def test_run_beam_tiered_equals_run_beam(spark, docs_rows, fixture_lexicon, fixture_scorer):
    """Tiered lockstep beam (per-error-count tiers, bounded rounds) is
    byte-identical to the single global loop."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.datagen.wordlist import COMMON_WORDS
    from post_ocr_corretion_spark.operators.candidates import candidate_batches
    from post_ocr_corretion_spark.operators.correction import (
        distinct_error_words,
        run_beam,
        run_beam_tiered,
        with_detection,
    )
    from post_ocr_corretion_spark.operators.lexicon import build_lexicon, deletion_neighborhood

    from post_ocr_corretion_spark.datagen.webpages import ocr_noise_text

    docs = spark.createDataFrame(
        [(i, ocr_noise_text(r["text"], i)) for i, r in enumerate(docs_rows[:40])],
        "doc_id long, text string",
    ).withColumn("extracted_text", F.col("text"))
    lex_df = build_lexicon(spark, docs, COMMON_WORDS)
    scorer_bc = spark.sparkContext.broadcast(fixture_scorer)
    detected = with_detection(docs, scorer_bc)
    cand_agg = candidate_batches(
        distinct_error_words(detected), lex_df, deletion_neighborhood(lex_df), scorer_bc
    ).cache()
    cand_agg.count()
    plain = {r.doc_id: r.corrected_words for r in run_beam(detected, cand_agg).collect()}
    tiered = {
        r.doc_id: r.corrected_words
        for r in run_beam_tiered(detected, cand_agg, tiers=(1, 2, 4)).select(
            "doc_id", "corrected_words"
        ).collect()
    }
    assert plain == tiered
    # sanity: the fixture actually spans several tiers
    counts = [len(r.errors) for r in detected.select("errors").collect()]
    assert max(counts) > 4 and min(counts) >= 0


def test_run_beam_fold_equals_lockstep(spark, docs_rows, fixture_lexicon, fixture_scorer):
    """The single-expression fold beam (no driver loop) is byte-identical
    to the lockstep loop on OCR-noised fixtures."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.datagen.webpages import ocr_noise_text
    from post_ocr_corretion_spark.datagen.wordlist import COMMON_WORDS
    from post_ocr_corretion_spark.operators.candidates import candidate_batches
    from post_ocr_corretion_spark.operators.correction import (
        distinct_error_words,
        run_beam,
        run_beam_fold,
        with_detection,
    )
    from post_ocr_corretion_spark.operators.lexicon import build_lexicon, deletion_neighborhood

    noisy = spark.createDataFrame(
        [(i, ocr_noise_text(r["text"], i)) for i, r in enumerate(docs_rows[:40])],
        "doc_id long, text string",
    ).withColumn("extracted_text", F.col("text"))
    clean = spark.createDataFrame(
        [(i, r["text"]) for i, r in enumerate(docs_rows[:40])], "doc_id long, text string"
    )
    lex_df = build_lexicon(spark, clean, COMMON_WORDS)
    scorer_bc = spark.sparkContext.broadcast(fixture_scorer)
    detected = with_detection(noisy, scorer_bc)
    cand_agg = candidate_batches(
        distinct_error_words(detected), lex_df, deletion_neighborhood(lex_df), scorer_bc
    ).cache()
    cand_agg.count()
    # sanity: real errors present
    assert detected.agg(F.max(F.size("errors"))).collect()[0][0] > 0
    plain = {r.doc_id: r.corrected_words for r in run_beam(detected, cand_agg).collect()}
    fold = {
        r.doc_id: r.corrected_words
        for r in run_beam_fold(detected, cand_agg).select("doc_id", "corrected_words").collect()
    }
    assert plain == fold


def test_flagship_auto_bloom_threshold(spark, docs_rows):
    """VERDICT r2 item 3 'done' gate: the flagship with the Bloom
    auto-switch forced on (threshold 0) completes and — at this corpus
    size with AUTO_BLOOM_FPP=1e-6 — stays byte-identical to the exact
    path (md5-deterministic, so this is a stable assertion, not a flaky
    probabilistic one). The exact path (huge threshold) is bit-for-bit
    the pre-switch behavior. On corpora where a false positive DOES land,
    divergence is the documented AUTO_BLOOM_FPP trade."""
    from post_ocr_corretion_spark.pipeline import run_pipeline_from_docs

    docs = _docs_df(spark, docs_rows)
    cols = ["url", "extracted_text", "spans", "corrected_text"]
    bloom = {
        r.url: r
        for r in run_pipeline_from_docs(spark, docs, bloom_threshold=0).select(cols).collect()
    }
    exact = {
        r.url: r
        for r in run_pipeline_from_docs(spark, docs, bloom_threshold=10**9)
        .select(cols)
        .collect()
    }
    assert bloom.keys() == exact.keys()
    mismatches = [u for u in exact if bloom[u] != exact[u]]
    assert mismatches == [], mismatches


def test_lexicon_from_base_table_is_byte_identical_under_replication(spark, docs_rows):
    """run_pipeline_from_docs(lexicon_docs=base) on a replicated input is
    byte-identical to fitting from the replicated table itself —
    replication adds no vocabulary, so the shipped job's --replicate
    fast path (fit from base) changes nothing but the fit cost."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.pipeline import run_pipeline_from_docs

    from post_ocr_corretion_spark.sources.webpages import replicate_docs

    base = _docs_df(spark, docs_rows[:40])
    replicated = replicate_docs(base, 3)
    cols = ["url", "extracted_text", "corrected_text"]
    slow = {r.url: r for r in run_pipeline_from_docs(spark, replicated).select(cols).collect()}
    fast = {
        r.url: r
        for r in run_pipeline_from_docs(spark, replicated, lexicon_docs=base)
        .select(cols)
        .collect()
    }
    assert slow.keys() == fast.keys() and len(slow) == 120
    assert all(slow[u] == fast[u] for u in slow)

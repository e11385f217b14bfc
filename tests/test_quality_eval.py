"""Quality gate: the correction stage must IMPROVE CER/WER against the
ground truth on the synthetic OCR corpus (the reference's own correction
DEGRADED quality, 0.97→0.88 Levenshtein ratio — report.pdf Table 6; our
deterministic top-k + dictionary candidates must do better)."""
from __future__ import annotations

import numpy as np
import pytest

from post_ocr_corretion_spark.core.levenshtein import cer, wer
from post_ocr_corretion_spark.core.oracle import run_oracle
from post_ocr_corretion_spark.datagen.webpages import make_page


@pytest.fixture(scope="module")
def eval_rows(docs_rows, fixture_lexicon, fixture_scorer):
    pages = [make_page(r["doc_id"], r["text"], r["lang"]) for r in docs_rows]
    res = run_oracle(pages, fixture_lexicon, fixture_scorer)
    truth = {p["url"]: p["text"] for p in pages}
    langs = {p["url"]: p["lang"] for p in pages}
    out = []
    for r in res:
        if r["kind"] == "pdf_stub":
            continue
        extracted = r["extracted_text"].replace("\n", " ")
        out.append((langs[r["url"]], extracted, r["corrected_readable"], truth[r["url"]]))
    return out


def test_correction_improves_cer_and_wer(eval_rows):
    en = [(e, c, t) for lang, e, c, t in eval_rows if lang == "en"]
    assert en
    noisy_cer = float(np.mean([cer(e, t) for e, _, t in en]))
    corr_cer = float(np.mean([cer(c, t) for _, c, t in en]))
    noisy_wer = float(np.mean([wer(e, t) for e, _, t in en]))
    corr_wer = float(np.mean([wer(c, t) for _, c, t in en]))
    assert corr_cer < noisy_cer, (corr_cer, noisy_cer)
    assert corr_wer < noisy_wer, (corr_wer, noisy_wer)
    # and the improvement is substantial, not epsilon
    assert corr_wer <= noisy_wer * 0.85


def test_non_en_untouched(eval_rows):
    for lang, extracted, corrected, _ in eval_rows:
        if lang != "en":
            assert corrected == " ".join(extracted.split())

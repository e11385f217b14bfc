from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from post_ocr_corretion_spark.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_rows():
    """First 80 documents of sf0.001 — the fixture corpus for parity tests
    (lexicon is built from the SAME subset on both sides)."""
    rows = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pylist()
    return rows[:80]


@pytest.fixture(scope="session")
def fixture_lexicon(docs_rows):
    from post_ocr_corretion_spark.core.oracle import build_lexicon
    from post_ocr_corretion_spark.datagen.wordlist import COMMON_WORDS

    return build_lexicon([r["text"] for r in docs_rows], COMMON_WORDS)


@pytest.fixture(scope="session")
def fixture_scorer(fixture_lexicon):
    from post_ocr_corretion_spark.core.scoring import NGramScorer

    return NGramScorer(fixture_lexicon)

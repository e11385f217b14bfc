"""Cluster-scale scorer artifacts ≡ the local fit: distributed bigram
counts give a bit-identical model; the Bloom membership is deterministic,
never false-negative, and executor-side hashing matches core/bloom.py."""
from __future__ import annotations

import numpy as np

from post_ocr_corretion_spark.core.bloom import BloomFilter
from post_ocr_corretion_spark.core.scoring import NGramScorer


def _lex_df(spark, fixture_lexicon):
    return spark.createDataFrame([(w,) for w in sorted(fixture_lexicon)], "word string")


def test_distributed_counts_bit_identical(spark, fixture_lexicon):
    from post_ocr_corretion_spark.operators.scorer_fit import scorer_from_spark

    local = NGramScorer(fixture_lexicon)
    dist = scorer_from_spark(spark, _lex_df(spark, fixture_lexicon))
    assert np.array_equal(local.log_prob, dist.log_prob)
    for w in ["the", "dis0ric", "cit.", "zzz", "", "query"]:
        assert dist.word_prob(w) == local.word_prob(w)


def test_sidecar_lexicon_exact_and_picklable(spark, fixture_lexicon):
    """The parquet-sidecar membership proxy: exact set semantics, loads
    lazily from the distributed write, and pickles as just the path (what
    a broadcast ships to executors)."""
    import pickle

    from post_ocr_corretion_spark.operators.scorer_fit import write_lexicon_sidecar

    side = write_lexicon_sidecar(_lex_df(spark, fixture_lexicon))
    clone = pickle.loads(pickle.dumps(side))
    assert len(pickle.dumps(side)) < 500  # ships the path, not the words
    assert set(clone) == set(fixture_lexicon)
    assert len(clone) == len(set(fixture_lexicon))
    some = next(iter(fixture_lexicon))
    assert some in clone and "zzz-not-a-word" not in clone


def test_membership_without_counts_refused():
    """ADVICE r1: membership injection with counts=None would silently fit
    a near-uniform model on the empty lexicon arg — must raise."""
    import pytest as _pytest

    with _pytest.raises(ValueError):
        NGramScorer(frozenset(), membership=frozenset({"the"}))


def test_bloom_no_false_negatives_and_deterministic(fixture_lexicon):
    bf = BloomFilter.from_words(fixture_lexicon, fpp=0.001)
    assert all(w in bf for w in fixture_lexicon)
    bf2 = BloomFilter.from_words(fixture_lexicon, fpp=0.001)
    assert bf.bits == bf2.bits
    # FP rate sanity on guaranteed non-members
    probes = [f"zqx{i}nonword" for i in range(2000)]
    fp = sum(1 for p in probes if p in bf)
    assert fp <= 10


def test_spark_bloom_positions_match_core(spark, fixture_lexicon):
    from post_ocr_corretion_spark.operators.scorer_fit import distributed_bloom_positions

    m_bits, k = 4096, 5
    got = {r.pos for r in distributed_bloom_positions(_lex_df(spark, fixture_lexicon), m_bits, k).collect()}
    want = set()
    for w in fixture_lexicon:
        want.update(BloomFilter.positions(w, m_bits, k))
    assert got == want


def test_bloom_scorer_agrees_where_filter_exact(spark, fixture_lexicon):
    from post_ocr_corretion_spark.operators.scorer_fit import scorer_from_spark

    local = NGramScorer(fixture_lexicon)
    bloomed = scorer_from_spark(spark, _lex_df(spark, fixture_lexicon), use_bloom=True, fpp=0.0001)
    words = list(fixture_lexicon)[:50] + ["dis0ric", "qzqzqz", "the.", "scn"]
    for w in words:
        assert bloomed.word_prob(w) == local.word_prob(w), w

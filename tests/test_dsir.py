"""DSIR importance resampling (operators/dsir.py): selection must prefer
target-like documents, the log-ratio table must be complete over all m
buckets, weights must equal the exact sum of per-token ratios, and the
seeded Gumbel selection must be reproducible."""
from __future__ import annotations

from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.dsir import (
    dsir_log_ratio,
    dsir_select,
    dsir_weights,
)

M = 64


def _corpora(spark):
    # target speaks only {alpha beta gamma}; the pool mixes target-like
    # docs (same vocab) with off-target docs ({zeta eta theta})
    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha"), (101, "beta gamma beta alpha")],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "beta alpha beta"),
            (2, "zeta eta theta"),
            (3, "theta zeta eta zeta"),
        ],
        "doc_id long, text string",
    )
    return target, pool


def test_log_ratio_complete_over_all_buckets(spark):
    target, pool = _corpora(spark)
    lr = dsir_log_ratio(target, pool, n_buckets=M)
    rows = lr.collect()
    assert len(rows) == M
    assert sorted(r["bucket"] for r in rows) == list(range(M))


def test_weights_prefer_target_like_docs(spark):
    target, pool = _corpora(spark)
    out = dsir_select(target, pool, k=4, n_buckets=M, gumbel=False).collect()
    by_rank = [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])]
    # the two target-vocab docs outrank the two off-vocab docs
    assert set(by_rank[:2]) == {0, 1}
    assert set(by_rank[2:]) == {2, 3}
    w = {r["doc_id"]: r["weight"] for r in out}
    assert min(w[0], w[1]) > max(w[2], w[3])
    # without noise the selection key IS the weight
    assert all(r["sel_key"] == r["weight"] for r in out)


def test_weight_is_exact_sum_of_token_ratios(spark):
    target, pool = _corpora(spark)
    lr = dsir_log_ratio(target, pool, n_buckets=M)
    ratio = {r["bucket"]: r["log_ratio"] for r in lr.collect()}
    ws = {r["doc_id"]: r for r in dsir_weights(pool, lr, n_buckets=M).collect()}

    import hashlib

    def bucket(tok):
        h = hashlib.md5(f"dsir#{tok}".encode()).hexdigest()
        return int(h[:16], 16) % M

    for doc_id, text in [(0, "alpha beta gamma"), (3, "theta zeta eta zeta")]:
        toks = text.split(" ")
        expect = sum(ratio[bucket(t)] for t in toks)
        assert float(ws[doc_id]["_w"]) == float(expect)
        assert ws[doc_id]["n_tokens"] == len(toks)


def test_gumbel_selection_reproducible_and_seed_sensitive(spark):
    target, pool = _corpora(spark)
    a = dsir_select(target, pool, k=3, n_buckets=M, seed="dsir").collect()
    b = dsir_select(target, pool, k=3, n_buckets=M, seed="dsir").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a different seed re-buckets AND re-draws the noise: keys must move
    c = {r["doc_id"]: r["sel_key"] for r in dsir_select(target, pool, k=4, n_buckets=M, seed="other").collect()}
    a_keys = {r["doc_id"]: r["sel_key"] for r in dsir_select(target, pool, k=4, n_buckets=M, seed="dsir").collect()}
    assert any(c.get(d) != a_keys.get(d) for d in a_keys)


def test_bigram_features_distinguish_word_order(spark):
    # same unigram bag, different order: unigram DSIR can't tell them
    # apart; bigram DSIR must prefer the doc with target-like ORDER
    target = spark.createDataFrame(
        [(100, "alpha beta alpha beta alpha beta")], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(0, "alpha beta alpha beta"), (1, "beta alpha beta alpha")],
        "doc_id long, text string",
    )
    uni = {r["doc_id"]: r["weight"] for r in dsir_select(
        target, pool, k=2, n_buckets=M, gumbel=False, ngram=1).collect()}
    bi = {r["doc_id"]: r["weight"] for r in dsir_select(
        target, pool, k=2, n_buckets=M, gumbel=False, ngram=2).collect()}
    assert uni[0] == uni[1]  # order-blind
    assert bi[0] > bi[1]  # 'alpha beta' bigrams dominate the target


def test_bigram_single_token_docs_have_no_features(spark):
    from post_ocr_corretion_spark.operators.dsir import dsir_log_ratio, dsir_weights

    target = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    pool = spark.createDataFrame(
        [(0, "solo"), (1, "two words")], "doc_id long, text string"
    )
    lr = dsir_log_ratio(target, pool, n_buckets=M, ngram=2)
    ws = dsir_weights(pool, lr, n_buckets=M, ngram=2).collect()
    assert [r["doc_id"] for r in ws] == [1]  # doc 0 emits zero bigrams

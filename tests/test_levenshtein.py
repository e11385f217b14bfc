"""F6 metric fixtures: exact Levenshtein.ratio (indel) semantics."""
from __future__ import annotations

from post_ocr_corretion_spark.core.levenshtein import avg_levenshtein_ratio, indel_ratio, lcs_len


def test_known_values():
    # hand-computed 2*LCS/(la+lb)
    assert indel_ratio("abc", "abc") == 1.0
    assert indel_ratio("", "") == 1.0
    assert indel_ratio("abc", "") == 0.0
    assert indel_ratio("abc", "abd") == 2 * 2 / 6
    assert indel_ratio("kitten", "sitting") == 2 * 4 / 13
    assert indel_ratio("ABC", "abc") == 1.0  # processor=str.lower
    assert indel_ratio("ABC", "abc", lowercase=False) == 0.0


def test_lcs():
    assert lcs_len("abcde", "ace") == 3
    assert lcs_len("", "x") == 0
    assert lcs_len("aaaa", "aa") == 2
    assert lcs_len("xabx", "ab") == 2


def test_avg_and_population_std():
    mean, std = avg_levenshtein_ratio(["abc", "abc"], ["abc", "abd"])
    assert abs(mean - (1.0 + 2 / 3) / 2) < 1e-12
    # np.std is population std: sqrt(mean of squared deviations)
    import numpy as np

    vals = np.array([1.0, 2 / 3])
    assert abs(std - float(np.std(vals))) < 1e-12


def test_udf_parity(spark):
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.functions.udfs import indel_ratio_udf

    pairs = [("abc", "abd"), ("Kitten", "sitting"), ("", ""), ("same", "same")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r.r for r in df.select(indel_ratio_udf(F.col("a"), F.col("b")).alias("r")).collect()]
    want = [indel_ratio(a, b) for a, b in pairs]
    assert got == want

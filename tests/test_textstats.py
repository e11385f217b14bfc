

def test_canonicalize_text_folds_and_strips(spark):
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.functions.text import canonicalize_text

    df = spark.createDataFrame(
        [
            (0, "  CaFÉ,  Noël & naïve — ÜBER 42!  "),
            (1, "!!!"),  # nothing survives → empty string
            (2, "Ørsted"),  # unmapped accents are dropped, not folded
        ],
        "doc_id long, t string",
    )
    out = {r["doc_id"]: r["c"] for r in df.select("doc_id", canonicalize_text(F.col("t")).alias("c")).collect()}
    assert out[0] == "cafe noel naive uber 42"
    assert out[1] == ""
    assert out[2] == "rsted"


def test_canonicalize_is_idempotent(spark):
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.functions.text import canonicalize_text

    df = spark.createDataFrame([(0, " MiXeD — Çase  ")], "doc_id long, t string")
    once = df.select(canonicalize_text(F.col("t")).alias("c"))
    twice = once.select(canonicalize_text(F.col("c")).alias("c"))
    assert once.collect() == twice.collect()

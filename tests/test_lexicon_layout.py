"""A3/J1 as physical layout: partition-by-bucket write + partition-pruned
bucket lookup."""
from __future__ import annotations

import re

from post_ocr_corretion_spark.datagen.wordlist import COMMON_WORDS
from post_ocr_corretion_spark.operators.lexicon import (
    build_lexicon,
    read_lexicon_bucket,
    write_lexicon_partitioned,
)
from post_ocr_corretion_spark.plans.audit import formatted_plan


def test_bucket_partition_pruning(spark, docs_rows, tmp_path):
    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs_rows], "doc_id long, text string"
    )
    lex = build_lexicon(spark, docs, COMMON_WORDS)
    path = str(tmp_path / "lexicon")
    write_lexicon_partitioned(lex, path)

    full = {(r.word, r.bucket) for r in spark.read.parquet(path).collect()}
    assert full == {(r.word, r.bucket) for r in lex.collect()}

    some_bucket = next(iter(full))[1]
    pruned = read_lexicon_bucket(spark, path, some_bucket)
    got = {r.word for r in pruned.collect()}
    want = {w for w, b in full if b == some_bucket}
    assert got == want

    plan = formatted_plan(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1)  # the predicate reached the scan as a partition filter


def test_dict_encode_distributed_equals_global_rank(spark):
    """The distributed dictionary encode (range partition + per-partition
    offsets + local rank) assigns EXACTLY the ids of the single-task
    row_number() OVER (ORDER BY word) — for several partition counts,
    including more partitions than words."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from post_ocr_corretion_spark.operators.lexicon import corpus_words, dict_encode_distributed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = corpus_words(docs)
    want = {
        (r.word, r.wid)
        for r in vocab.withColumn(
            "wid", F.row_number().over(W.orderBy("word")).cast("long")
        ).collect()
    }
    assert len(want) > 20
    for n in (1, 3, 8, len(want) + 5):
        got = {(r.word, r.wid) for r in dict_encode_distributed(vocab, n).collect()}
        assert got == want, f"num_partitions={n}"

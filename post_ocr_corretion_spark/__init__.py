"""post_ocr_corretion_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the reference post-OCR-correction
pipeline (RaimondiD/post-OCR-corretion), rebuilt Spark-first.

Layout
------
core/       pure-Python semantics (no pyspark import): text ops, scorer,
            candidate generation, HTML extraction, Levenshtein ratio, and
            the single-node parity oracle. Both the Spark operators and the
            golden-fixture tests call THIS code, so engine and oracle can
            never drift.
functions/  Catalyst column expressions (zero-UDF scalar ops) + the few
            Arrow-batched pandas UDFs (scoring, exact Levenshtein ratio).
operators/  DataFrame-level operators: lexicon build, SymSpell-style
            candidate join, beam correction loop, label band-join,
            segmentation ETL, dedup, similarity, text stats, metrics.
datagen/    deterministic synthetic inputs (Common-Crawl-style webpages,
            OCR noise injector, word list) — seeded, no external data.
io/         snapshot-commit parquet writer with per-partition lineage
            rows + resume (Iceberg-style semantics without the jar).
"""

__version__ = "0.1.0"

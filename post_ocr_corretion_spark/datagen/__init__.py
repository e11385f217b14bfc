"""Deterministic synthetic inputs (seeded; no external data, no network).

Builds the north-rule Common-Crawl-style table
``(url, warc_ts, html, text, lang)`` from the driver's ``documents``
parquet (ground truth), injecting OCR noise (probabilities 0.7/0.15/0.15,
correctionSentences.py:17-21) and wrapping the noisy text in synthetic
HTML with boilerplate, a skewed host distribution, and some fake-PDF
pages. Pure Python here; the Spark wrapper lives in sources/webpages.py."""

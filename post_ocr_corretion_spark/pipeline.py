"""End-to-end flagship pipeline: webpages → extract → detect → correct.

This is the reference's ``correct_sentences()`` lifecycle (main.py:28-35,
SURVEY.md §3.1) re-expressed over the north-rule web table:

  documents (ground truth)  ──►  synthetic webpages (url, warc_ts, html…)
        │                                   │
        │ lexicon (A2/U1/A3)                ▼
        │ deletion-neighborhood      extract (mapInPandas, north rule)
        ▼                                   ▼
  scorer broadcast ───────────►  detection (one pandas-UDF pass)
                                            ▼
  candidate batches (equi-joins, ──► beam loop (pure Catalyst, lockstep)
  distinct error words only)                ▼
                     (url, extracted_text, spans, corrected_text, …)

Non-``en`` pages and stubbed real-PDF pages pass through deterministically
(corrected = extracted words; FIXTURES.md F2).

Scale notes (SURVEY.md §4): by default (``fit='distributed'``) the bigram
counts are aggregated distributively (groupBy over char pairs, bit-identical
to the local fit) and membership rides a parquet sidecar loaded lazily per
Python worker — the driver never materializes the word list. ``fit='driver'``
keeps the round-1 collect() path for equality testing; ``use_bloom`` in
operators/scorer_fit.py is the further 10^9-vocabulary option (documented
fpp trade). Candidate generation runs on DISTINCT error words
(vocabulary-bounded), never per occurrence.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.scoring import NGramScorer
from .datagen.wordlist import COMMON_WORDS
from .functions.text import join_words_quirk, join_words_readable
from .operators.candidates import candidate_batches
from .operators.correction import distinct_error_words, run_beam, run_beam_udf, with_detection
from .operators.extract import extract, render_and_extract
from .operators.lexicon import build_lexicon, deletion_neighborhood
from .sources.webpages import read_documents, webpages


# per-worker frozenset membership duplicates the vocabulary per Python
# worker (32 copies/node at local[32]); above this vocabulary count the
# default fit auto-switches to spark-agg bigram counts + Bloom membership
# so per-worker memory is O(bloom bits), not O(|V|) (VERDICT r2 item 3)
AUTO_BLOOM_VOCAB_THRESHOLD = 5_000_000
# the auto path trades exactness for memory: a never-in-lexicon word can
# test positive at this rate (per probe), adding a bogus candidate or
# masking a detection — md5-deterministic, so a given corpus always
# diverges (or not) the same way. 1e-6 keeps 10^9-word filters ~3.5 GB.
AUTO_BLOOM_FPP = 1e-6


def build_scorer_broadcast(
    spark: SparkSession,
    lexicon_df: DataFrame,
    fit: str = "distributed",
    sidecar_path: str | None = None,
    bloom_threshold: int | None = None,
):
    """Broadcast one scorer per executor plus the set-like lexicon.

    ``fit='distributed'`` (default): the lexicon is written distributively
    to a parquet sidecar; each Python worker lazily builds the scorer from
    it ONCE (SidecarScorer — integer-count fits are order-independent, so
    every worker derives identical bits) and membership is the exact
    SidecarLexicon. The driver never materializes the word list, so a
    10^9-word vocabulary cannot OOM it.  Above ``bloom_threshold`` words
    (default AUTO_BLOOM_VOCAB_THRESHOLD) it auto-switches to
    Spark-aggregated counts + Bloom membership (documented
    AUTO_BLOOM_FPP trade) so per-WORKER memory stays bounded too.  The
    threshold check reads the sidecar's parquet footers — no count()
    job on the default path (VERDICT r3); above the threshold the
    already-written sidecar simply becomes the counting pass (one
    distributed pass either way on that rare branch).
    ``fit='spark-agg'``: bigram counts via a Spark aggregation instead of
    per-worker fits (the 10^8+ vocabulary path).  ``fit='driver'``: the
    round-1 collect() path, kept for the equality tests.

    ``sidecar_path``: where the lexicon sidecar lands. Defaults to
    ``spark.post_ocr.sidecarDir`` conf, else a tempdir on local masters;
    on a NON-local master with neither, sidecar fits fall back to the
    driver fit (exact, same bytes) rather than write a path executors
    cannot read (ADVICE r2) — unless the vocabulary exceeds the Bloom
    threshold, in which case the Bloom scorer takes over (it ships no
    files: the driver assembles the bitmap from executor-built block
    rows, m/8 bytes total — ADVICE r4)."""
    if fit == "driver":
        words = frozenset(r.word for r in lexicon_df.select("word").collect())
        return spark.sparkContext.broadcast(NGramScorer(words)), words

    from .operators.scorer_fit import resolve_sidecar_path, scorer_from_spark

    path = sidecar_path or resolve_sidecar_path(spark)
    if path is None:
        # the driver fit is only a safe fallback for vocabularies the
        # driver can hold; above the Bloom threshold fall through to the
        # Bloom scorer instead (ADVICE r4: it needs no shared files — the
        # bitmap is assembled from executor-side block rows whose total
        # size is the filter's own m/8 bytes, which the driver must hold
        # to broadcast anyway)
        n = lexicon_df.count()
        thr = AUTO_BLOOM_VOCAB_THRESHOLD if bloom_threshold is None else bloom_threshold
        if n > thr:
            scorer = scorer_from_spark(
                spark, lexicon_df, use_bloom=True, fpp=AUTO_BLOOM_FPP, n_words=n
            )
            return spark.sparkContext.broadcast(scorer), scorer.lexicon
        import warnings

        warnings.warn(
            "no shared sidecar location on a non-local master "
            "(set spark.post_ocr.sidecarDir or --sidecar-path); "
            "falling back to the driver-side fit",
            stacklevel=2,
        )
        words = frozenset(r.word for r in lexicon_df.select("word").collect())
        return spark.sparkContext.broadcast(NGramScorer(words)), words

    if fit == "spark-agg":
        # Spark-aggregated bigram counts (bit-identical to the local fit,
        # tested) + sidecar membership — the 10^8+-vocabulary path; costs
        # two extra Spark jobs per run, so the default below amortizes the
        # fit per worker instead (same zero-driver-materialization
        # property, same bits).
        from .operators.scorer_fit import bigram_counts, counts_matrix, write_lexicon_sidecar

        counts = counts_matrix(bigram_counts(lexicon_df))  # bounded by V², a model artifact
        side = write_lexicon_sidecar(lexicon_df, path)
        return spark.sparkContext.broadcast(NGramScorer(frozenset(), membership=side, counts=counts)), side
    from .operators.scorer_fit import SidecarScorer, write_lexicon_sidecar

    side = write_lexicon_sidecar(lexicon_df, path)
    # auto-Bloom threshold check rides the sidecar's parquet footers —
    # zero extra Spark jobs on the default path (VERDICT r3: the old
    # unconditional count() scheduled one job per pipeline run)
    thr = AUTO_BLOOM_VOCAB_THRESHOLD if bloom_threshold is None else bloom_threshold
    n = side.row_count()
    if n > thr:
        # the word sidecar doubled as the counting pass; its footers also
        # size the filter (no count() job). The Bloom bitmap rides its own
        # sidecar (a fresh resolve — never this dir, which mode-overwrite
        # would clobber), and the now-unused word parts are removed so the
        # switch leaves no orphans (ADVICE r4).
        scorer = scorer_from_spark(
            spark, lexicon_df, use_bloom=True, fpp=AUTO_BLOOM_FPP, n_words=n
        )
        import shutil

        shutil.rmtree(side.path, ignore_errors=True)  # shared-FS contract, like the sidecars
        # scorer.lexicon IS the BloomFilter (a SidecarBloom proxy here):
        # membership-only, so the UDF beam probes deletion variants
        # instead of building the per-worker SymSpell index
        # (operators/correction._worker_fns)
        return spark.sparkContext.broadcast(scorer), scorer.lexicon
    return spark.sparkContext.broadcast(SidecarScorer(side.path)), side


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    max_rounds: int | None = None,
    mode: str = "udf",
    fit: str = "distributed",
    max_distance: int = 1,
    roulette_seed: int | None = None,
    spread: str = "hash",
    sidecar_path: str | None = None,
    bloom_threshold: int | None = None,
) -> DataFrame:
    """``mode='udf'`` (default): single-pass Arrow-batched beam — the
    throughput path, zero shuffles after extraction.  ``mode='catalyst'``:
    the no-Python lockstep loop over SymSpell equi-join candidate batches.
    Both are byte-identical to the oracle (tests assert it)."""
    return run_pipeline_from_docs(
        spark, read_documents(spark, sf_dir), max_rounds, mode, fit=fit,
        max_distance=max_distance, roulette_seed=roulette_seed, spread=spread,
        sidecar_path=sidecar_path, bloom_threshold=bloom_threshold,
    )


def _render_extract_correct(
    docs: DataFrame,
    scorer_bc,
    lexicon_bc,
    max_distance: int = 1,
    roulette_seed: int | None = None,
) -> DataFrame:
    """ONE Arrow-batched stage running the whole per-doc lifecycle:
    synthetic render → extraction → (enabled ? beam-correct :
    deterministic pass-through). Exactly the composition of
    ``render_and_extract`` + ``run_beam_udf`` (same core functions, same
    per-worker memoization), minus the intermediate Arrow round trip and
    the columns the pipeline output never uses (html_bytes,
    correct_enabled). Columnar batch assembly (dict-of-lists, not
    row dicts) keeps the pandas→Arrow conversion cheap."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from .core.beam import correct_sentence, roulette_rng
    from .core.extraction import extract_document
    from .datagen.webpages import make_page
    from .operators.correction import _worker_fns

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("kind", T.StringType(), False),
            T.StructField("extracted_text", T.StringType(), False),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("start", T.LongType(), False),
                            T.StructField("end", T.LongType(), False),
                        ]
                    )
                ),
                False,
            ),
            T.StructField("corrected_words", T.ArrayType(T.StringType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = scorer_bc.value
        lexicon = lexicon_bc.value
        prob_fn, cand_fn = _worker_fns(scorer, lexicon, max_distance)
        for pdf in batches:
            urls, tss, langs, ids, kinds, texts, spans, corrs = [], [], [], [], [], [], [], []
            for r in pdf.itertuples():
                page = make_page(int(r.doc_id), r.text, r.lang)
                text, sp, kind = extract_document(page["html"])
                if page["lang"] == "en" and kind != "pdf_stub":
                    corr = correct_sentence(
                        text,
                        scorer,
                        lexicon,
                        prob_fn=prob_fn,
                        cand_fn=cand_fn,
                        rng=None if roulette_seed is None else roulette_rng(roulette_seed, text),
                    )
                else:
                    corr = text.split()
                urls.append(page["url"])
                tss.append(page["warc_ts"])
                langs.append(page["lang"])
                ids.append(int(r.doc_id))
                kinds.append(kind)
                texts.append(text)
                spans.append([{"start": s, "end": e} for s, e in sp])
                corrs.append(corr)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "lang": langs,
                    "doc_id": ids,
                    "kind": kinds,
                    "extracted_text": texts,
                    "spans": spans,
                    "corrected_words": corrs,
                }
            )

    return docs.select("doc_id", "text", "lang").mapInPandas(run, schema)


def _spread_docs(docs: DataFrame, spread: str, par: int) -> DataFrame:
    """The doc-spreading shuffle feeding the per-doc Python stage (hash
    default; ``range`` = the north rule's repartitionByRange on the doc
    hash). Factored out so the plan-audit tests can pin its
    partitioning directly — in the pipeline the shuffle is materialized
    by the overlap thread (localCheckpoint), which replaces it with a
    Scan ExistingRDD in the final plan."""
    if spread == "range":
        return docs.repartitionByRange(par, F.xxhash64("doc_id"))
    return docs.repartition(par, F.xxhash64("doc_id"))


def run_pipeline_from_docs(
    spark: SparkSession,
    docs: DataFrame,
    max_rounds: int | None = None,
    mode: str = "udf",
    partitions: int | None = None,
    fit: str = "distributed",
    max_distance: int = 1,
    roulette_seed: int | None = None,
    spread: str = "hash",
    sidecar_path: str | None = None,
    bloom_threshold: int | None = None,
    lexicon_docs: DataFrame | None = None,
) -> DataFrame:
    """``lexicon_docs``: optional smaller table to build the lexicon/scorer
    from when ``docs`` is a deterministic replication of it (--replicate
    benchmarking) — replication adds no vocabulary and build_lexicon is a
    distinct, so the lexicon (and therefore every corrected byte) is
    IDENTICAL while the fit reads 1/N of the rows (tested)."""
    from .session import ensure_package_shipped

    if roulette_seed is not None and mode != "udf":
        raise ValueError("the seeded roulette W2 mode (correctionSentences.py:302-330) is UDF-mode only")

    ensure_package_shipped(spark)
    # A single parquet file arrives as one input split; spread the per-doc
    # work (render/extract/correct are all embarrassingly parallel) across
    # every core up front. Hashing the key also breaks the skewed-host
    # clustering of the url space (SURVEY.md §4.1).  ``spread='range'``
    # is the north rule's repartitionByRange-on-url-hash: contiguous hash
    # ranges per partition, which a columnar sink can exploit for
    # min/max pruning on the key — same uniform balance, one extra
    # range-boundary sampling pass.
    #
    # r9: the repartition feeds ONLY the per-doc Python stage. The
    # lexicon/scorer job reads the RAW docs frame instead: its token
    # distinct gets map-side partial aggregation inside the scan tasks,
    # so only per-task vocabularies ever cross an exchange — routing it
    # through the repartition shuffled the ENTIRE corpus text first, an
    # extra full-corpus exchange at any scale (guide §2.4 "remove
    # shuffles outright"; measured 4× on the lexicon job at sf0.1, ~1.2×
    # at the 10× replica, where the scan is a single split — at real
    # multi-split corpora the saving is the whole text shuffle). The
    # lexicon is a distinct ∪ base — set-identical either way.
    lexicon_input = lexicon_docs if lexicon_docs is not None else docs
    par = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    docs = _spread_docs(docs, spread, par)

    # r9: OVERLAP the doc-spreading shuffle with the lexicon/scorer job
    # (guide §2.6 — Spark happily runs concurrent jobs; actions are only
    # sequential because the driver calls them sequentially). The map
    # stage's input shuffle does not depend on the sidecar, so a driver
    # thread materializes it (localCheckpoint) while the main thread
    # builds the lexicon and writes the sidecar; the correction stage
    # then reads the already-shuffled partitions. Same rows, same
    # partitioning (the checkpoint pins the exact repartition output the
    # stage would otherwise compute inline) → byte-identical output.
    # UDF mode only: the catalyst path materializes `extracted` itself.
    docs_fut = None
    if mode == "udf":
        from concurrent.futures import ThreadPoolExecutor

        _pool = ThreadPoolExecutor(max_workers=1)
        docs_fut = _pool.submit(lambda d=docs: d.localCheckpoint(eager=True))
        _pool.shutdown(wait=False)

    lexicon_df = build_lexicon(
        spark, lexicon_input, COMMON_WORDS, bucketed=(mode == "catalyst"),
    )
    if mode == "catalyst" or fit == "spark-agg":
        # only these paths traverse the lexicon frame more than once
        # (deletion neighborhood / candidate joins; bigram counts +
        # sidecar). The default udf path consumes it exactly once — the
        # sidecar write — so caching it there only added a memory-store
        # materialization to the timed run (guide §5: cache only on
        # reuse). r9 optimization; results unaffected.
        lexicon_df = lexicon_df.cache()
    scorer_bc, lex_words = build_scorer_broadcast(
        spark, lexicon_df, fit=fit, sidecar_path=sidecar_path, bloom_threshold=bloom_threshold
    )
    enabled = (F.col("lang") == "en") & (F.col("kind") != "pdf_stub")

    if mode == "udf":
        # throughput path (r9): render+extract+correct fused into ONE
        # Arrow-batched stage — the old two-stage form shipped every
        # intermediate column (extracted_text, the spans struct array,
        # html_bytes, …) JVM→Python→JVM→Python between extraction and
        # correction; since both ends are per-row pure functions over the
        # same row, fusing removes that entire Arrow round trip (guide
        # §4.1: you control how many columns cross the boundary). Output
        # is byte-identical to render_and_extract + run_beam_udf — the
        # parity suite asserts it.
        lexicon_bc = spark.sparkContext.broadcast(lex_words)
        corrected = _render_extract_correct(
            docs_fut.result() if docs_fut is not None else docs,
            scorer_bc,
            lexicon_bc,
            max_distance=max_distance,
            roulette_seed=roulette_seed,
        )
    else:
        extracted = extract(webpages(docs)).localCheckpoint(eager=True)  # materialize once for both branches
        correctable = extracted.filter(enabled)
        from .functions.text import sentence_words

        passthrough = extracted.filter(~enabled).withColumn(
            "corrected_words", sentence_words(F.col("extracted_text"))
        )
        lex_del = deletion_neighborhood(lexicon_df)
        detected = with_detection(correctable, scorer_bc)
        err_words = distinct_error_words(detected)
        cand_agg = candidate_batches(err_words, lexicon_df, lex_del, scorer_bc, max_distance=max_distance).cache()
        cand_agg.count()  # materialize before the loop
        if max_rounds is not None:
            # round-truncation only exists on the lockstep loop
            beamed = run_beam(detected, cand_agg, max_rounds=max_rounds)
        else:
            # default: the single-expression fold — one broadcast join,
            # one shuffle, no driver loop (5.8× the lockstep at sf0.01,
            # byte-identical; operators/correction.run_beam_fold)
            from .operators.correction import run_beam_fold

            beamed = run_beam_fold(detected, cand_agg)
        corrected = beamed.drop(
            "words", "probs", "psum", "n", "errors"
        ).unionByName(passthrough)
    out_cols = ["url", "warc_ts", "lang", "doc_id", "kind", "extracted_text", "spans", "corrected_words"]
    result = corrected.select(*out_cols)
    return result.select(
        "url",
        "warc_ts",
        "lang",
        "doc_id",
        "kind",
        "extracted_text",
        "spans",
        join_words_quirk(F.col("corrected_words")).alias("corrected_text"),
        join_words_readable(F.col("corrected_words")).alias("corrected_readable"),
    )

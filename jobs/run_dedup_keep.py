"""spark-submit entry for the end-to-end dedup job: MinHash-LSH pair
graph → connected components → quality-argmax canonical per duplicate
family → snapshot-committed KEPT training table (VERDICT r5 item 7 —
the individually-gated dedup stages, composed and shipped).

    cd /root/repo && zip -r /tmp/pkg.zip post_ocr_corretion_spark
    spark-submit --py-files /tmp/pkg.zip jobs/run_dedup_keep.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/dedup_keep_out

Four optional downstream stages make it the full training-table build:
``--decontaminate-bench LO:HI`` drops kept docs sharing word n-grams
with the benchmark range (operators/scrub.decontaminate, drop mode),
``--substring-scrub K`` cuts corpus-duplicated spans of >= K tokens out
of the kept text (operators/substring_dedup, Lee et al. 2021),
``--redact-pii`` replaces email/IPv4/phone with sentinels in the kept
text (per-class hit totals join the counters), and ``--shuffle-shards
N`` [``--shuffle-seed S``] assigns every surviving doc a reproducible
(shard, pos_in_shard) training layout (operators/shuffle.py). The
stage order — dedup → decontaminate → substring-scrub → redact →
shuffle → snapshot — is deliberate: dedup first so every later stage
pays per KEPT doc; decontaminate before any rewrite so sentinel tokens
can't mask an n-gram overlap; substring-scrub before redact because
PII sentinels are intentionally repeated tokens (scrubbing after
redaction would see sentinel-dense windows as corpus duplicates and
cut real text around them); shuffle last so positions cover exactly
the rows being written.

Same sink contract as run_extract_correct.py: atomic manifest commit,
per-file lineage rows, crash-safe resume (re-run → ``"resumed": true``
with no recompute), ``--new-snapshot`` to append. Counters (docs_in,
docs_kept, dup_docs_removed, + *_redacted with --redact-pii) are
collected via df.observe on the FINAL written table — a by-product of
the write, not an extra pass.

``--incremental`` turns the job into a CHANGELOG build: the first run
is the full pipeline plus a persisted LSH band state
(<out>/lsh_state/sid=N, one (doc_id, band) row per banded doc — kept
AND dropped, since later docs can collide with a dropped doc's
bucket); every later run shingles/bands ONLY the docs absent from the
state, joins them against the prior bands (prior × prior never
recomputes), and appends the newly-kept docs as a DELTA snapshot —
readers union snapshots for the full training table. Grow-only
semantics (shipped docs are never evicted) per
operators.dedup.dedup_keep_incremental, which also states the
differential-exactness contract vs the full rebuild. Incremental-mode
counters add docs_new_in / dropped_as_prior_dup. The downstream stages
apply to each increment's kept delta too — decontaminate and redact are
per-row, so a flag-consistent run sequence covers every shipped row
exactly once; --shuffle-shards keeps id-stable shards but positions are
per-snapshot (global training order = snapshot_id, shard,
pos_in_shard); --substring-scrub is REFUSED in incremental mode because
its "corpus-duplicated span" is defined over the whole table and a
delta-only scrub would silently diverge from the full rebuild.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", required=True)
    parser.add_argument("--max-doc", type=int, default=None, help="restrict to doc_id < N (demo/CI)")
    parser.add_argument("--n-hashes", type=int, default=4)
    parser.add_argument("--bands", type=int, default=2)
    parser.add_argument("--rows-per-band", type=int, default=2)
    parser.add_argument("--shingle-k", type=int, default=5)
    parser.add_argument(
        "--decontaminate-bench",
        default=None,
        metavar="LO:HI",
        help="drop kept docs sharing any word n-gram (--decontaminate-n) with "
        "docs in this doc_id range (the range stands in for an eval benchmark)",
    )
    parser.add_argument("--decontaminate-n", type=int, default=8)
    parser.add_argument(
        "--redact-pii",
        action="store_true",
        help="replace email/IPv4/phone with sentinel tokens in the kept text "
        "(text column is REPLACED; per-class hit totals land in the counters)",
    )
    parser.add_argument(
        "--substring-scrub",
        type=int,
        default=None,
        metavar="K",
        help="remove corpus-duplicated token spans of >= K tokens from kept text",
    )
    parser.add_argument(
        "--shuffle-shards",
        type=int,
        default=None,
        metavar="N",
        help="assign (shard, pos_in_shard) over N shards to the written table",
    )
    parser.add_argument("--shuffle-seed", default="0")
    parser.add_argument("--new-snapshot", action="store_true")
    parser.add_argument(
        "--incremental",
        action="store_true",
        help="changelog mode: persist the LSH band state under "
        "<out>/lsh_state/sid=N per snapshot; on re-run, only docs whose "
        "ids are not in the state are shingled/banded (the delta), "
        "joined against the prior band state, and appended as a DELTA "
        "snapshot of newly-kept docs (grow-only: shipped docs are never "
        "evicted — see operators.dedup.dedup_keep_incremental)",
    )
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args(argv)
    if args.n_hashes != args.bands * args.rows_per_band:
        parser.error("--n-hashes must equal --bands * --rows-per-band")
    if args.incremental and args.substring_scrub:
        parser.error(
            "--substring-scrub is full-rebuild-only: its 'corpus-duplicated "
            "span' is defined over the WHOLE table, and a delta-only scrub "
            "would silently diverge from the full rebuild (spans duplicated "
            "between a new doc and a prior snapshot are invisible to it)"
        )

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.io.snapshots import SnapshotWriter
    from post_ocr_corretion_spark.operators.dedup import dedup_pipeline_keep
    from post_ocr_corretion_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="dedup_keep", cores=args.cores)
    obs = Observation("dedup_counters")

    def post_dedup_stages(kept, counters):
        """decontaminate → substring-scrub → redact → shuffle, SHARED by
        the full and incremental paths (previously incremental silently
        skipped them). In incremental mode each stage applies to the
        DELTA's kept docs, which matches the full rebuild exactly for the
        per-row stages (decontaminate drops and redact rewrites one doc
        at a time — prior snapshots were processed by their own run, so a
        flag-consistent run sequence covers every shipped row once);
        substring-scrub is corpus-global and is refused up-front in
        incremental mode. Shuffle caveat: shard is id-stable (md5) but
        pos_in_shard is a rank WITHIN the rows being written, so in
        incremental mode positions are per-snapshot — the global training
        order is (snapshot_id, shard, pos_in_shard)."""
        if args.decontaminate_bench:
            from post_ocr_corretion_spark.operators.scrub import decontaminate

            lo, hi = (int(x) for x in args.decontaminate_bench.split(":"))
            bench = (
                spark.read.parquet(f"{args.sf_dir}/documents.parquet")
                .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
                .select("text")
            )
            kept = decontaminate(kept, bench, n=args.decontaminate_n, mode="drop")
        if args.substring_scrub:
            from post_ocr_corretion_spark.operators.substring_dedup import (
                remove_repeated_spans,
            )

            kept = remove_repeated_spans(kept, k=args.substring_scrub)
            counters = counters + [
                F.coalesce(F.sum("n_removed_tokens"), F.lit(0)).alias(
                    "span_tokens_removed"
                )
            ]
        if args.redact_pii:
            from post_ocr_corretion_spark.operators.scrub import redact_pii

            kept = (
                redact_pii(kept)
                .drop("text")
                .withColumnRenamed("text_redacted", "text")
            )
            counters = counters + [
                F.coalesce(F.sum("n_email"), F.lit(0)).alias("emails_redacted"),
                F.coalesce(F.sum("n_ipv4"), F.lit(0)).alias("ips_redacted"),
                F.coalesce(F.sum("n_phone"), F.lit(0)).alias("phones_redacted"),
            ]
        if args.shuffle_shards:
            from post_ocr_corretion_spark.operators.shuffle import deterministic_shuffle

            kept = deterministic_shuffle(
                kept, n_shards=args.shuffle_shards, seed=args.shuffle_seed
            )
        return kept, counters

    def job():
        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        if args.max_doc is not None:
            docs = docs.filter(F.col("doc_id") < args.max_doc)
        kept = dedup_pipeline_keep(
            docs,
            n_hashes=args.n_hashes,
            bands=args.bands,
            rows_per_band=args.rows_per_band,
            shingle_k=args.shingle_k,
        )
        counters = [
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum(F.col("cluster_size")).alias("docs_in"),
            F.sum(F.col("cluster_size") - 1).alias("dup_docs_removed"),
        ]
        kept, counters = post_dedup_stages(kept, counters)
        return kept.observe(obs, *counters)

    counters_fn = lambda: {k: int(v) for k, v in obs.get.items()}  # noqa: E731
    writer = SnapshotWriter(args.out)
    if args.incremental:
        import os

        from post_ocr_corretion_spark.operators.dedup import (
            dedup_keep_incremental,
            lsh_band_keys,
        )

        state_dir = os.path.join(args.out, "lsh_state")
        band_kw = dict(
            n_hashes=args.n_hashes,
            bands=args.bands,
            rows_per_band=args.rows_per_band,
            shingle_k=args.shingle_k,
        )
        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        if args.max_doc is not None:
            docs = docs.filter(F.col("doc_id") < args.max_doc)
        has_state = os.path.isdir(state_dir) and any(
            d.startswith("sid=") for d in os.listdir(state_dir)
        )
        if not has_state:
            # first batch: the normal full pipeline + snapshot, then seed
            # the band state for EVERY input doc (kept and dropped alike —
            # a later doc may collide with a dropped one's bucket)
            _, resumed = writer.resume_or_run(
                spark, job, key_col="doc_id", counters_fn=counters_fn
            )
            sid = writer.latest()
            new_bands = lsh_band_keys(docs, **band_kw)
        else:
            prior = spark.read.parquet(os.path.join(state_dir, "sid=*"))
            new_docs = docs.join(
                prior.select("doc_id").distinct(), "doc_id", "left_anti"
            )
            n_new = new_docs.count()  # one delta-sized scan, for the drop counter
            kept, new_bands = dedup_keep_incremental(
                new_docs, prior.filter(F.col("band").isNotNull()), **band_kw
            )
            # two observations on ONE plan (both collected during the
            # single write action — no extra pass): the dedup counters
            # attach BEFORE the optional stages so a decontaminate-drop
            # can't masquerade as dropped_as_prior_dup; docs_kept and the
            # stage counters attach to the final written rows.
            inc_obs = Observation("inc_counters")
            kept = kept.observe(
                inc_obs,
                F.coalesce(F.sum("cluster_size"), F.lit(0)).alias("docs_in"),
                F.coalesce(F.sum(F.col("cluster_size") - 1), F.lit(0)).alias(
                    "dup_docs_removed"
                ),
            )
            kept, stage_counters = post_dedup_stages(
                kept, [F.count(F.lit(1)).alias("docs_kept")]
            )
            stage_obs = Observation("inc_stage_counters")
            kept = kept.observe(stage_obs, *stage_counters)

            def inc_counters():
                c = {k: int(v) for k, v in inc_obs.get.items()}
                c.update({k: int(v) for k, v in stage_obs.get.items()})
                c["docs_new_in"] = n_new
                c["dropped_as_prior_dup"] = n_new - c["docs_in"]
                return c

            sid = writer.write(kept, key_col="doc_id", counters_fn=inc_counters)
            resumed = False
        # append-only state: each increment adds ONLY its own docs' band
        # rows, committed by atomic directory rename right after the
        # snapshot commit. Crash window honesty: for the FIRST batch a
        # crash between the two is fully healed (resume_or_run reuses
        # the committed snapshot, the state is recomputed from the same
        # input); for later increments a crash between snapshot commit
        # and state rename makes the next run re-examine this batch —
        # its kept docs would be re-kept into a second delta (duplicate
        # rows across snapshots, surfaced by SnapshotWriter.diff), and a
        # new-new family can admit a second member on the retry.
        # Exactly-once across BOTH artifacts needs a transactional
        # catalog spanning them (the Iceberg scope note in COVERAGE.md).
        sdir = os.path.join(state_dir, f"sid={sid}")
        if not os.path.isdir(sdir):
            os.makedirs(state_dir, exist_ok=True)
            tmp = sdir + ".tmp"
            new_bands.write.mode("overwrite").parquet(tmp)
            os.rename(tmp, sdir)
    elif args.new_snapshot and writer.latest() is not None:
        sid = writer.write(job(), key_col="doc_id", counters_fn=counters_fn)
        resumed = False
    else:
        _, resumed = writer.resume_or_run(spark, job, key_col="doc_id", counters_fn=counters_fn)
        sid = writer.latest()
    print(
        json.dumps(
            {
                "snapshot_id": sid,
                "resumed": resumed,
                "rows": writer.manifest(sid)["rows"],
                "lineage_files": writer.read_lineage(spark, sid).count(),
                "counters": writer.manifest(sid).get("counters"),
            },
            default=str,
        )
    )
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

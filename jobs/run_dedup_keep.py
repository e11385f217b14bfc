"""spark-submit entry for the end-to-end dedup job: MinHash-LSH pair
graph → connected components → quality-argmax canonical per duplicate
family → snapshot-committed KEPT training table (VERDICT r5 item 7 —
the individually-gated dedup stages, composed and shipped).

    cd /root/repo && zip -r /tmp/pkg.zip post_ocr_corretion_spark
    spark-submit --py-files /tmp/pkg.zip jobs/run_dedup_keep.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/dedup_keep_out

Same sink contract as run_extract_correct.py: atomic manifest commit,
per-file lineage rows, crash-safe resume (re-run → ``"resumed": true``
with no recompute), ``--new-snapshot`` to append. Counters: docs_in,
docs_kept, dup_docs_removed — collected via df.observe so the kept
count is a by-product of the write, not an extra pass.
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
    parser.add_argument("--new-snapshot", action="store_true")
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args(argv)
    if args.n_hashes != args.bands * args.rows_per_band:
        parser.error("--n-hashes must equal --bands * --rows-per-band")

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.io.snapshots import SnapshotWriter
    from post_ocr_corretion_spark.operators.dedup import dedup_pipeline_keep
    from post_ocr_corretion_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="dedup_keep", cores=args.cores)
    obs = Observation("dedup_counters")

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
        return kept.observe(
            obs,
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum(F.col("cluster_size")).alias("docs_in"),
            F.sum(F.col("cluster_size") - 1).alias("dup_docs_removed"),
        )

    counters_fn = lambda: {k: int(v) for k, v in obs.get.items()}  # noqa: E731
    writer = SnapshotWriter(args.out)
    if args.new_snapshot and writer.latest() is not None:
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

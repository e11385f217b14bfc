"""Benchmark harness.

Default mode (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line
``{"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}``.

``--scaling`` mode (north rule evidence): runs the end-to-end
extract+correct job at two parallelism levels (local[N] and local[4N],
the sandbox stand-in for N vs 4N executors) on the SAME input, reports
docs/sec + GB/s at both and the scaling efficiency
throughput(4N) / (4 × throughput(N)), and rewrites BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "flagship_correct",
    "j4_revenue_by_nation",
    "a6_cumulative_share",
    "j3_band_join",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "streaming_window",
    "a2_lexicon_words",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# a fixed pure-SQL query (untouched since r2, no Python stages) run
# between every headline query as a HOST-NOISE index: its spread across
# the bench is co-tenant interference, not code (VERDICT r4 item 2 — the
# artifact itself must carry the evidence the r3/r4 regression post-hoc
# A/Bs had to reconstruct)
CONTROL_QUERY = "j4_revenue_by_nation"


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3)


def run_headline(
    spark, sf_dir: str, repeats: int | None = None
) -> tuple[dict[str, float], dict[str, float], dict[str, list[float]], list[float]]:
    """Median-of-N per query (default 5, SPARK_GRAFT_BENCH_REPEATS), with
    min and the raw per-repeat walls disclosed alongside (VERDICT r4
    item 2: best-of-2 couldn't defend itself against this host's 5×
    same-code swings between adjacent windows — medians plus an in-record
    control spread make the artifact self-describing). The control query
    runs once before each headline query, so its samples bracket the
    whole bench in time."""
    import __spark_entry__ as entrymod

    repeats = repeats or int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    max_repeats = max(
        repeats, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPEATS", "9"))
    )
    qs = entrymod.queries()
    med: dict[str, float] = {}
    mins: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    control: list[float] = []
    _run_noop(qs[CONTROL_QUERY](spark, sf_dir))  # untimed: exclude first-run plan compile from the noise index
    for name in HEADLINE:
        t0 = time.time()
        _run_noop(qs[CONTROL_QUERY](spark, sf_dir))
        control.append(round(time.time() - t0, 3))
        rs = []
        for _ in range(repeats):
            t0 = time.time()
            _run_noop(qs[name](spark, sf_dir))
            rs.append(round(time.time() - t0, 3))
        # VERDICT r7 item 3 (the a6 lesson: raws still descending at the
        # final repeat mean the minimum never converged in-window):
        # while the LAST wall is a STRICT new minimum (still
        # descending — a flat tie is converged), keep repeating up to
        # max_repeats so min/median describe steady state, not a cold
        # tail
        while len(rs) < max_repeats and rs[-1] < min(rs[:-1]):
            t0 = time.time()
            _run_noop(qs[name](spark, sf_dir))
            rs.append(round(time.time() - t0, 3))
        raw[name] = rs
        med[name] = _median(rs)
        mins[name] = min(rs)
    return med, mins, raw, control


def flagship_stats(spark, sf_dir: str) -> tuple[int, int]:
    """(n_docs, html_bytes) of the flagship input — untimed."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.extract import extract
    from post_ocr_corretion_spark.sources.webpages import webpages_from_sf

    row = (
        extract(webpages_from_sf(spark, sf_dir))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("html_bytes").alias("b"))
        .collect()[0]
    )
    return int(row.n), int(row.b)


def main() -> None:
    from post_ocr_corretion_spark.session import get_spark

    if "--scaling" in sys.argv:
        run_scaling()
        return
    if "--scaling-submit" in sys.argv:
        run_scaling_submit()
        return
    if "--arrow-sweep" in sys.argv:
        run_arrow_sweep()
        return
    if "--history" in sys.argv:
        run_history()
        return
    if "--ivf-store-bench" in sys.argv:
        run_ivf_store_bench()
        return
    if "--pq-bench" in sys.argv:
        run_pq_bench()
        return

    spark = get_spark(app_name="bench", cores=CPUS)
    # untimed warm-up at the smoke scale: JVM JIT, parquet reader, Python
    # worker pool — bench measures steady-state throughput, not boot cost.
    # The smoke path derives from SF_DIR (VERDICT r4 item 3: a hard-coded
    # /root/testdata/sf0.001 crashed the headline run under any other
    # SPARK_GRAFT_SF_DIR layout); falls back to SF_DIR itself.
    import __spark_entry__ as entrymod

    smoke = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(smoke):
        smoke = SF_DIR
    # start load-average BEFORE any bench work: the shipped-scaling
    # discipline's quiet-window evidence, now in the headline artifact
    # too (VERDICT r7 item 3)
    load_start = [round(x, 2) for x in os.getloadavg()]
    _run_noop(entrymod.queries()["flagship_correct"](spark, smoke))
    med, mins, raw_times, control = run_headline(spark, SF_DIR)
    total = round(sum(med.values()), 3)
    n_docs, html_bytes = flagship_stats(spark, SF_DIR)
    flag = med["flagship_correct"]
    ctrl_med = _median(control)
    out = {
        "metric": "headline_queries_total_time",
        "value": total,  # sum of per-query MEDIANS (repeats disclosed below)
        "unit": "sec",
        "queries": med,
        "queries_min": mins,
        "total_min": round(sum(mins.values()), 3),
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        # base repeat count; queries whose walls were still descending
        # at the base count carry MORE raws (self-describing below)
        "repeats": int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")),
        "max_repeats": max(len(r) for r in raw_times.values()),
        # host quiet-window evidence (1/5/15-min load averages)
        "load_avg_start": load_start,
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        "flagship_docs_per_sec": round(n_docs / flag, 2) if flag else None,
        "flagship_gb_per_sec": round(html_bytes / 1e9 / flag, 4) if flag else None,
        "flagship_docs": n_docs,
        "flagship_html_gb": round(html_bytes / 1e9, 4),
        "raw_times": raw_times,  # per-repeat walls; headline = median
        # host-noise index: a fixed pure-SQL control query interleaved
        # across the bench; spread here is the host, not the code
        "noise_control": {
            "query": CONTROL_QUERY,
            "raw": control,
            "median": ctrl_med,
            "spread_pct": round((max(control) / max(min(control), 1e-9) - 1) * 100, 1),
        },
    }
    spark.stop()
    print(json.dumps(out))


def _scaled_docs(spark, sf_dir: str, rep: int):
    """Deterministically replicate the documents table ×rep (doc_id' =
    doc_id + 10^7·k) so the scaling run is compute-bound: pages are a pure
    function of doc_id, so this IS a larger instance of the same table."""
    from post_ocr_corretion_spark.sources.webpages import replicate_docs

    return replicate_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"), rep)


def run_scaling() -> None:
    from post_ocr_corretion_spark.session import get_spark

    rep = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "24"))
    levels = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", f"2,8,{CPUS}").split(",")]
    partitions = 64  # FIXED task granularity at every level
    results = {}
    n_docs = html_bytes = 0
    for cores in levels:
        spark = get_spark(app_name=f"bench-scaling-{cores}", cores=cores)
        from pyspark.sql import functions as F

        from post_ocr_corretion_spark.operators.correction import run_beam_udf
        from post_ocr_corretion_spark.operators.extract import render_and_extract
        from post_ocr_corretion_spark.operators.lexicon import build_lexicon
        from post_ocr_corretion_spark.datagen.wordlist import COMMON_WORDS
        from post_ocr_corretion_spark.pipeline import build_scorer_broadcast

        # prologue (untimed): the lexicon/scorer is a constant model
        # artifact — replication adds no vocabulary, and in production it
        # is built once and amortized over the whole corpus
        lex_df = build_lexicon(spark, spark.read.parquet(f"{SF_DIR}/documents.parquet"), COMMON_WORDS)
        scorer_bc, lex_words = build_scorer_broadcast(spark, lex_df)
        lexicon_bc = spark.sparkContext.broadcast(lex_words)

        def job(rep_n):
            # replicate AFTER repartitioning so the fan-out itself is
            # parallel (no serial shuffle-write of the big table)
            from post_ocr_corretion_spark.sources.webpages import replicate_docs

            base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            docs_df = replicate_docs(base.repartition(partitions, F.xxhash64("doc_id")), rep_n)
            ext = render_and_extract(docs_df)
            enabled = (F.col("lang") == "en") & (F.col("kind") != "pdf_stub")
            return run_beam_udf(
                ext.withColumn("correct_enabled", enabled),
                scorer_bc,
                lexicon_bc,
                enabled_col="correct_enabled",
            )

        # warm-up pass (JIT + python worker pool), then best-of-N timed
        # passes: single-pass walls on this host swing ±60% between
        # adjacent windows (same-code 2-core walls of 35.6 vs 56.7 s
        # measured back-to-back in r5), so the minimum is the plan's
        # cost and the raw walls ride along for audit
        _run_noop(job(2))
        walls = []
        for _ in range(int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))):
            t0 = time.time()
            _run_noop(job(rep))
            walls.append(round(time.time() - t0, 2))
        elapsed = min(walls)
        if not n_docs:
            row = (
                render_and_extract(_scaled_docs(spark, SF_DIR, rep).repartition(partitions))
                .agg(F.count(F.lit(1)).alias("n"), F.sum("html_bytes").alias("b"))
                .collect()[0]
            )
            n_docs, html_bytes = int(row.n), int(row.b)
        results[cores] = {
            "sec": round(elapsed, 2),
            "raw_sec": walls,
            "docs_per_sec": round(n_docs / elapsed, 2),
            "gb_per_sec": round(html_bytes / 1e9 / elapsed, 4),
        }
        spark.stop()
        time.sleep(2)

    def eff(a, b):
        return round(results[b]["docs_per_sec"] / (results[a]["docs_per_sec"] * (b / a)), 3)

    pairs = {f"{a}->{b}": eff(a, b) for a, b in zip(levels, levels[1:])}
    primary = eff(levels[0], levels[1]) if len(levels) > 1 else 1.0
    out = {
        "metric": "scaling_efficiency",
        "value": primary,
        "unit": "ratio",
        "pairs": pairs,
        "levels": {str(k): v for k, v in results.items()},
        "sf": _sf_of(SF_DIR),
        "docs": n_docs,
        "html_gb": round(html_bytes / 1e9, 4),
    }
    print(json.dumps(out))
    _write_baseline_md(out)


def run_scaling_submit() -> None:
    """North-rule literal form: the SHIPPED job (spark-submit --py-files
    jobs/run_extract_correct.py) run end-to-end at N and 4N cores on the
    SAME replicated input, fresh snapshot dir each run. The job wall
    includes a fixed cost (JVM startup + driver init + snapshot commit)
    that a long-running cluster job amortizes to nothing, so per level we
    ALSO run a calibration job on the tiny sf0.001 input and report both
    the raw efficiency and the startup-adjusted one
    (docs / (wall − calibration)). Appends to BENCH/BASELINE.md."""
    import shutil
    import subprocess
    import tempfile

    import pyspark

    levels = [int(x) for x in os.environ.get("SPARK_GRAFT_SUBMIT_LEVELS", "2,8").split(",")]
    sf_dir = os.environ.get("SPARK_GRAFT_SUBMIT_SF", SF_DIR)
    replicate = int(os.environ.get("SPARK_GRAFT_SUBMIT_REP", "24"))
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    repo = os.path.dirname(os.path.abspath(__file__))
    workdir = tempfile.mkdtemp(prefix="bench_submit_")
    pkg = os.path.join(workdir, "pkg.zip")
    subprocess.run(["zip", "-qr", pkg, "post_ocr_corretion_spark"], check=True, cwd=repo)

    attempts = int(os.environ.get("SPARK_GRAFT_SUBMIT_ATTEMPTS", "2"))

    raw_walls: dict[str, list[float]] = {}

    def run_job(cores: int, sf: str, rep: int, tag: str, sink: str = "snapshot") -> tuple[float, int]:
        best, rows = None, 0
        raw_walls[tag] = []
        for attempt in range(attempts):  # best-of-N (see run_headline note)
            out_dir = os.path.join(workdir, f"out_{tag}_{attempt}")
            t0 = time.time()
            proc = subprocess.run(
                [
                    submit, "--master", f"local[{cores}]", "--py-files", pkg,
                    "jobs/run_extract_correct.py", "--sf-dir", sf, "--out", out_dir,
                    "--cores", str(cores), "--replicate", str(rep), "--sink", sink,
                ],
                capture_output=True, text=True, cwd=repo, check=True,
            )
            el = time.time() - t0
            raw_walls[tag].append(round(el, 2))
            best = el if best is None else min(best, el)
            rows = json.loads(proc.stdout.strip().splitlines()[-1])["rows"]
        return best, rows

    results = {}
    n_docs = 0
    # calibration input: smallest sibling SF of the measured dir, else the
    # dir itself (same SF_DIR-derivation rule as the headline warm-up)
    cal_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(cal_sf):
        cal_sf = sf_dir
    both_sinks = os.environ.get("SPARK_GRAFT_SUBMIT_BOTH_SINKS", "1") == "1"
    for cores in levels:
        cal, _ = run_job(cores, cal_sf, 1, f"cal{cores}")
        wall, n_docs = run_job(cores, sf_dir, replicate, f"run{cores}")
        marginal = max(wall - cal, 1e-6)
        results[cores] = {
            "sec": round(wall, 2),
            "calibration_sec": round(cal, 2),
            "docs_per_sec": round(n_docs / wall, 2),
            "adj_docs_per_sec": round(n_docs / marginal, 2),
        }
        if both_sinks:
            # compute-only form: the IDENTICAL job into Spark's noop sink
            # — separates compute scaling from the snapshot-write path,
            # so a shared-disk write bottleneck (which a real cluster's
            # per-executor storage wouldn't have) is visible IN-RECORD
            nwall, _ = run_job(cores, sf_dir, replicate, f"noop{cores}", sink="noop")
            results[cores]["noop_sec"] = round(nwall, 2)
            results[cores]["noop_adj_docs_per_sec"] = round(n_docs / max(nwall - cal, 1e-6), 2)
            results[cores]["write_path_sec"] = round(wall - nwall, 2)
    a, b = levels[0], levels[-1]

    def eff(key):
        return round(results[b][key] / (results[a][key] * (b / a)), 3)

    # VERDICT r5 item 4: the write-path split is only citable where the
    # noop-vs-full ordering is noise-consistent. A level whose best noop
    # wall is not faster than the best full wall has a write share below
    # the host noise floor — the cross-level compute-only efficiency is
    # then NOT citable (it divides two unresolvable differences).
    inverted = (
        [k for k, v in results.items() if v["noop_sec"] >= v["sec"]] if both_sinks else []
    )
    out = {
        "metric": "scaling_efficiency_spark_submit",
        "value": eff("adj_docs_per_sec"),
        "raw_value": eff("docs_per_sec"),
        "compute_only_value": eff("noop_adj_docs_per_sec") if both_sinks else None,
        "compute_only_citable": (not inverted) if both_sinks else None,
        "inverted_noop_levels": inverted or None,
        "unit": "ratio",
        "levels": {str(k): v for k, v in results.items()},
        "sf": _sf_of(sf_dir),
        "docs": n_docs,
        "raw_walls": raw_walls,
        "note": "shipped job end-to-end; value = startup-adjusted (docs/(wall-calibration)), raw_value = uncorrected walls",
    }
    print(json.dumps(out))
    # replace (not duplicate) any previous shipped-job section
    try:
        with open("BENCH/BASELINE.md") as f:
            old = f.read()
        i = old.find("\n## Shipped-job scaling")
        if i != -1:
            with open("BENCH/BASELINE.md", "w") as f:
                f.write(old[:i].rstrip() + "\n")
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "a") as f:
        rows = "\n".join(
            f"| local[{k}] | {v['sec']} | {v['calibration_sec']} | {v.get('noop_sec', '—')} | "
            f"{v['docs_per_sec']} | {v['adj_docs_per_sec']} | {v.get('noop_adj_docs_per_sec', '—')} |"
            for k, v in sorted(results.items())
        )
        raws = "\n".join(
            f"- `{tag}`: {walls}" for tag, walls in raw_walls.items()
        )
        if not both_sinks:
            noop_line = ""
        elif inverted:
            lv = ", ".join(f"local[{k}]" for k in sorted(inverted))
            noop_line = (
                f" The compute-only (noop-sink) form is reported per level in "
                f"the table, but at {lv} the best noop wall measured NO FASTER "
                f"than the full snapshot-writing job — the write share there is "
                f"below the host noise floor, so the cross-level compute-only "
                f"efficiency ({eff('noop_adj_docs_per_sec')}) is NOT citable and "
                f"no write-path split is claimed at that level."
            )
        else:
            noop_line = (
                f" The compute-only form (same job, Spark noop sink — no snapshot/"
                f"lineage IO) measures **{eff('noop_adj_docs_per_sec')}**, separating "
                f"compute scaling from the shared-disk write path (a real cluster "
                f"writes to per-executor storage)."
            )
        f.write(
            f"""

## Shipped-job scaling (spark-submit, north-rule literal form)

`spark-submit --py-files pkg.zip jobs/run_extract_correct.py` end to end
(JVM startup + lexicon/scorer fit + extract+correct + snapshot-committed
write) at two parallelism levels on {sf_dir} ×{replicate}
({n_docs} docs), fresh snapshot dir per run, best-of-{attempts}. The fixed
startup (JVM + driver init + commit; measured per level by a calibration
run on the smallest sibling SF) amortizes to nothing on a long-running
cluster job, so both the raw and the startup-adjusted efficiencies are
reported. Raw walls per attempt (VERDICT r5 item 4 — the split claim is
only citable when the ordering is noise-consistent across attempts):

{raws}


| parallelism | wall sec | calibration sec | noop-sink sec | docs/sec (raw) | docs/sec (adjusted) | docs/sec (noop, adjusted) |
|---|---|---|---|---|---|---|
{rows}

**{a} → {b} cores: adjusted efficiency {eff('adj_docs_per_sec')}
(raw {eff('docs_per_sec')})** — the adjusted number is the shipped-job
analog of the in-process steady-state measurement above.{noop_line}

Reproduce: `python bench.py --scaling-submit` (SPARK_GRAFT_SUBMIT_LEVELS,
SPARK_GRAFT_SUBMIT_SF, SPARK_GRAFT_SUBMIT_REP, SPARK_GRAFT_SUBMIT_ATTEMPTS,
SPARK_GRAFT_SUBMIT_BOTH_SINKS).
"""
        )
    shutil.rmtree(workdir, ignore_errors=True)


def _replicated_corpus(spark, rep: int, n_q: int):
    """(corpus, queries, n_corpus): the SF embeddings replicated ×rep
    with a deterministic per-element perturbation (replicas are
    near-duplicates, not exact ties), re-normalized, materialized once
    (localCheckpoint) so generation is outside every timed wall. The
    two-param transform lambda is the (element, index) form — the index
    feeds the hash on purpose."""
    from pyspark.sql import functions as F

    base = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # spread the (single-file) base BEFORE the ×rep explode so
        # generation runs on every core, not one task
        .repartition(CPUS)
    )
    rep_ids = base.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))).withColumn(
        "vec_id", F.col("vec_id") + F.col("k").cast("long") * F.lit(10_000_000)
    )
    noised = rep_ids.withColumn(
        "v",
        F.transform(
            "v",
            lambda x, i: x
            + (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast("double") / 1000.0 - 0.5)
            * 0.02,
        ),
    )
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    corpus = (
        noised.filter(norm > 0)
        .select("vec_id", F.transform("v", lambda x: x / norm).alias("v"))
        # already CPUS balanced partitions from the pre-explode
        # repartition — no second 1M-row shuffle here
        .localCheckpoint()
    )
    n_corpus = corpus.count()
    queries = (
        corpus.filter(F.col("vec_id") < n_q)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
        .localCheckpoint()
    )
    return corpus, queries, n_corpus


def run_ivf_store_bench() -> None:
    """IVF-partitioned raw-vector store: measure what file-level pruning
    actually buys the exact re-rank scan (operators/ivf_store.py — the
    PLANS.md row ivf_store's docstring points at). Two searches with
    IDENTICAL results: (a) the pruned read (list_id IN probed →
    PartitionFilters prune directories before a row is read) vs (b) the
    same store read WITHOUT the partition predicate (every file) joined
    to the same probe frame — so the delta is purely the storage-layer
    prune. Reports probed/total parquet FILE counts (the structural
    ratio, host-independent) plus best-of-N walls. Env:
    SPARK_GRAFT_IVF_REP (default 64), SPARK_GRAFT_IVF_QUERIES (3),
    SPARK_GRAFT_BENCH_REPEATS (3).

    The pruned fraction is |union of the batch's probed lists| /
    n_lists — a LARGE query batch's union covers every list and erodes
    file pruning to nothing (measured: 20 queries × nprobe 4 over 16
    lists → 16/16). The store's win is for small/targeted batches; a
    deployment shards big batches by probe locality. The default here
    is 3 queries (the gated query's shape)."""
    import glob

    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.ivf_store import (
        ivf_pruned_topk,
        probe_lists,
        write_ivf_partitioned,
    )
    from post_ocr_corretion_spark.operators.similarity import (
        cosine,
        kmeans_centroids_distributed,
    )
    from post_ocr_corretion_spark.session import get_spark

    load_at_launch = list(os.getloadavg())
    rep = int(os.environ.get("SPARK_GRAFT_IVF_REP", "64"))
    n_q = int(os.environ.get("SPARK_GRAFT_IVF_QUERIES", "3"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    n_lists, nprobe, k = 16, 4, 10
    spark = get_spark(app_name="ivf-store-bench", cores=CPUS)
    corpus, queries, n_corpus = _replicated_corpus(spark, rep, n_q)
    cents = kmeans_centroids_distributed(corpus, k=n_lists, iters=3)
    store = f"/tmp/spark_graft_ivf_store_bench_{rep}"
    t0 = time.time()
    write_ivf_partitioned(corpus, cents, store)
    build_s = round(time.time() - t0, 3)

    probes = probe_lists(queries, cents, nprobe)
    probed_ids = sorted(r.list_id for r in probes.select("list_id").distinct().collect())
    files_total = len(glob.glob(f"{store}/list_id=*/*.parquet"))
    files_probed = sum(
        len(glob.glob(f"{store}/list_id={lid}/*.parquet")) for lid in probed_ids
    )

    from pyspark.sql import Window as W

    def full_scan_topk():
        # identical semantics, NO partition predicate on the scan: the
        # probe restriction arrives only via the join, after every file
        # has been read. Recomputes the probe frame per call exactly as
        # ivf_pruned_topk does (the pruned path additionally pays its
        # bounded probed-ids collect — that asymmetry is the pruned
        # path's real cost and stays in its wall).
        store_df = spark.read.parquet(store)
        q = queries.join(F.broadcast(probe_lists(queries, cents, nprobe)), "qid")
        scored = (
            q.join(store_df, "list_id")
            .filter(F.col("qid") != F.col("vec_id"))
            .select("qid", "vec_id", F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cos"))
        )
        w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)

    def walls(fn):
        rs = []
        for _ in range(repeats):
            t0 = time.time()
            _run_noop(fn())
            rs.append(round(time.time() - t0, 3))
        return rs

    pruned_fn = lambda: ivf_pruned_topk(spark, store, queries, cents, k=k, nprobe=nprobe)
    pruned_raw = walls(pruned_fn)
    full_raw = walls(full_scan_topk)
    a = {tuple(r) for r in pruned_fn().collect()}
    b = {tuple(r) for r in full_scan_topk().collect()}
    out = {
        "metric": "ivf_store_pruned_scan",
        "unit": "sec",
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        "corpus": n_corpus,
        "queries": n_q,
        "n_lists": n_lists,
        "nprobe": nprobe,
        "files_total": files_total,
        "files_probed": files_probed,
        "file_fraction": round(files_probed / max(files_total, 1), 3),
        "build_s": build_s,
        "pruned": {"min": min(pruned_raw), "median": _median(pruned_raw), "raw": pruned_raw},
        "full": {"min": min(full_raw), "median": _median(full_raw), "raw": full_raw},
        "results_identical": a == b,
        "load_avg_start": load_at_launch,
        "load_avg_end": list(os.getloadavg()),
    }
    spark.stop()
    _write_ivf_store_md(out)
    print(json.dumps(out))


def _write_ivf_store_md(out: dict) -> None:
    import re

    block = (
        "<!-- IVF_STORE_BENCH_BEGIN -->\n"
        f"`python bench.py --ivf-store-bench` (sf{out['sf']}, local[{out['cpus']}],\n"
        f"corpus {out['corpus']} vectors hive-partitioned into {out['n_lists']} IVF\n"
        f"lists, {out['queries']} queries probing nprobe={out['nprobe']}, exact-cosine\n"
        "re-rank, identical result sets asserted in-run, best-of-"
        f"{len(out['pruned']['raw'])}, load {out['load_avg_start'][0]:.2f} at launch):\n\n"
        "| read path | parquet files read | min s | median s |\n"
        "|---|---|---|---|\n"
        f"| pruned (`list_id IN` → PartitionFilters) | {out['files_probed']}"
        f" of {out['files_total']} ({out['file_fraction']:.0%}) |"
        f" {out['pruned']['min']} | {out['pruned']['median']} |\n"
        f"| full scan (probe restriction only via join) | {out['files_total']}"
        f" of {out['files_total']} | {out['full']['min']} | {out['full']['median']} |\n\n"
        "The pruned fraction is |union of the batch's probed lists| /\n"
        "n_lists: a large batch's union covers every list and erodes file\n"
        "pruning to nothing (measured at 20 queries × nprobe 4 over 16\n"
        "lists: 16/16 read). The store wins for small/targeted batches —\n"
        "a deployment shards big batches by probe locality.\n"
        "<!-- IVF_STORE_BENCH_END -->"
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(path) as f:
        old = f.read()
    if "<!-- IVF_STORE_BENCH_BEGIN -->" in old:
        new = re.sub(
            r"<!-- IVF_STORE_BENCH_BEGIN -->.*?<!-- IVF_STORE_BENCH_END -->",
            block,
            old,
            flags=re.S,
        )
    else:
        new = old.rstrip() + "\n\n## IVF-store file-level pruning — measured\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(new)


def run_pq_bench() -> None:
    """PQ-family search efficiency (VERDICT r6 item 6): brute-force
    cosine vs flat PQ-ADC vs IVF-PQ on IDENTICAL queries over an
    identical (replicated, deterministically perturbed) corpus, index
    build excluded from the search walls the way a deployment would
    store codes once and search many times. Prints one JSON line and
    rewrites the PQ_BENCH section of PLANS.md.

    Env: SPARK_GRAFT_PQ_REP (corpus replication, default 16),
    SPARK_GRAFT_PQ_QUERIES (default 20), SPARK_GRAFT_BENCH_REPEATS
    (default 3), plus the usual SF_DIR / CPUS."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_fit,
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )
    from post_ocr_corretion_spark.operators.similarity import brute_force_topk
    from post_ocr_corretion_spark.session import get_spark

    rep = int(os.environ.get("SPARK_GRAFT_PQ_REP", "16"))
    n_q = int(os.environ.get("SPARK_GRAFT_PQ_QUERIES", "20"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    k, cand, n_lists, nprobe, m, ksub = 10, 50, 16, 4, 16, 16
    spark = get_spark(app_name="pq-bench", cores=CPUS)
    corpus, queries, n_corpus = _replicated_corpus(spark, rep, n_q)

    def walls(df_fn) -> tuple[list[float], float, float]:
        rs = []
        for _ in range(repeats):
            t0 = time.time()
            _run_noop(df_fn())
            rs.append(round(time.time() - t0, 3))
        return rs, _median(rs), min(rs)

    # faiss-style sample training (SPARK_GRAFT_PQ_FIT_ON_BASE=1):
    # codebooks/centroids fit on the k=0 replica set only (same
    # distribution as the near-dup corpus) — fit cost is linear in N,
    # so the >=10^6-vector crossover measurement pays minutes of fit,
    # not hours, exactly as a deployment trains on a sample and
    # ENCODES everything (the encode below always covers the full
    # corpus)
    fit_on_base = os.environ.get("SPARK_GRAFT_PQ_FIT_ON_BASE", "0") == "1"
    fit_src = (
        corpus.filter(F.col("vec_id") < 10_000_000).localCheckpoint()
        if fit_on_base
        else corpus
    )
    t0 = time.time()
    cb = pq_fit(fit_src, m=m, ksub=ksub, iters=3)
    pq_fit_s = round(time.time() - t0, 3)
    t0 = time.time()
    pq_codes = pq_encode(corpus, cb).localCheckpoint()
    pq_build_s = round(time.time() - t0, 3)
    t0 = time.time()
    cents, rcb = ivfpq_fit(fit_src, n_lists=n_lists, m=m, ksub=ksub, iters=3)
    ivf_fit_s = round(time.time() - t0, 3)
    t0 = time.time()
    ivf_index = ivfpq_encode(corpus, cents, rcb).localCheckpoint()
    ivf_build_s = round(time.time() - t0, 3)

    bf_raw, bf_med, bf_min = walls(lambda: brute_force_topk(corpus, queries, k=k))
    pq_raw, pq_med, pq_min = walls(
        lambda: pq_adc_topk(corpus, queries, cb, k=k, cand=cand, codes=pq_codes)
    )
    iv_raw, iv_med, iv_min = walls(
        lambda: ivfpq_topk(
            corpus, queries, cents, rcb, k=k, nprobe=nprobe, cand=cand, index=ivf_index
        )
    )
    truth = {(r.qid, r.vec_id) for r in brute_force_topk(corpus, queries, k=k).collect()}
    pq_hit = {(r.qid, r.vec_id) for r in pq_adc_topk(
        corpus, queries, cb, k=k, cand=cand, codes=pq_codes).collect()}
    iv_hit = {(r.qid, r.vec_id) for r in ivfpq_topk(
        corpus, queries, cents, rcb, k=k, nprobe=nprobe, cand=cand, index=ivf_index
    ).collect()}
    out = {
        "metric": "pq_family_search_time",
        "unit": "sec",
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        "corpus": n_corpus,
        "queries": n_q,
        "k": k,
        "cand": cand,
        "params": {"m": m, "ksub": ksub, "n_lists": n_lists, "nprobe": nprobe},
        "brute": {"median": bf_med, "min": bf_min, "raw": bf_raw, "recall": 1.0},
        "pq": {
            "median": pq_med, "min": pq_min, "raw": pq_raw,
            "recall": round(len(pq_hit & truth) / max(len(truth), 1), 4),
            "fit_s": pq_fit_s, "index_build_s": pq_build_s,
        },
        "ivfpq": {
            "median": iv_med, "min": iv_min, "raw": iv_raw,
            "recall": round(len(iv_hit & truth) / max(len(truth), 1), 4),
            "fit_s": ivf_fit_s, "index_build_s": ivf_build_s,
            "scan_fraction": round(nprobe / n_lists, 3),
        },
        "fit_on": "base_sample" if fit_on_base else "corpus",
    }
    spark.stop()
    _write_pq_bench_md(out)
    print(json.dumps(out))


def _write_pq_bench_md(out: dict) -> None:
    import re

    rows = "".join(
        f"| {name} | {d['median']} | {d['min']} | {d['recall']} | {extra} |\n"
        for name, d, extra in [
            ("brute-force cosine", out["brute"], "exact, O(Q×N) d-dim dots"),
            ("flat PQ-ADC", out["pq"], f"O(Q×N) m={out['params']['m']} lookups; fit {out['pq']['fit_s']}s + encode {out['pq']['index_build_s']}s once"),
            (
                "IVF-PQ",
                out["ivfpq"],
                f"scans {out['ivfpq']['scan_fraction']} of corpus (nprobe {out['params']['nprobe']}/{out['params']['n_lists']}); fit {out['ivfpq']['fit_s']}s + encode {out['ivfpq']['index_build_s']}s once",
            ),
        ]
    )
    block = (
        "<!-- PQ_BENCH_BEGIN -->\n"
        f"`python bench.py --pq-bench` (sf{out['sf']}, local[{out['cpus']}], corpus\n"
        f"{out['corpus']} vectors = embeddings ×{out['corpus'] // 2000} deterministic near-dup\n"
        f"replicas, {out['queries']} identical queries, top-{out['k']}, re-rank cand={out['cand']},\n"
        f"search walls median-of-{len(out['brute']['raw'])} with the index built & "
        "localCheckpointed ONCE before timing — a deployment stores codes"
        + (
            "; codebooks faiss-style SAMPLE-trained on the k=0 replica set"
            if out.get("fit_on") == "base_sample"
            else ""
        )
        + "):\n\n"
        "| search | median s | min s | recall@10 | cost shape |\n|---|---|---|---|---|\n"
        + rows
        + "<!-- PQ_BENCH_END -->"
    )
    with open("/root/repo/PLANS.md") as f:
        old = f.read()
    if "<!-- PQ_BENCH_BEGIN -->" in old:
        new = re.sub(r"<!-- PQ_BENCH_BEGIN -->.*?<!-- PQ_BENCH_END -->", block, old, flags=re.S)
    else:
        new = old.rstrip() + "\n\n## PQ-family search efficiency — measured\n\n" + block + "\n"
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(new)


def run_arrow_sweep() -> None:
    """ROADMAP: measure, don't guess — flagship wall time vs
    spark.sql.execution.arrow.maxRecordsPerBatch (the conf is read at
    execution time, so one session sweeps every size). Prints one JSON
    line and rewrites the marked section in PLANS.md. The session default
    (8192, session.py) should be at or near the measured optimum."""
    import re

    from post_ocr_corretion_spark.session import get_spark

    spark = get_spark(app_name="arrow-sweep", cores=CPUS)
    session_default = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch"))
    import __spark_entry__ as entrymod

    q = entrymod.queries()["flagship_correct"]
    # warm up on the SAME dataset the sweep measures (ADVICE r3: a
    # hard-coded smoke path breaks under a different SPARK_GRAFT_SF_DIR)
    _run_noop(q(spark, SF_DIR))
    sizes = [int(x) for x in os.environ.get("SPARK_GRAFT_ARROW_SIZES", "1024,2048,8192,32768").split(",")]
    results = {}
    if session_default not in sizes:
        sizes.append(session_default)
    repeats = int(os.environ.get("SPARK_GRAFT_ARROW_REPEATS", "3"))
    for s in sizes:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(s))
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            _run_noop(q(spark, SF_DIR))
            ts.append(round(time.time() - t0, 3))
        results[s] = {"sec": min(ts), "raw": ts}
    spark.stop()
    best = min(results, key=lambda k: results[k]["sec"])
    # the sweep's contract with session.py (VERDICT r3 item 2): the
    # pinned default must sit inside the noise band of the measured
    # optimum, or the sweep says so loudly (non-zero exit for CI use)
    noise_band = 1.20
    default_ok = results[session_default]["sec"] <= results[best]["sec"] * noise_band
    out = {
        "metric": "arrow_batch_sweep_flagship_sec",
        "unit": "sec",
        "levels": {str(k): v for k, v in results.items()},
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        "session_default": session_default,
        "best": best,
        "default_within_noise_band": default_ok,
    }
    print(json.dumps(out))
    secs = [v["sec"] for v in results.values()]
    spread_pct = round((max(secs) / min(secs) - 1) * 100, 1)
    # the conclusion is DERIVED from this run's numbers, not hard-coded
    # (r3 review): this host's co-tenant noise band is ~10-20% between
    # repeats, so only a larger spread is evidence the knob matters
    takeaway = (
        f"spread {spread_pct}% is within this host's noise band — the "
        "flagship is batch-size-insensitive in this range and the default "
        "is not load-bearing"
        if spread_pct <= 20
        else f"spread {spread_pct}% EXCEEDS the noise band — batch size "
        f"matters here; consider pinning {best}"
    )
    rows = "\n".join(f"| {k} | {v['sec']} | {v['raw']} |" for k, v in results.items())
    band_line = (
        f"session default {session_default} is WITHIN the {round((noise_band-1)*100)}% "
        f"noise band of the optimum ({best})"
        if default_ok
        else f"session default {session_default} is OUTSIDE the {round((noise_band-1)*100)}% "
        f"noise band of the optimum ({best}) — re-pin session.py"
    )
    block = (
        "<!-- ARROW_SWEEP_BEGIN -->\n"
        f"`python bench.py --arrow-sweep` (flagship, sf{out['sf']}, local[{CPUS}],\n"
        f"best-of-{repeats} with raw repeats disclosed). The session default is\n"
        f"maxRecordsPerBatch={session_default} (session.py); measured optimum this run: {best};\n"
        f"{band_line}; {takeaway}. Re-run on target hardware before tuning.\n\n"
        f"| maxRecordsPerBatch | sec (best of {repeats}) | raw |\n|---|---|---|\n"
        f"{rows}\n"
        "<!-- ARROW_SWEEP_END -->"
    )
    with open("PLANS.md") as f:
        old = f.read()
    if "ARROW_SWEEP_BEGIN" in old:
        new = re.sub(r"<!-- ARROW_SWEEP_BEGIN -->.*?<!-- ARROW_SWEEP_END -->", block, old, flags=re.S)
    else:
        new = old.rstrip() + "\n\n## Arrow batch-size sweep — measured\n\n" + block + "\n"
    with open("PLANS.md", "w") as f:
        f.write(new)
    if not default_ok:
        sys.exit(3)  # stale session default — the assertion VERDICT r3 item 2 asks for


def run_history() -> None:
    """Round-over-round comparison READ FROM THE ARTIFACTS (VERDICT r4
    item 2's last clause): parse every BENCH_r*.json the driver recorded
    and rewrite the marked PLANS.md section. Rounds ≤4 recorded
    best-of-2 (no medians/noise index); r5+ record median-of-N plus the
    interleaved pure-SQL control's spread, so host noise is quantified
    inside each record."""
    import glob
    import re

    rows = []
    skipped = []
    for path in sorted(glob.glob("BENCH_r*.json")):
        rnd = re.search(r"BENCH_r(\d+)", path).group(1)
        with open(path) as f:
            rec = json.load(f)
        p = rec.get("parsed") or rec  # driver wraps the JSON line in 'parsed'
        if not isinstance(p, dict) or "value" not in p:
            skipped.append(path)  # unparseable record → hard failure below,
            continue  # never a silently thinner table (VERDICT r5 item 3)
        q = p.get("queries", {})
        noise = p.get("noise_control") or {}
        rows.append(
            {
                "round": int(rnd),
                "total": p.get("value"),
                "stat": "median" if "noise_control" in p else "min-of-2",
                "flagship": q.get("flagship_correct"),
                "docs_per_sec": p.get("flagship_docs_per_sec"),
                "noise_spread_pct": noise.get("spread_pct"),
                "control_median": noise.get("median"),
            }
        )
    md_rows = "\n".join(
        f"| r{r['round']} | {r['total']} | {r['stat']} | {r['flagship']} | "
        f"{r['docs_per_sec']} | {r['control_median'] if r['control_median'] is not None else '—'} | "
        f"{str(r['noise_spread_pct']) + '%' if r['noise_spread_pct'] is not None else '—'} |"
        for r in rows
    )
    block = (
        "<!-- BENCH_HISTORY_BEGIN -->\n"
        "Generated by `python bench.py --history` from the recorded\n"
        "BENCH_r*.json artifacts (never hand-edited). Rounds ≤4 used\n"
        "best-of-2 with no in-record noise measurement — their\n"
        "round-over-round deltas are NOT interpretable on this host\n"
        "(same-code minima swing 5× between adjacent windows, PLANS.md\n"
        "\"Round-4 A/B\"); from r5 the headline is a median and the\n"
        "control column is a fixed pure-SQL query interleaved through\n"
        "the bench — compare rounds via (total median, control median)\n"
        "pairs: if the control moved too, it was the host.\n\n"
        "| round | headline total s | stat | flagship s | flagship docs/s | control median s | control spread |\n"
        "|---|---|---|---|---|---|---|\n"
        f"{md_rows}\n"
        "<!-- BENCH_HISTORY_END -->"
    )
    with open("PLANS.md") as f:
        old = f.read()
    if "BENCH_HISTORY_BEGIN" in old:
        new = re.sub(r"<!-- BENCH_HISTORY_BEGIN -->.*?<!-- BENCH_HISTORY_END -->", block, old, flags=re.S)
    else:
        new = old.rstrip() + "\n\n## Round-over-round bench history — from the artifacts\n\n" + block + "\n"
    with open("PLANS.md", "w") as f:
        f.write(new)
    print(json.dumps({"metric": "bench_history_rounds", "value": len(rows), "rows": rows}))
    if skipped:
        raise SystemExit(f"BENCH artifacts missing from the regenerated table: {skipped}")


def history_is_current() -> tuple[bool, str]:
    """True iff PLANS.md's bench-history table has a row for every
    recorded BENCH_r*.json round — the doc lagged the artifacts in r5
    (the driver writes BENCH_rN.json AFTER the round's last commit, so
    the next session must re-run `bench.py --history` first thing).
    Asserted by tests/test_bench_cli.py so staleness fails the suite."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = {
        int(re.search(r"BENCH_r(\d+)", p).group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
    }
    with open(os.path.join(here, "PLANS.md")) as f:
        m = re.search(r"<!-- BENCH_HISTORY_BEGIN -->.*?<!-- BENCH_HISTORY_END -->", f.read(), re.S)
    if not m:
        return False, "no BENCH_HISTORY block in PLANS.md"
    have = {int(r) for r in re.findall(r"^\| r(\d+) \|", m.group(0), re.M)}
    missing = rounds - have
    return not missing, f"rounds missing from PLANS.md history: {sorted(missing)}"


def _write_baseline_md(out: dict) -> None:
    lv = out["levels"]
    rows = "\n".join(
        f"| local[{k}] | {v['sec']} | {v.get('raw_sec', [v['sec']])} | {v['docs_per_sec']} | {v['gb_per_sec']} |"
        for k, v in sorted(lv.items(), key=lambda kv: int(kv[0]))
    )
    repeats = max(len(v.get("raw_sec", [0])) for v in lv.values())
    pair_rows = "\n".join(f"| {k} | {v} |" for k, v in out["pairs"].items())
    md = f"""# BENCH — scaling evidence (north rule)

End-to-end extract+correct (synthetic webpages → fused mapInPandas
render+extraction → Arrow-batched beam correction) on the deterministic
synthetic table derived from sf={out['sf']} and replicated to
{out['docs']} pages ({out['html_gb']} GB of html bytes), run at several
parallelism levels on the SAME input with a FIXED 64-task layout — the
sandbox stand-in for N vs 4N executors.  Lexicon/scorer construction is
an untimed constant prologue (a model artifact, built once and amortized
over the corpus); per level, an untimed warm-up pass (JVM JIT + Python
worker pool) precedes BEST-OF-{repeats} timed passes (single-pass walls
swing ±60% between adjacent windows on this host — raw walls below),
matching a long-running cluster job.

| parallelism | wall sec (best) | raw walls | docs/sec | GB/s (html) |
|---|---|---|---|---|
{rows}

| cores N → 4N | scaling efficiency |
|---|---|
{pair_rows}

**Primary N→4N pair (2 → 8 cores): {out['value']}** (target ≥ 0.8).

The 8 → 32 pair ({out['pairs'].get('8->32', 'n/a')}) degrades on this
host: per-core throughput of the Python-heavy stages falls when all 32
vCPUs are busy, and `top` shows 3–13% hypervisor steal — a shared-host
memory-bandwidth/contention artifact, not a property of the job
(per-stage probes in round 1 showed the same per-core falloff for a pure
embarrassingly-parallel map with no shuffle and no shared state; round
2's once-per-worker candidate/prob caches lifted the pair from ~0.41 to
the current value). On a real multi-executor cluster each executor owns
its cores; the 2→8 pair is the faithful analog of adding executors.

Reproduce: `python bench.py --scaling` (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_REP, SPARK_GRAFT_SCALE_LEVELS).
"""
    os.makedirs("BENCH", exist_ok=True)
    # preserve any shipped-job section a previous --scaling-submit wrote
    # (this rewrite replaces only the in-process part)
    extra = ""
    try:
        with open("BENCH/BASELINE.md") as f:
            old = f.read()
        i = old.find("\n## Shipped-job scaling")
        if i != -1:
            extra = "\n" + old[i:]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md + extra)


if __name__ == "__main__":
    main()

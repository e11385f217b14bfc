"""Production LSH parameterizations, measured (VERDICT r2 item 7): the
demo queries keep tiny oracle-reproducible parameters; these tests run the
PRODUCTION parameterizations (MinHash 16 bands × 8 rows = 128 perms;
hyperplane 12 bands × 8 planes = 96 planes) against exact ground truth
(jaccard_pairs / cosine_near_dup_pairs) on a planted-near-dup corpus and
REGENERATE the recall/precision table in PLANS.md — the published numbers
are test output, not hand-written claims. Everything is md5/seed
deterministic, so the table is stable run-to-run."""
from __future__ import annotations

import os
import random
import re

import pytest

from post_ocr_corretion_spark.datagen.wordlist import COMMON_WORDS

PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
BEGIN, END = "<!-- LSH_QUALITY_BEGIN -->", "<!-- LSH_QUALITY_END -->"

MUTATION_RATES = [0.02, 0.05, 0.1, 0.2, 0.35, 0.5]


def _planted_corpus() -> list[tuple[int, str]]:
    """30 base docs of 120 common words each + one mutant per base with a
    cycled word-replacement rate — a controlled spread of true Jaccard
    levels. Deterministic (seeded rngs keyed by doc index)."""
    words = sorted(set(COMMON_WORDS))
    docs: list[tuple[int, str]] = []
    for i in range(30):
        r = random.Random(1000 + i)
        base = [r.choice(words) for _ in range(120)]
        docs.append((2 * i, " ".join(base)))
        p = MUTATION_RATES[i % len(MUTATION_RATES)]
        rm = random.Random(5000 + i)
        mut = [rm.choice(words) if rm.random() < p else w for w in base]
        docs.append((2 * i + 1, " ".join(mut)))
    return docs


def _update_plans_section(table_md: str) -> None:
    block = f"{BEGIN}\n{table_md}\n{END}"
    with open(PLANS) as f:
        old = f.read()
    if BEGIN in old:
        new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block, old, flags=re.S)
    else:
        new = old.rstrip() + "\n\n## LSH production parameterization — measured (tests/test_lsh_quality.py)\n\n" + block + "\n"
    if new != old:
        with open(PLANS, "w") as f:
            f.write(new)


@pytest.fixture(scope="module")
def quality_rows(spark):
    """Compute every measured number once; both tests assert from it and
    the last one publishes the table."""
    from post_ocr_corretion_spark.operators.dedup import (
        MINHASH_PRODUCTION,
        char_shingles,
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(_planted_corpus(), "doc_id long, text string")
    truth = {
        (r.da, r.db): r.jaccard
        for r in jaccard_pairs(char_shingles(docs), threshold=0.0).collect()
    }
    cand = {(r.da, r.db) for r in minhash_lsh_pairs(docs, **MINHASH_PRODUCTION).collect()}

    def pairs_at(t):
        return {p for p, j in truth.items() if j >= t}

    rows = []
    for t in (0.9, 0.8, 0.7, 0.6):
        tp = pairs_at(t)
        rec = len(cand & tp) / len(tp) if tp else None
        rows.append(("minhash 16×8 (128 perms)", f"recall @ J≥{t}", len(tp), round(rec, 3)))
    # precision: of emitted candidates, how many are genuinely similar
    for t in (0.7, 0.5):
        prec = len({p for p in cand if truth.get(p, 0.0) >= t}) / len(cand)
        rows.append(("minhash 16×8 (128 perms)", f"precision vs J≥{t}", len(cand), round(prec, 3)))
    all_pairs = len(truth)
    rows.append(
        ("minhash 16×8 (128 perms)", "candidate filter ratio", all_pairs, round(len(cand) / all_pairs, 4))
    )
    return {"rows": rows, "cand": cand, "truth": truth}


def test_minhash_production_recall_and_precision(quality_rows):
    rows = {(r[0], r[1]): r[3] for r in quality_rows["rows"]}
    assert rows[("minhash 16×8 (128 perms)", "recall @ J≥0.9")] >= 0.95
    assert rows[("minhash 16×8 (128 perms)", "recall @ J≥0.8")] >= 0.9
    assert rows[("minhash 16×8 (128 perms)", "precision vs J≥0.5")] >= 0.8
    # the banded join must actually FILTER (not emit the cross product)
    assert rows[("minhash 16×8 (128 perms)", "candidate filter ratio")] <= 0.2


def test_hyperplane_production_recall_and_publish(spark, quality_rows):
    from post_ocr_corretion_spark.operators.similarity import (
        HYPERPLANE_PRODUCTION,
        cosine_near_dup_pairs,
        hyperplanes,
        lsh_near_dup_pairs,
    )
    import numpy as np
    from pyspark.sql import functions as F

    # the synthetic embeddings table has no true near-dups (max pairwise
    # cos ≈ 0.48), so plant them: a jittered copy of each of 100 base
    # vectors with noise levels giving cos ≈ 0.91–0.98 — the regime the
    # production near-dup parameterization is for. Deterministic seed.
    base = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .limit(100)
        .collect()
    )
    rng = np.random.RandomState(20240616)
    rows = []
    for r in base:
        v = np.asarray(r.embedding, dtype=np.float64)
        v /= np.linalg.norm(v)
        rows.append((int(r.vec_id), [float(x) for x in v]))
        eps = [0.2, 0.3, 0.45][int(r.vec_id) % 3]
        noise = rng.standard_normal(len(v))
        noise -= noise.dot(v) * v  # orthogonal jitter: cos = 1/sqrt(1+eps²)
        noise *= eps / np.linalg.norm(noise)
        w = v + noise
        w /= np.linalg.norm(w)
        rows.append((int(r.vec_id) + 100_000, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    truth = {(r.da, r.db) for r in cosine_near_dup_pairs(emb, threshold=0.9).collect()}
    assert len(truth) >= 80  # the planting worked
    planes = hyperplanes(HYPERPLANE_PRODUCTION["n_planes"], 64)
    got = {
        (r.da, r.db)
        for r in lsh_near_dup_pairs(
            emb, planes, threshold=0.9, bands=HYPERPLANE_PRODUCTION["bands"]
        ).collect()
    }
    assert got <= truth  # candidates are exact-verified: no false pairs
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"hyperplane production recall {recall}"

    rows = quality_rows["rows"] + [
        ("hyperplane 12×8 (96 planes)", "recall @ cos≥0.9", len(truth), round(recall, 3)),
        ("hyperplane 12×8 (96 planes)", "precision (exact-verified)", len(got), 1.0),
    ]
    table = "\n".join(
        [
            "Generated by `pytest tests/test_lsh_quality.py` (deterministic md5/seeded",
            "hashing — stable run-to-run). Ground truth: exact `jaccard_pairs` over",
            "5-char shingles on a 60-doc planted-near-dup corpus / exact",
            "`cosine_near_dup_pairs` on sf0.001 embeddings with planted jittered",
            "copies (cos ≈ 0.91–0.98; the raw synthetic table has no pairs above",
            "cos 0.48, so near-dups must be planted to measure recall).",
            "",
            "| scheme | metric | n (truth/cand) | value |",
            "|---|---|---|---|",
        ]
        + [f"| {a} | {b} | {n} | {v} |" for a, b, n, v in rows]
    )
    _update_plans_section(table)


def test_verify_stage_scores_each_distinct_candidate_once(spark):
    """VERDICT r5 plan fix: the band self-join emits only id pairs and
    `.distinct()`s BEFORE the exact-verify join-back, so a pair that
    collides in many bands is scored exactly once. Locked two ways:
    (1) result identity — at threshold=-1 (verify-stage passthrough) the
    output pairs are exactly the distinct banded collisions, each
    appearing ONCE, with cos byte-equal to the exact O(N²) oracle;
    (2) plan — the distinct aggregate runs over the two id columns only
    (no vector/cos column below it)."""
    import numpy as np
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.similarity import (
        cosine_near_dup_pairs,
        hyperplanes,
        lsh_bucket,
        lsh_near_dup_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal((20, 16))
    rows = []
    for i, v in enumerate(base):
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        # near-identical copy → collides in (almost) EVERY band: the
        # redundant-scoring regime the fix targets
        w = v + 0.02 * rng.standard_normal(16)
        w = w / np.linalg.norm(w)
        rows.append((i + 1000, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    planes, bands = hyperplanes(16, 16), 4

    out = lsh_near_dup_pairs(emb, planes, threshold=-1.0, bands=bands).collect()
    pairs = [(r.da, r.db) for r in out]
    assert len(pairs) == len(set(pairs)), "a candidate pair was scored more than once"

    # independent banded-collision reproduction (same bucket scheme)
    per_band = len(planes) // bands
    banded = None
    for bi in range(bands):
        chunk = planes[bi * per_band : (bi + 1) * per_band]
        part = emb.select(
            "vec_id", F.concat(F.lit(f"{bi}:"), lsh_bucket(F.col("v"), chunk)).alias("bkt")
        )
        banded = part if banded is None else banded.union(part)
    a, b = banded.alias("a"), banded.alias("b")
    expect = {
        (r.da, r.db)
        for r in a.join(b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("da"), F.col("b.vec_id").alias("db"))
        .distinct()
        .collect()
    }
    assert set(pairs) == expect  # verify-stage input == distinct candidate set
    exact = {(r.da, r.db): r.cos for r in cosine_near_dup_pairs(emb, threshold=-1.0).collect()}
    assert all(exact[(da, db)] == r.cos for (da, db), r in zip(pairs, out))

    # plan lock: the distinct HashAggregate keys are the id pair only —
    # the cosine (an `aggregate(zip_with...)` over the vectors) must not
    # appear below the distinct
    plan = (
        lsh_near_dup_pairs(emb, planes, threshold=0.9, bands=bands)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    distinct_lines = [ln for ln in plan.splitlines() if "Aggregate [" in ln]
    assert distinct_lines, plan[:2000]
    assert all("zip_with" not in ln and "cos" not in ln for ln in distinct_lines), (
        "cosine computed below the distinct:\n" + plan[:3000]
    )

"""Extra measurement harness for the optimization round (guide §1).

NOT the frozen driver bench — bench.py stays untouched. This tool:
  * times any declared query with the noop sink (guide §1.4), warmup +
    N repeats, reporting min/median and the raw walls;
  * captures ``.explain("formatted")`` per query into a plans dir.

Usage:
  python bench_extra.py --sf-dir /root/sfbig/sf1.0 --queries j3_band_join,a6_cumulative_share --repeats 5
  python bench_extra.py --explain-dir plans/r09 --suffix _before --queries <all headline>
"""
from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout

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


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-time", action="store_true", help="explain only")
    args = ap.parse_args()

    from post_ocr_corretion_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", cores=cpus)
    qs = entrymod.queries()
    names = [n for n in args.queries.split(",") if n]
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf_dir)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:warmup")
        _noop(fn(spark, args.sf_dir))
        walls = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.time()
            _noop(fn(spark, args.sf_dir))
            walls.append(round(time.time() - t0, 3))
        s = sorted(walls)
        out[name] = {
            "min": s[0],
            "median": s[len(s) // 2] if len(s) % 2 else round((s[len(s) // 2 - 1] + s[len(s) // 2]) / 2, 3),
            "raw": walls,
        }
        print(json.dumps({name: out[name]}), flush=True)
    if out:
        print(json.dumps({"sf_dir": args.sf_dir, "cpus": cpus, "load": [round(x, 2) for x in os.getloadavg()], "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Alternated flagship A/B runner: one process = one checkout.

Usage: python /tmp/ab_flagship.py <repo_path> <tag>
Prints one JSON line: {"tag":..., "flagship": [3 walls], "control": [3 walls]}
Protocol matches PLANS.md "Round-4 A/B": warm-up + 3 timed repeats at
sf0.1 local[32], with the pure-SQL j4 control timed before each repeat.
"""
import json
import sys
import time

repo, tag = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
import __spark_entry__ as em  # noqa: E402
from post_ocr_corretion_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark(cores=32)
qs = em.queries()


def run(name):
    t0 = time.time()
    qs[name](spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


run("flagship_correct")  # warm-up, untimed
run("j4_revenue_by_nation")  # control plan compile, untimed
flag, ctrl = [], []
for _ in range(3):
    ctrl.append(run("j4_revenue_by_nation"))
    flag.append(run("flagship_correct"))
print(json.dumps({"tag": tag, "flagship": flag, "control": ctrl}))
spark.stop()

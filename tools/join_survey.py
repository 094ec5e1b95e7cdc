"""One-off r12 survey: final (post-AQE) join strategies for every bench
query at the bench SF, with and without the shuffled-hash conversion
threshold. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/join_survey.py [thresh]

With no argument the session runs the stock bench conf; with an argument
(e.g. ``64m``) it sets ``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold``
so AQE may convert sort-merge joins whose per-partition map output fits.
Prints one JSON line per query: name, wall seconds of a single noop-forced
run, and SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin counts in the
FINAL adaptive plan.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from opc2mongodb_spark.queries import REGISTRY  # noqa: E402
from opc2mongodb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {}
    tag = "base"
    if len(sys.argv) > 1:
        extra["spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"] = sys.argv[1]
        tag = f"shj_{sys.argv[1]}"
    spark = get_spark(app_name=f"join_survey_{tag}", extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"survey:{name}")
        df = REGISTRY[name].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        rec = {
            "sec": round(dt, 3),
            "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    path = f"/tmp/join_survey_{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()

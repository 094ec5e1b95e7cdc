"""One-off r12 A/B: does setting
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`` convert the
remaining bench SortMergeJoins, and what does it do to their medians?

    SPARK_GRAFT_SF_DIR=... python tools/shj_ab.py <thresh|off> q1 q2 ...

Runs each named query median-of-5 (noop-forced) in ONE session configured
per the argument, printing per-query medians and final-plan join counts.
Separate processes per arm keep the JVMs honest.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opc2mongodb_spark.queries import REGISTRY  # noqa: E402
from opc2mongodb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    arm = sys.argv[1]
    names = sys.argv[2:]
    extra = {}
    if arm != "off":
        extra["spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"] = arm
    spark = get_spark(app_name=f"shj_ab_{arm}", extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        runs = []
        plan = ""
        for _ in range(5):
            df = REGISTRY[name].build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            plan = df._jdf.queryExecution().executedPlan().toString()
        runs.sort()
        print(json.dumps({
            "arm": arm, "query": name,
            "median": round(runs[2], 3), "best": round(runs[0], 3),
            "midspread": round(runs[3] - runs[1], 3),
            "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        }), flush=True)


if __name__ == "__main__":
    main()

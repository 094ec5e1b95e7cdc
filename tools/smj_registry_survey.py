"""One-off r12 survey: which registry queries retain SortMergeJoin in
their FINAL adaptive plan at sf0.1 (i.e. would be affected by enabling
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold``).

Forcing: ``executedPlan().execute().count()`` — executes the full physical
plan through the DataFrame's OWN QueryExecution (so the adaptive plan
finalizes in place and can be read back), with only a JVM-side row count.

Usage: python tools/smj_registry_survey.py [thresh]   # no arg = stock conf
Writes /tmp/smj_registry_<tag>.json
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
    extra, tag = {}, "base"
    if len(sys.argv) > 1:
        extra["spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"] = sys.argv[1]
        tag = f"shj_{sys.argv[1]}"
    only = os.environ.get("SMJ_SURVEY_ONLY")
    names = only.split(",") if only else sorted(REGISTRY)
    spark = get_spark(app_name=f"smj_registry_{tag}", extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"smj_survey:{name}")
        try:
            df = REGISTRY[name].build(spark, sf_dir)
            t0 = time.perf_counter()
            df._jdf.queryExecution().executedPlan().execute().count()
            dt = time.perf_counter() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("+- == Initial Plan ==")[0]
            rec = {
                "sec": round(dt, 3),
                "smj": len(re.findall(r"\bSortMergeJoin\b", final)),
                "shj": len(re.findall(r"\bShuffledHashJoin\b", final)),
            }
        except Exception as exc:  # noqa: BLE001 - survey must finish
            rec = {"error": str(exc)[:160]}
        out[name] = rec
        if rec.get("smj") or rec.get("error"):
            print(json.dumps({"query": name, **rec}), flush=True)
        if i % 25 == 0:
            print(f"... {i}/{len(names)}", flush=True)
    with open(f"/tmp/smj_registry_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    smjq = [n for n, r in out.items() if r.get("smj")]
    print("queries with final-plan SMJ:", len(smjq))
    print(",".join(smjq))


if __name__ == "__main__":
    main()

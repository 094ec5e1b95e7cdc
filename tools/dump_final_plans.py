"""Dump the FINAL adaptive plan (post-execution, ``isFinalPlan=true``) for
named registry queries.

Companion to ``dump_plans.py`` for changes AQE applies at runtime (e.g.
the r12 sort-merge -> shuffled-hash conversion under
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold``): the initial
plan is identical with and without the conf, so the evidence lives in the
final plan after shuffle stats are known. A noop write does NOT work here
— it executes a separate write QueryExecution, leaving the DataFrame's
own adaptive plan unfinalized — so each query is executed through its OWN
QueryExecution (``executedPlan().execute().count()``, the
smj_registry_survey forcing: full physical plan, JVM-side row count
only), then that same QueryExecution is explained.

    PYTHONPATH=<tree> python tools/dump_final_plans.py \
        --out-dir plans/r12 --tag final_before q_pagerank2 ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    p.add_argument("--out-dir", required=True)
    p.add_argument("--tag", required=True)
    p.add_argument("queries", nargs="+")
    args = p.parse_args()

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark("dump_final_plans")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"final_plan:{name}")
        df = REGISTRY[name].build(spark, args.sf_dir)
        df._jdf.queryExecution().executedPlan().execute().count()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

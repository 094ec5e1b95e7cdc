"""Dump ``.explain("formatted")`` for named registry queries.

Evidence generator for the optimization rounds: the judge cannot run
Spark, so every query touched in a round gets its physical plan captured
to ``plans/r{N}/<query>_<tag>.txt`` (tag = before|after). Run it at HEAD
for the "after" plans and from a git worktree of the pre-round commit
(``PYTHONPATH=<worktree> python tools/dump_plans.py ...``) for "before".

Plans are the AQE initial plans (``AdaptiveSparkPlan isFinalPlan=false``)
— the shape evidence (Exchange count, join strategy, PushedFilters,
Generate placement, BatchEvalPython absence) is all decided here.
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
    p.add_argument("--tag", required=True, choices=["before", "after"])
    p.add_argument("queries", nargs="+")
    args = p.parse_args()

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark("dump_plans")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.queries:
        df = REGISTRY[name].build(spark, args.sf_dir)
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

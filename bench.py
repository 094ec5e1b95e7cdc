"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced with a noop-format write: full execution, zero
driver-side row transfer, so the measurement is engine time, not collect().
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# CORE is FROZEN at the 27 queries benched since r4 — the round-over-round
# regression contract. Never add to it (additions go to EXTENDED), never
# remove from it: its total is the one number a reader can compare across
# BENCH_r{N}.json files without normalizing for suite growth.
CORE = [
    "q_last_value_per_key",
    "q_coerce_numeric",
    "q_group_agg",
    "q_rollup",
    "q_join_inner",
    "q_join_star",
    "q_join_asof",
    "q_window_rank",
    "q_window_cumsum",
    "q_window_tumbling",
    "q_topk",
    "q_dedup_exact",
    "q_minhash_signatures",
    "q_cosine_topk",
    "q_text_stats",
    "q_tpch_q1",
    "q_ann_lsh",
    "q_dedup_minhash",
    "q_neardup_embedding",
    "q_resample_1h",
    "q_dedup_clusters",  # the only iterative-shuffle operator — keep its
    # localCheckpoint-loop cost visible round-over-round
    "q_skew_agg",  # salted two-phase hot-key aggregation path
    "q_tpch_q3",  # broadcast-dim join + top-K
    "q_tpch_q6",  # pure scan efficiency: full pushdown + pruned read
    "q_kmeans_iter",  # two-phase posexplode centroid update (r4)
    "q_simhash64_neardup",  # production-width banded hamming join (r4)
    "q_hybrid_neardup",  # LSH candidates x jaccard + embedding cosine (r4)
]

# EXTENDED grows as heavy operators land; its entries are benched the same
# way but totaled separately so CORE stays comparable round-over-round.
EXTENDED = [
    "q_tpch_q5",  # six-table star: broadcast dim chain + two fact shuffles (r5)
    "q_tpch_q18",  # HAVING keyset -> semi join -> re-aggregation (r5)
    "q_setsim_join",  # exact-threshold prefix-filter join — output-bound on
    # this dense corpus (5.1M qualifying pairs ARE the cost) (r5)
    "q_winnow_fingerprints",  # map-only winnowing sketch, spread input (r5)
    "q_boilerplate_ngrams",  # two-phase hash-prefiltered shingle counts (r5)
    "q_tpch_q9",  # broadcast-pruned part filter + two fact shuffles (r5)
    "q_tpch_q21",  # decorrelated double-EXISTS via per-order aggregate (r5)
    "q_time_weighted_avg",  # OPC HDA timeaverage: segment-explode + agg (r5)
    "q_pagerank2",  # two decimal-pinned PageRank rounds on the LSH graph (r5)
    "q_bigram_nll",  # bigram-LM scoring: explode + 2 counts + model join-back (r5)
    "q_zorder_stats",  # Morton re-layout + per-bucket envelope stats (r5)
    "q_quantiles_histogram",  # 5 exact quantiles, one shared-histogram pass (r7)
    "q_winsorize",  # rank-selected [p05,p95] clip + decimal-pinned sum (r7)
    "q_dau_wau",  # 7x explode rolling-distinct engagement pair (r7)
    "q_pca_power",  # long-form Gram accumulation + 3 matvecs on the persisted gram (r8)
    "q_label_noise",  # centroid build + broadcast distance fold per vector (r8)
    "q_copurchase",  # in-array basket pair explode + reused-exchange totals (r8)
    "q_ohlc_hourly",  # candle rollup: one combinable struct-argmin groupBy (r8)
    "q_bitmap_distinct",  # 63-bit word bitmap rollup + word-level overlap join (r8)
    "q_interval_union",  # per-user gaps-and-islands span merge (r8)
    "q_rrf_fusion",  # two distributed top-50 rankings + limit-bounded fuse (r8)
    "q_auc_roc",  # distinct-score rollup + histogram-cell rank cumulative (r8)
    "q_theilsen_slope",  # per-series 64-point pairwise-slope arrays (r8)
    "q_degree_assortativity",  # distinct edge list + degree join-back corr (r8)
    "q_percentile_cont",  # six bracketing ranks, one shared-histogram pass (r8)
    "q_join_asof_fwd",  # forward as-of: merge-union single shuffle, reversed (r8)
    "q_window_count_distinct",  # two windows, ONE shared user_id exchange (r8)
    "q_json_schema_profile",  # map-explode key profile, |keys|-row output (r8)
    "q_bfs_reach",  # 3-hop frontier BFS, one shuffle per hop (r8)
    "q_hysteresis_alarms",  # two same-key windows, one exchange (r8)
    "q_rolling_zscore",  # decimal-pinned 64-row frame stats per series (r8)
    "q_bot_regularity",  # lag window + groupBy on one shared exchange (r8)
    "q_mmr_rerank",  # top-8 cosine candidates + bounded greedy MMR (r8)
    "q_growth_accounting",  # user-week lag/lead + two weekly rollups (r8)
    "q_item_item_cosine",  # user-keyed co-occurrence self-join + broadcast norms (r8)
    "q_link_prediction",  # part-keyed supplier pair join + broadcast degrees (r8)
    "q_kaplan_meier",  # two combinable groupBys + calendar-bounded spine (r8)
    "q_cuped_adjusted",  # user rollup + pooled 1-row stats + arm rollup (r8)
]

HEADLINE = CORE + EXTENDED


def noise_verdict(
    core: list[str], timings: dict[str, float], midspreads: dict[str, float]
) -> bool:
    """True when this run's CORE numbers should not be read as a regression
    signal (r8 VERDICT: BENCH_r08 recorded a contention-elevated 31 s CORE
    readable only via per-query midspreads — put the health verdict in the
    compact line). Criterion: any CORE query whose robust dispersion
    (midspread of 5 runs) exceeds 3x its median AND 0.5 s absolute — the
    SCALING.md contention signature (q_winnow_fingerprints flagged at
    10.9 s midspread on a 1.9 s median); the absolute floor keeps
    sub-second scheduler jitter on fast queries from crying wolf."""
    return any(
        midspreads.get(n, 0.0) > max(3.0 * timings.get(n, 0.0), 0.5)
        for n in core
    )


# The driver captures the LAST 2,000 stdout chars and parses the final JSON
# line; the final line must therefore fit the capture WITH the per-query
# medians map (r12 VERDICT #1 — without it PERF per_query/geomean/scaling
# come back empty). test_tools pins this budget against the HEADLINE set.
TAIL_CAPTURE_BYTES = 2000


def final_summary_line(
    total: float,
    core_sec: float,
    noisy: bool,
    timings: dict[str, float],
    sf: float | None,
) -> str:
    """The bench's final stdout line: compact one-line JSON carrying the
    medians-only per-query map (3-decimal, compact separators — 1,708
    bytes at the 66-query suite) plus the suite totals. best/spread/
    midspread/solo_control stay in the detail line and bench_detail.json;
    pulling them in here would re-create the r6/r7 decapitation."""
    return json.dumps(
        {
            "metric": "headline suite wall time (median-of-5 per query)",
            "value": total,
            "unit": "sec",
            "core_sec": core_sec,
            "extended_sec": round(total - core_sec, 3),
            # contention health verdict (see noise_verdict): when true,
            # read bench_detail.json midspreads before calling any delta
            # a regression — the medians in THIS run are noise-elevated.
            "noisy": noisy,
            "queries": timings,
            "sf": sf,
            "detail": "bench_detail.json",
        },
        separators=(",", ":"),
    )


def _bench_lloyd(spark, sf_dir: str) -> None:
    """Three full Lloyd rounds over the embeddings table — the one iterative
    driver loop besides connected components; benched so its per-round
    constant cost (broadcast assign + two-phase mean + KxD collect +
    checkpoint swap) stays visible round-over-round. tol=0 forces exactly
    max_iter rounds."""
    from pyspark.sql import functions as F

    from opc2mongodb_spark.operators.components import release_checkpoint
    from opc2mongodb_spark.operators.kmeans import lloyd
    from opc2mongodb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id").isin([5, 6, 7, 8])).select(
        F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("cv")
    )
    assign, _, rounds = lloyd(e, seeds, max_iter=3, tol=0.0)
    assert rounds == 3
    assign.write.format("noop").mode("overwrite").save()
    release_checkpoint(assign)


# The driver-LOOP operators whose medians have flagged as "regressions"
# twice (r9, r10) and were both times attributed to sandbox memory-subsystem
# drift by ad-hoc probes. The solo control makes that attribution a
# permanent artifact: each runs 5x in a FRESH JVM with PINNED driver heap,
# immediately after the suite, so the compare can cite a same-machine
# contention-free median + midspread instead of re-litigating every round.
SOLO_CONTROL = ["lloyd3", "q_bfs_reach", "q_pagerank2"]
SOLO_HEAP = "8g"


def _solo_main(name: str) -> None:
    """Child-process entry (fresh JVM, pinned heap): run one control
    operator 5x and print a single JSON line for the parent to collect."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark(app_name=f"bench_solo_{name}")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    runs: list[float] = []
    for _ in range(5):
        t0 = time.perf_counter()
        if name == "lloyd3":
            _bench_lloyd(spark, sf_dir)
        else:
            REGISTRY[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    print(json.dumps({
        "median": round(runs[2], 3),
        "best": round(runs[0], 3),
        "midspread": round(runs[3] - runs[1], 3),
    }))


def solo_controls() -> dict[str, dict]:
    """Run each SOLO_CONTROL operator in its own subprocess (fresh JVM,
    driver heap pinned to SOLO_HEAP) and collect the per-operator stats.
    A failure records the error rather than failing the bench."""
    import subprocess

    out: dict[str, dict] = {}
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=SOLO_HEAP)
    for name in SOLO_CONTROL:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "_solo", name],
                capture_output=True, text=True, timeout=600, env=env,
            )
            out[name] = json.loads(r.stdout.strip().splitlines()[-1])
        except Exception as exc:  # noqa: BLE001 - control must not sink the bench
            out[name] = {"error": str(exc)[:200]}
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm the JVM/session so query 1 doesn't pay startup cost.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    bests: dict[str, float] = {}
    spreads: dict[str, float] = {}
    midspreads: dict[str, float] = {}
    # 5 runs, MEDIAN primary (r7): SCALING.md's variance attribution pinned
    # the big spreads to the sandbox's memory subsystem (a same-plan
    # memory-bound control swings ~5x run-to-run while an ALU-bound one is
    # flat) — a median over 5 is robust to one slow-memory iteration, so
    # the frozen-CORE round-over-round contract can distinguish a real
    # regression from noise. best + spread stay recorded alongside.
    N_RUNS = 5
    for name in HEADLINE:
        runs: list[float] = []
        for _ in range(N_RUNS):
            # build() runs INSIDE the timer: iterative operators (connected
            # components) materialize eagerly during build, so timing only
            # the final write would read their cached result in ~0.02 s and
            # hide the real iterative cost. NOTE (r4): this is what caused
            # the r3 "8-query drift" vs r2 — build() was NOT sub-ms because
            # load_table ran parquet schema inference (a driver job) on
            # every call. sources/tables.py now caches the inferred schema
            # per path, so steady-state build really is cheap (~0.05-0.2s,
            # py4j plan construction only) and the timings are comparable
            # round-over-round.
            t0 = time.perf_counter()
            df = REGISTRY[name].build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)  # median
        bests[name] = round(runs[0], 3)
        # per-query spread (max - min): lets a reader separate real plan
        # drift from sandbox noise without re-running — a delta smaller
        # than the recorded spread is noise, not regression.
        spreads[name] = round(runs[-1] - runs[0], 3)
        # midspread (2nd..4th of the 5 sorted runs): the ROBUST dispersion
        # — SCALING.md's memory-contention attribution shows max-min can
        # swing ~5x on one bad iteration, so the regression contract
        # reads median +/- midspread, not max-min.
        midspreads[name] = round(runs[3] - runs[1], 3)

    # non-registry entries: operators whose cost is a driver LOOP, not one
    # declarative plan (the registry/oracle gate can't express them).
    runs = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        _bench_lloyd(spark, sf_dir)
        runs.append(time.perf_counter() - t0)
    runs.sort()
    timings["lloyd3"] = round(runs[len(runs) // 2], 3)
    bests["lloyd3"] = round(runs[0], 3)
    spreads["lloyd3"] = round(runs[-1] - runs[0], 3)
    midspreads["lloyd3"] = round(runs[3] - runs[1], 3)

    # fixed-heap solo control (r10 VERDICT #6): fresh-JVM, pinned-heap
    # medians for the driver-loop operators — the compare's variance anchor.
    # Release the suite JVM FIRST (r11 ADVICE: its driver heap, up to 16g
    # and hot after the full run, would otherwise share the box with the
    # 8g controls — weakening the contention-free claim and risking swap
    # on smaller boxes). spark.stop() alone keeps the py4j JVM process
    # alive with its heap reserved; shutting the gateway exits it.
    spark.stop()
    try:
        from pyspark import SparkContext

        if SparkContext._gateway is not None:
            SparkContext._gateway.shutdown()
            SparkContext._gateway = None
            SparkContext._jvm = None
    except Exception:  # noqa: BLE001 - teardown must not sink the bench
        pass
    solo = solo_controls()

    total = round(sum(timings.values()), 3)
    # Two totals alongside the grand total: CORE (frozen 27-query r4 set —
    # THE round-over-round comparable) and EXTENDED (everything added
    # since, incl. lloyd3). total == core_sec + extended_sec.
    core_sec = round(sum(timings[n] for n in CORE), 3)
    noisy = noise_verdict(CORE, timings, midspreads)
    detail = {
        "metric": "headline suite wall time (median-of-5 per query)",
        "value": total,
        "unit": "sec",
        "core_sec": core_sec,
        "extended_sec": round(total - core_sec, 3),
        "noisy": noisy,
        "core_queries": CORE,
        "queries": timings,
        "best": bests,
        "spread": spreads,
        "midspread": midspreads,
        "solo_control": solo,
        "solo_control_heap": SOLO_HEAP,
        "sf": sf,
    }
    # The full per-query detail grew past the driver's 2,000-char stdout tail
    # capture (BENCH_r06/r07 recorded "parsed": null — the line was
    # decapitated and the 2x-of-BASELINE gate read nothing). So: detail goes
    # to a file AND an early stdout line for humans, and the FINAL stdout
    # line is a compact summary guaranteed to fit entirely inside the
    # 2,000-char tail capture. Anything parsing "the last JSON line" gets a
    # complete document.
    #
    # r13 (r12 VERDICT item 1): the r7-era final line carried NO per-query
    # map, so the driver's PERF per_query/geomean/scaling blocks came back
    # empty ({} in PERF_r12.json) — the detail line that has the medians is
    # exactly the one the tail truncates. The final line now carries the
    # medians-only "queries" map in compact separators: measured 1,708
    # bytes for the 66-query suite (tail capture is 2,000), while best/
    # spread/midspread/solo stay in the detail line + bench_detail.json.
    # Timing methodology is untouched — only the report format changed.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    sys.stdout.flush()
    print(final_summary_line(total, core_sec, noisy, timings, sf))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) == 3 and sys.argv[1] == "_solo":
        _solo_main(sys.argv[2])
    else:
        main()

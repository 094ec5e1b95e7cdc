"""Scaling-slope bench: the five heaviest operators at sf0.1 vs sf0.5.

A single-scale-factor number cannot reveal a super-linear term; this runs
each heavy query at two scale points (5x apart in row count), records
wall time (best-of-N) AND output rows, and writes the ratio table to
SCALING.md. Time ratio must be read against the OUTPUT ratio: an
output-bound operator (q_setsim_join on this dense synthetic vocabulary)
legitimately produces quadratically more rows, so the honest slope metric
there is time-per-output-row, not raw time.

Usage: python tools/make_scaled_documents.py && python tools/make_scaled_events.py && python tools/scaling_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q_setsim_join",
    "q_bigram_nll",
    "q_boilerplate_ngrams",
    "q_pagerank2",
    "q_dedup_clusters",
    # r7: the histogram rank-selection family over events (requires
    # tools/make_scaled_events.py to have produced .scaling/sf0.5/events)
    "q_latency_sla",
    "q_histogram_median",
    "q_ks_drift",
    "q_psi_drift",
    # r8: telemetry rollups + funnel timing over events, and the
    # linear-algebra pair over embeddings (requires
    # tools/make_scaled_embeddings.py for .scaling/sf0.5/embeddings)
    "q_ohlc_hourly",
    "q_flatline_runs",
    "q_peak_concurrency",
    "q_conversion_lag",
    "q_series_corr_matrix",
    "q_pca_power",
    "q_label_noise",
    # r8 batch 4: bitmap word rollup, span merge, path discovery over
    # events; rank fusion over documents+embeddings. (q_weighted_median
    # is lineitem-side — no 5x lineitem fixture — and its machinery is
    # already slope-measured via the rank-selection family.)
    "q_bitmap_distinct",
    "q_interval_union",
    "q_top_paths",
    "q_rrf_fusion",
    # r8 session 12: telemetry recurrences + curation profiles. Events-side
    # (rolling frame stats, alarm transitions, windowed count-distinct,
    # gap-CV, changelog apply) and documents-side (prefix families,
    # fertility); q_bfs_reach is orders/lineitem-side (no 5x fixture) but
    # its per-round cost class is already covered by q_dedup_clusters.
    "q_rolling_zscore",
    "q_hysteresis_alarms",
    "q_window_count_distinct",
    "q_bot_regularity",
    "q_cdc_apply",
    "q_prefix_dup",
    "q_tokenizer_fertility",
    # r8 batches 12-14: engagement/experiment analytics over events
    # (co-occurrence self-join, survival spine, CUPED rollups, funnel
    # latency, pinned-ln volatility) and the embeddings-side density
    # cells. (q_link_prediction and q_entity_blocking are
    # lineitem/customer-side — no 5x fixture — and their cost classes
    # are the q_item_item_cosine pair join and a plain groupBy.)
    "q_item_item_cosine",
    "q_kaplan_meier",
    "q_cuped_adjusted",
    "q_funnel_latency",
    "q_log_volatility",
    "q_grid_density",
    # r8 batches 44-56 (this session): events-side inference/monitoring
    # (32x-explode bootstrap, spine-decomposed rank-sum, conformal
    # residual quantile, qini deciles, CEM strata, e-process spine,
    # hourly xcorr, jackknife day algebra), documents-side graph/
    # agreement (LSH clustering coefficient, kappa contingency), and the
    # embeddings outlier census.  (q_spearman_corr/q_kendall_tau/
    # q_popularity_mrr are lineitem-side — no 5x fixture — and their
    # cost classes (one groupBy + broadcasts / per-customer window) are
    # covered by existing rows.)
    "q_poisson_bootstrap",
    "q_mann_whitney",
    "q_conformal_interval",
    "q_uplift_qini",
    "q_cem_att",
    "q_evalue_drift",
    "q_xcorr_lagged",
    "q_jackknife_ratio_se",
    "q_clustering_coeff",
    "q_cohens_kappa",
    "q_embedding_outliers",
]
SF_DIRS = {
    0.1: "/root/testdata/sf0.1",
    0.5: os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaling",
        "sf0.5",
    ),
}
RUNS = 3


def main() -> None:
    from opc2mongodb_spark.queries import REGISTRY
    from opc2mongodb_spark.session import get_spark

    spark = get_spark(app_name="scaling_bench")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[float, tuple[float, int]]] = {}
    for name in QUERIES:
        results[name] = {}
        for sf, d in SF_DIRS.items():
            best, rows = None, None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df = REGISTRY[name].build(spark, d)
                rows = df.count()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            results[name][sf] = (best, rows)
            print(f"{name} sf{sf}: {best:.2f}s rows={rows}", flush=True)

    lines = [
        "# SCALING — slope of the heaviest operators",
        "",
        "Data: `documents`/`events` at sf0.1 (driver-generated) and a 5x",
        "amplification (`tools/make_scaled_documents.py` +",
        "`tools/make_scaled_events.py` — distributions stationary). Wall time is",
        f"best-of-{RUNS} on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}];",
        "rows = the query's own output. **Read the time ratio against the",
        "output ratio**: data grew 5.0x, so a ~5x time ratio at ~constant",
        "output is linear, and a large time ratio is only a super-linear",
        "red flag when the output ratio doesn't explain it.",
        "",
        "| query | sf0.1 s | sf0.5 s | time ratio | rows 0.1 | rows 0.5 |"
        " output ratio | s per 1M output rows 0.1 -> 0.5 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        (t1, r1), (t5, r5) = results[name][0.1], results[name][0.5]
        tr = t5 / t1 if t1 else float("nan")
        orr = r5 / r1 if r1 else float("nan")
        per1 = t1 / r1 * 1e6 if r1 else float("nan")
        per5 = t5 / r5 * 1e6 if r5 else float("nan")
        lines.append(
            f"| {name} | {t1:.2f} | {t5:.2f} | {tr:.1f}x | {r1:,} | {r5:,} |"
            f" {orr:.1f}x | {per1:.2f} -> {per5:.2f} |"
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    # PRESERVE hand-written analysis: everything from the first "## "
    # heading onward survives regeneration — only the table is rebuilt.
    tail = ""
    if os.path.exists(out):
        old = open(out).read()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n" + tail)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Flap-stress for the highest cross-engine-rendering-risk queries.

r5 VERDICT #4: 120/183 registered queries have never been driver-sampled;
the riskiest by construction are the ones whose determinism hangs on a
rendering edge — raw-double emission (q_pagerank2), NULL z on degenerate
cohorts (q_abtest_lift), sketch estimate arithmetic (q_kmv_set_ops), tie
handling (q_skyline2d), NTILE boundaries (q_rfm_segments). This script
re-runs each through the full DuckDB oracle compare at BOTH gate SFs,
ITERS times, each iteration in a FRESH JVM (fresh session -> fresh AQE
runtime decisions, codegen, shuffle placement), and reports any flap.

Usage:
    python tools/stress_oracle.py [iters]              (default 10; the
        accumulated high-risk list below)
    python tools/stress_oracle.py ITERS q_a q_b ...    (targeted)
    python tools/stress_oracle.py --rotation ROUND [iters]
        (r7 VERDICT #7: FULL-REGISTRY coverage — the whole registry is
        split into 3 deterministic cohorts by name hash; cohort ROUND%3
        runs a fresh-JVM x both-SF oracle compare, chunked ~40 queries
        per child JVM, and the result is recorded in STRESS_LEDGER.json
        {query: {round, ok}}. Run every round and every registered query
        gets a fresh-JVM stress at least once per 3 rounds; the ledger is
        the coverage proof (README "Stress coverage").)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

QUERIES = [
    "q_pagerank2",
    "q_abtest_lift",
    "q_kmv_set_ops",
    "q_skyline2d",
    "q_rfm_segments",
    # r6/r7 additions (r6 VERDICT #4): none were ever driver-sampled and
    # several carry transcendental / rendering edges — psi's ln-of-ratio
    # terms, chi2's expected-count divisions, KS's at_value tie, histogram
    # median's bucket-boundary floats, hard-negatives' cosine margins,
    # CUSUM's cumulative deviations, Gini's rank arithmetic.
    "q_psi_drift",
    "q_chi2_independence",
    "q_ks_drift",
    "q_histogram_median",
    "q_hard_negatives",
    "q_cusum_changepoint",
    "q_key_skew_gini",
    "q_mad_outliers",
    "q_join_asof_tol",
    "q_kanonymity",
    "q_ldiversity",
    "q_bpe_pair_counts",
    "q_session_pattern",
    # r7 additions: quantile/decile rank selections (bucket-boundary
    # floats), benford's pinned log10 terms, trend slope's %.9e rendering,
    # overlap/stickiness divisions.
    "q_quantiles_histogram",
    "q_latency_sla",
    "q_winsorize",
    "q_benford",
    "q_trend_slope",
    "q_seq_length_buckets",
    "q_user_overlap",
    "q_dau_wau",
    "q_activity_streaks",
    "q_canonical_choice",
    # r8 additions: decimal-string Gram cells (the plain-decimal rendering
    # that replaced a flapping %.9e), the quantized power-iteration
    # recursion, label-noise margin comparisons, PCA residual sqrt sums,
    # autocorr-style %.9e on the series correlation matrix, carried
    # open/close values under timestamp ties, markov-lift divisions.
    "q_gram_matrix",
    "q_pca_power",
    "q_pca_residual_norms",
    "q_label_noise",
    "q_series_corr_matrix",
    "q_ohlc_hourly",
    "q_copurchase",
    "q_conversion_lag",
    # r8 batch-4 additions: rrf's cosine-ordered ranks + IEEE fusion
    # sums, interval-union's coverage division, weighted-median's carried
    # doubles at weight-crossing boundaries, bitmap jaccard division.
    "q_rrf_fusion",
    "q_interval_union",
    "q_weighted_median",
    "q_bitmap_distinct",
    "q_score_calibration",
    # r8 batch 6/7 additions: transcendental-bearing or interpolated
    # renders — MI's decimal-pinned p*ln terms, NDCG's %.9e divisions,
    # AUC's decimal->double final ratio, Theil-Sen's carried slope
    # doubles at the median index, the mirrored corr formulas, MASE's
    # double ratio, OOF-encoding divisions, percentile interpolation.
    "q_auc_roc",
    "q_ndcg",
    "q_mutual_info",
    "q_theilsen_slope",
    "q_feature_corr",
    "q_mase_forecast",
    "q_target_encoding",
    "q_degree_assortativity",
    "q_percentile_cont",
    "q_join_asof_fwd",
    "q_null_safe_join",
    "q_window_count_distinct",
    "q_json_schema_profile",
    "q_bfs_reach",
    "q_fd_violations",
    "q_hysteresis_alarms",
    "q_rolling_zscore",
    "q_cdc_apply",
    "q_bot_regularity",
    "q_tokenizer_fertility",
    "q_prefix_dup",
    "q_feature_nzv",
    "q_window_nth",
    "q_burst_detection",
    "q_lateness_profile",
    "q_mmr_rerank",
    "q_growth_accounting",
    "q_simpson_diversity",
    "q_wow_change",
    "q_sax_symbols",
    "q_srm_check",
    # r8 batch-12 additions with rendering exposure: Kaplan-Meier's
    # exp(sum(ln ...)) survival under %.9e (the only transcendental in the
    # batch; the rest are floor(x*1e9) scaled integers, tie-free by
    # construction).
    "q_kaplan_meier",
    "q_item_item_cosine",
    "q_window_cume_dist",
    # r8 batch-13 additions: volatility's pinned-ln sums + sqrt under
    # %.9e, the DP Laplace inverse-CDF ln chain, CUPED's theta/adjusted
    # double chains (decimal re-pinned before the arm sums).
    "q_log_volatility",
    "q_dp_noisy_counts",
    "q_cuped_adjusted",
    # r8 batch-14 additions: funnel latency's interpolated medians
    # (raw-double (a+b)/2 carried values), power analysis' raw-double
    # variance/MDE chain.
    "q_funnel_latency",
    "q_power_analysis",
    # r8 batch-15 additions: hour entropy's pinned p*ln(p) terms under
    # %.9e, the LTV decimal-division pin at the final double cast.
    "q_active_hours_entropy",
    "q_cohort_revenue_ltv",
    # r8 batch-16: the ACF corr chain (%.9e over six lags).
    "q_acf_profile",
    # r8 batch-17: the FS weights' ln(m/u) terms under %.9e.
    "q_fs_field_weights",
    # r8 batch-18: MK's continuity-corrected z under %.9e.
    "q_mann_kendall",
    # r8 batch-19: Ljung-Box's pinned r_k^2/(n-k) sum under %.9e + its
    # white_noise threshold compare; Lorenz's rank-selected decile edges.
    "q_ljung_box",
    "q_lorenz_deciles",
    # r8 batch-20: the delta-method ratio/SE %.9e chains.
    "q_ratio_metric_delta",
    # r8 batch-21: the retention fit's pinned ln-ln regression.
    "q_retention_curve_fit",
    # r8 batch-22: the FS score's pinned weight sums + threshold verdict.
    "q_er_match_scores",
    # r8 batch-23: the Fourier harmonic's libm sin/cos/atan2 under %.9e,
    # Heaps' pinned ln-ln regression + exp intercept.
    "q_fourier_daily",
    "q_heaps_fit",
    # r8 batch-24: conditional-entropy pinned p*ln(p), Fano %.9e chain.
    "q_markov_cond_entropy",
    "q_token_dispersion",
    # r8 batch-25: the stump's floor(x*1e9) impurity chain off windowed
    # cumulative integers.
    "q_decision_stump",
    # r8 batch-26: the Welch t %.9e chain (means, pooled variances).
    "q_weekend_effect",
    # r8 batch-27: NB's pinned ln-weight sums + sign verdict.
    "q_naive_bayes_propensity",
    # r8 batch-28: envelope's carried rank-selected doubles, DiD %.9e.
    "q_hourly_envelope",
    "q_did_estimate",
    # r8 batch-29: path surprise's pinned -ln sums under %.9e.
    "q_path_surprise",
    # r8 batch-31: arrival dispersion's variance/mean %.9e chain.
    "q_arrival_dispersion",
    # r8 batch-32: the discount-qty corr %.9e chain.
    "q_discount_qty_corr",
    # r8 batch-33: the Wilson sqrt chain under %.9e.
    "q_funnel_wilson",
    # r8 batch-34: median shift's carried rank-selected doubles.
    "q_median_shift",
    # r8 batch-36: peer-z and activation-corr %.9e chains.
    "q_peer_zscore",
    "q_activation_validation",
    # r8 batch-40: the cohort-trend slope %.9e chain.
    "q_cohort_quality_trend",
    # r8 batch-42: variance-component SS chains, Hill's pinned-ln mean.
    "q_variance_components",
    "q_hill_tail_index",
    # r8 batch-43: the geometric mean's exp(mean(pinned ln)).
    "q_geometric_mean",
    # r8 batch-39/40/41/43 stragglers: SAX motifs' carried PAA breakpoint
    # compares, per-cohort survival medians' interpolated (a+b)/2 doubles,
    # split balance's ppb ratio arithmetic, newcomer share's exact ppb.
    "q_sax_motifs",
    "q_survival_by_cohort",
    "q_split_balance_audit",
    "q_newcomer_share",
    # r8 batch-44: both end in a sqrt-ratio %.9e chain off integer-exact
    # moments (Spearman's rank deviations, Kendall's tie-corrected counts).
    "q_spearman_corr",
    "q_kendall_tau",
    # r8 batch-45: MRR's floor-of-double ppb render (the bootstrap itself
    # is integer-exact end to end — stressed anyway for the md5/conv path).
    "q_poisson_bootstrap",
    "q_popularity_mrr",
    # r8 batch-46: the lagged-xcorr %.9e Pearson chain (clustering coeff
    # is integer-exact ppb end to end; stressed for the LSH path anyway).
    "q_clustering_coeff",
    "q_xcorr_lagged",
    # r8 batch-47: kappa's final integer-ratio %.9e; the e-process is a
    # pure-literal double chain (stressed for the threshold compare).
    "q_cohens_kappa",
    "q_evalue_drift",
    # r8 batch-48: CEM's pinned per-stratum terms + two %.9e divisions;
    # conformal's rank-selected residual boundary (integer, stressed for
    # the histogram path).
    "q_conformal_interval",
    "q_cem_att",
    # r8 batch-49: outliers' 3-sigma threshold compare on a sqrt chain;
    # qini's per-cut %.9e ratio off rank-selected deciles.
    "q_embedding_outliers",
    "q_uplift_qini",
    # r8 batch-50: MW's z sqrt chain over exact integers; jackknife's
    # pinned replicate deviations + two %.9e renders.
    "q_mann_whitney",
    "q_jackknife_ratio_se",
    # r8 batch-51: backtest's skill %.9e ratio; PR curve is integer-exact
    # (stressed for the rank-selected thresholds).
    "q_pr_curve",
    "q_rolling_backtest",
    # r8 batch-52: Theil's three %.9e ln chains; Simpson's flag is
    # integer-exact (stressed for the sign-compare path).
    "q_simpsons_flag",
    "q_theil_decomposition",
    # r8 batch-53: mediation's five %.9e OLS chains; modularity's single
    # %.9e division off the exact integer numerator.
    "q_modularity",
    "q_mediation_effect",
    # r8 batch-54: KW's tie-corrected H %.9e; LOO's carried-cosine
    # struct-max tiebreak (stressed like hard_negatives).
    "q_kruskal_wallis",
    "q_knn_loo",
    # r8 batch-55: both carry exp/ln chains into pinned sums and
    # floor-scaled ppb renders.
    "q_temperature_mix",
    "q_class_balance_weights",
    # r8 batch-57: the G2 pinned-ln cell sums under %.9e (migration is
    # integer-exact end to end).
    "q_markov_order_test",
    "q_segment_migration",
    # r8 batch-58: the three index %.9e chains with pinned p*q cross
    # terms; ABC's weighted-rank thresholds (integer, stressed for the
    # weighted rank_select path).
    "q_fisher_price_index",
    "q_abc_classification",
    # r8 batch-59: delta's z-chain + pinned term means; CCC's single
    # %.9e agreement chain.
    "q_burrows_delta",
    "q_lin_ccc",
    # r8 batch-60: the bridge's pinned effect sums + tolerance flag;
    # EB's moment-matched prior %.9e chains.
    "q_price_volume_mix",
    "q_eb_return_rate",
    # r8 batch-61: MAP's floor-scaled ppb off exact AP integers; the
    # three Wald %.9e ratio chains.
    "q_map_at_k",
    "q_iv_wald",
    # r8 batch-62: both integer-exact end to end (stressed for the
    # ladder/TakeOrdered tiebreaks).
    "q_heavy_changers",
    "q_reuse_gap_hist",
    # r8 batch-63: the partial-corr triple-sqrt chain and alpha's
    # variance-share %.9e.
    "q_partial_corr",
    "q_cronbach_alpha",
    # r8 batch-64: both carry variance/z %.9e chains off pinned moments.
    "q_dim_variance",
    "q_dim_drift",
    # r8 batch-65: strength's variance-share %.9e (adaptation is
    # integer-exact).
    "q_seasonality_strength",
    "q_token_adaptation",
    # r8 batch-66: adoption's pinned-logit OLS %.9e pair (youden is
    # integer-exact; stressed for the rank-selected thresholds).
    "q_logistic_adoption",
    "q_youden_cut",
    # r8 batch-67: JB's skew/kurtosis %.9e chains; the runs-test z.
    "q_jarque_bera",
    "q_runs_test",
    # r8 batch-68: the oor chi2 %.9e chain and the participation-ratio
    # %.9e pair.
    "q_oor_by_server",
    "q_effective_dim",
    # r8 batch-69: EMD's pinned gap-weighted terms under %.9e (turnover
    # is integer-exact).
    "q_audience_turnover",
    "q_wasserstein_1d",
    # r8 batch-70: e-BH's ln-boundary compares on the literal-LLR chain.
    "q_ebh_rejections",
    # r8 batch-71: the dispersion/r %.9e chains + v > mu flag.
    "q_nb_overdispersion",
    # r8 batch-72: the half-life OLS chain whose x*y decimal rescale
    # flap was measured and fixed — highest-value stress target.
    "q_engagement_half_life",
    # r12: the four queries the scale-rotation fixes restructured (anchor/
    # candidate/ubiquity caps + the winnow materialization barrier) — the
    # caps are integer-exact, but the restructured plans deserve the
    # fresh-JVM AQE treatment; 5 JVMs x both SFs ran flap-free at landing.
    "q_winnow_overlap",
    # r12 (optimization round): the six n-gram queries rebuilt on
    # functions/text.py::ngram_concat (zip_with over shifted slices — the
    # Generate re-evaluation fix) plus the two remaining restructured
    # plans; same fresh-JVM AQE treatment as the cap cohort above.
    "q_bigrams",
    "q_pmi_bigrams",
    "q_decontaminate",
    "q_boilerplate_ngrams",
    "q_bigram_nll",
    "q_ngram_novelty",
    "q_winnow_fingerprints",
    "q_link_prediction",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

CHILD = r"""
import json
import sys
from opc2mongodb_spark.session import get_spark
from opc2mongodb_spark.oracle import compare_query
spark = get_spark(app_name="stress", master="local[8]", shuffle_partitions=8)
bad = []
for sf in {sfs!r}:
    for q in {queries!r}:
        probs = compare_query(spark, sf, q)
        if probs:
            bad.append((sf, q, probs))
for sf, q, probs in bad:
    # machine-readable flap line (r8 ADVICE: the repr'd-tuple format was
    # brittle to parse) — the parent matches the "FLAP " prefix and
    # json-decodes the rest.
    print("FLAP " + json.dumps({{"sf": sf, "query": q, "probs": str(probs)}}))
print("CHILD_OK" if not bad else "CHILD_BAD")
"""


def parse_child_output(stdout: str, part: list[str]) -> set[str]:
    """Flapped query names from one child JVM's stdout. A chunk-level crash
    (no CHILD_* marker at all — including a timeout kill) marks every query
    in the chunk bad rather than silently passing it."""
    bad = set()
    for ln in stdout.splitlines():
        if ln.startswith("FLAP "):
            bad.add(json.loads(ln[len("FLAP "):])["query"])
    if "CHILD_OK" not in stdout and "CHILD_BAD" not in stdout:
        return set(part)
    return bad


def merge_ledger(
    ledger: dict[str, dict], run_ok: dict[str, bool], round_no: int
) -> dict[str, dict]:
    """Fold one rotation run into the ledger. 'ok' is THIS round's verdict
    (r8 ADVICE: ANDing against prior rounds made a single historic flap
    sticky-false forever); flap history lives in 'last_flap_round' instead."""
    for q, ok in run_ok.items():
        prev = ledger.get(q, {})
        entry: dict = {"round": round_no, "ok": ok}
        last_flap = prev.get("last_flap_round")
        if not ok:
            last_flap = round_no
        if last_flap is not None:
            entry["last_flap_round"] = last_flap
        ledger[q] = entry
    return ledger


def _registry_names() -> list[str]:
    from opc2mongodb_spark.queries import REGISTRY

    return sorted(REGISTRY)


def _cohort(names: list[str], which: int) -> list[str]:
    return [
        q
        for q in names
        if int(hashlib.md5(q.encode()).hexdigest(), 16) % 3 == which
    ]


def rotation(
    round_no: int, iters: int, chunk: int = 40, full: bool = False
) -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ledger_path = os.path.join(root, "STRESS_LEDGER.json")
    ledger: dict[str, dict] = {}
    if os.path.exists(ledger_path):
        with open(ledger_path, encoding="utf-8") as f:
            ledger = json.load(f)

    names = _registry_names()
    cohort = names if full else _cohort(names, round_no % 3)
    print(
        f"rotation round={round_no}: {'FULL registry' if full else f'cohort {round_no % 3}'}"
        f" -> {len(cohort)}/{len(names)} queries, {iters} fresh-JVM iter(s)"
    )
    flaps = 0
    # ok-so-far within THIS run only (a query appears once per iteration);
    # cross-round history goes to the ledger's last_flap_round, not to 'ok'.
    run_ok: dict[str, bool] = {}
    try:
        for it in range(iters):
            for lo in range(0, len(cohort), chunk):
                part = cohort[lo : lo + chunk]
                script = CHILD.format(sfs=SFS, queries=part)
                try:
                    r = subprocess.run(
                        [sys.executable, "-c", script],
                        cwd=root,
                        capture_output=True,
                        text=True,
                        timeout=1800,
                    )
                    stdout, stderr = r.stdout, r.stderr
                except subprocess.TimeoutExpired as e:
                    # r8 ADVICE: a hung chunk must not abort the rotation —
                    # treat it as a chunk crash (every query in it bad) and
                    # keep going; the ledger write happens in the finally.
                    stdout = e.stdout or ""
                    if isinstance(stdout, bytes):
                        stdout = stdout.decode("utf-8", "replace")
                    stderr = f"chunk timed out after {e.timeout}s"
                bad = parse_child_output(stdout, part)
                if bad == set(part) and "CHILD_BAD" not in stdout:
                    print(f"chunk crash:\n{stderr[-2000:]}")
                for q in part:
                    run_ok[q] = (q not in bad) and run_ok.get(q, True)
                if bad:
                    flaps += 1
                    print(f"iter {it} chunk {lo//chunk}: FLAP {sorted(bad)}")
                else:
                    print(
                        f"iter {it} chunk {lo//chunk}: ok ({len(part)})",
                        flush=True,
                    )
    finally:
        merge_ledger(ledger, run_ok, round_no)
        with open(ledger_path, "w", encoding="utf-8") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
        covered = sum(1 for q in names if q in ledger)
        stale = [
            q for q in names if ledger.get(q, {}).get("round", -9) < round_no - 2
        ]
        green = sum(1 for q in names if ledger.get(q, {}).get("ok"))
        print(
            f"ledger: {covered}/{len(names)} ever stressed, {green} green, "
            f"{len(stale)} older than 3 rounds, flaps this run={flaps}"
        )
    sys.exit(1 if flaps else 0)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--rotation":
        args = [a for a in sys.argv[2:] if a != "--full"]
        round_no = int(args[0])
        iters = int(args[1]) if len(args) > 1 else 1
        rotation(round_no, iters, full="--full" in sys.argv)
        return
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # optional: query names after iters -> targeted run (new additions get
    # their 10-JVM pass without re-running the whole accumulated list)
    queries = sys.argv[2:] or QUERIES
    unknown = [q for q in queries if q not in QUERIES]
    if unknown:
        sys.exit(f"not in the stress list: {unknown}")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = CHILD.format(sfs=SFS, queries=queries)
    flaps = 0
    for i in range(iters):
        try:
            r = subprocess.run(
                [sys.executable, "-c", script],
                cwd=root,
                capture_output=True,
                text=True,
                timeout=900,
            )
            stdout, stderr = r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:
            # same resilience as the rotation path: a hung iteration is a
            # flap, not an abort of the remaining iterations
            stdout = e.stdout or ""
            if isinstance(stdout, bytes):
                stdout = stdout.decode("utf-8", "replace")
            stderr = f"iteration timed out after {e.timeout}s"
        ok = "CHILD_OK" in stdout
        if not ok:
            flaps += 1
            print(f"iter {i}: FLAP\n{stdout}\n{stderr[-2000:]}")
        else:
            print(f"iter {i}: ok", flush=True)
    print(f"done: {iters} fresh-session iterations x {len(queries)} queries "
          f"x {len(SFS)} SFs, flaps={flaps}")
    sys.exit(1 if flaps else 0)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()

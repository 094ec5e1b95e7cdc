"""Composed batch corpus-curation pipeline — the LLM-training-data path
end to end, as ONE first-class API.

The registry exposes every stage as an individually oracle-checked query
(quality: q_quality_score; lang: q_lang_id; exact dedup: q_dedup_exact;
near dedup: q_dedup_minhash/q_dedup_clusters; sampling:
q_stratified_sample; sharding: q_shard_assign); this module is the
COMPOSITION a user actually runs — documents in, deterministic training
shards out, with a per-stage audit trail — the batch twin of the
streaming bridge topology (config → opcsim → coercion → dedup → sink)
that test_streaming.py:839 golden-tests for the reference's path.

Scale posture (each inherited from the operator it reuses, see their
docstrings): the dedup stages never shuffle document TEXT — their
shuffles move ids, fingerprints, signatures, or band hashes, and text is
re-derived lazily from the source scan wherever a stage needs it (a
re-read is the scale-correct trade against materializing corpus text in
executor storage); the near-dup stage is LSH-bounded (bucket-capped
candidate pairs, exact Jaccard only on candidates, frontier CC on the
|pairs| edge list); the stratum cap ranks a NARROW (id, stratum) frame
(parallelism = |strata|, the honest bound); stage counts ride ONE eager
checkpoint per stage boundary — always id-frames, never text. Text moves
exactly twice: the keep-list semi-joins against the source (broadcast
when the keep list fits — bloom-gate it upstream otherwise) and the
final shard write, which is the output itself.

Determinism: every decision — quality band, lang id, fingerprint, LSH
bands, cluster representative (min id), stratum rank order, shard
assignment — is a pure function of the input rows (md5 discipline, no
seeds, no sampling RNG), so two runs over the same corpus produce
byte-identical keep lists and shard files.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opc2mongodb_spark.functions.text import fingerprint, lang_id, quality_band
from opc2mongodb_spark.operators.components import (
    connected_components,
    release_checkpoint,
)
from opc2mongodb_spark.operators.dedup import (
    jaccard_on_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from opc2mongodb_spark.operators.sharding import write_training_shards


@dataclass(frozen=True)
class CurationResult:
    kept: DataFrame  # the surviving documents, all input columns
    stats: DataFrame  # (stage, rows) audit trail, pipeline order


_STAGES = ("input", "quality_lang", "exact_dedup", "near_dedup", "stratum_cap")


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: int = 1,
    langs: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.8,
    stratum_cols: tuple[str, ...] = ("lang", "source"),
    per_stratum_cap: int | None = None,
    out_dir: str | None = None,
    n_shards: int = 16,
    seed: str = "",
) -> CurationResult:
    """Quality gate → language filter → exact dedup → LSH near-dedup →
    per-stratum cap → (optionally) deterministic training shards.

    Returns the kept documents plus a (stage, rows) audit frame. When
    ``out_dir`` is given, also writes ``out_dir/shard=K/*.parquet`` via
    :func:`write_training_shards` (balanced md5 shards, replayable
    within-shard order).

    ``langs=None`` skips the language filter; ``per_stratum_cap=None``
    skips the cap. Near-dedup keeps each duplicate cluster's min-id
    representative (clusters = connected components over candidate pairs
    whose EXACT token Jaccard >= ``jaccard_threshold``).
    """
    if min_quality not in (0, 1, 2, 3):
        raise ValueError(f"min_quality must be 0..3, got {min_quality!r}")
    if not 0.0 < jaccard_threshold <= 1.0:
        raise ValueError(
            f"jaccard_threshold must be in (0, 1], got {jaccard_threshold!r}"
        )
    if per_stratum_cap is not None and per_stratum_cap < 1:
        # validate BEFORE the expensive stages run, with the other params
        raise ValueError(
            f"per_stratum_cap must be >= 1, got {per_stratum_cap}"
        )

    counts: list[tuple[str, int]] = []
    spark = docs.sparkSession

    counts.append(("input", docs.count()))

    # -- stage 1: quality + language gate (one map pass, no shuffle).
    # ``gated`` stays a LAZY map over the source scan: consumers that need
    # text (minhash, jaccard) re-derive it from the scan — re-reading the
    # source is the scale-correct trade against materializing corpus TEXT
    # into executor storage. Only narrow (id, fingerprint) frames are ever
    # checkpointed.
    gated = docs.filter(quality_band(F.col(text_col)) >= min_quality)
    if langs is not None:
        gated = gated.filter(lang_id(F.col(text_col)).isin(list(langs)))
    fps = gated.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
    ).localCheckpoint(eager=True)
    counts.append(("quality_lang", fps.count()))

    # -- stage 2: exact dedup (min id per fingerprint; only ids shuffle) --
    keep_exact = (
        fps.groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    release_checkpoint(fps)
    counts.append(("exact_dedup", keep_exact.count()))

    # -- stage 3: LSH near-dedup on the exact-kept set (text re-derived
    # lazily from the gated scan; signatures/pairs/edges are all narrow) --
    corpus2 = gated.join(keep_exact, id_col, "left_semi")
    sigs = minhash_signatures(corpus2, id_col, text_col)
    cand = lsh_candidate_pairs(sigs, id_col)
    verified = jaccard_on_pairs(corpus2, cand, id_col, text_col).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    edges = verified.select("a_id", "b_id")
    vertices = keep_exact.select(F.col(id_col).alias("vid"))
    clusters = connected_components(vertices, edges, id_col="vid")
    reps = (
        clusters.groupBy("cluster_id")
        .agg(F.min("vid").alias(id_col))
        .select(id_col)
    )
    kept_ids = (
        keep_exact.join(reps, id_col, "left_semi").localCheckpoint(eager=True)
    )
    release_checkpoint(keep_exact)
    counts.append(("near_dedup", kept_ids.count()))

    # -- stage 4: per-stratum cap (md5-ordered rank within each stratum),
    # computed on a NARROW (id, stratum cols) frame — the rank never sees
    # text; the returned ``kept`` re-derives text lazily from the source
    # scan against the final checkpointed id list (which therefore stays
    # alive for the caller; it is |kept|-of-ids small).
    meta = docs.select(
        F.col(id_col), *[F.col(c) for c in stratum_cols]
    ).join(kept_ids, id_col, "left_semi")
    if per_stratum_cap is not None:
        rank_key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col)))
        w = Window.partitionBy(*[F.col(c) for c in stratum_cols]).orderBy(
            rank_key, F.col(id_col)
        )
        meta = (
            meta.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_stratum_cap)
        )
    final_ids = meta.select(id_col).localCheckpoint(eager=True)
    release_checkpoint(kept_ids)
    counts.append(("stratum_cap", final_ids.count()))
    kept = docs.join(final_ids, id_col, "left_semi")

    if out_dir is not None:
        write_training_shards(kept, out_dir, id_col, n_shards, seed)

    assert tuple(s for s, _ in counts) == _STAGES  # stage list single-sourced
    stats = spark.createDataFrame(
        [(s, int(n)) for s, n in counts], "stage string, rows long"
    )
    return CurationResult(kept=kept, stats=stats)


def experiment_readout(
    events: DataFrame,
    seed: str = "exp:",
    critical: float = 3.841,
    z_sum: float = 2.801585219,
) -> DataFrame:
    """The composed A/B-experiment read-out — the experiment suite's four
    individually oracle-checked stages (q_srm_check validity, raw lift,
    q_cuped_adjusted variance reduction, q_power_analysis sizing) as ONE
    first-class API over an exposure/metric event stream: one row with
    everything an experiment review reads.

    Stages share ONE per-user rollup (the decimal-pinned pre-covariate x /
    post-metric y split at the integer-µs calendar midpoint) and ONE
    pooled 1-row stats frame; arms are the replayable seeded-md5 50/50
    bucket (``seed`` must match the assignment seed used at exposure).
    Output columns: n_users, n_treatment, n_control, chi2_stat, srm_alarm,
    mean_post_treatment/control, lift, theta, mean_adj_treatment/control,
    lift_adj, var_metric, n_per_arm, mde_abs.

    Scale shape: one combinable user groupBy over events, two 1-row
    frames, one conditional-aggregate fold — no windows, no collects.
    Determinism mirrors the registered queries exactly: decimal-pinned
    sums, products re-pinned before pooled stats, y_adj re-pinned before
    the arm fold; var/MDE are sqrt-only chains (q_power_analysis uses the
    per-user TOTAL x+y as the sizing metric, and so does this readout —
    cross-checked in tests/test_engine.py against all three queries).
    """
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = events.agg(
        F.expr(
            "(min(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid")
    )
    d2 = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    per = (
        events.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(ts_us <= F.col("mid"), d2(F.col("value")))),
                F.lit(0).cast("decimal(28,2)"),
            )
            .cast("double")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(ts_us > F.col("mid"), d2(F.col("value")))),
                F.lit(0).cast("decimal(28,2)"),
            )
            .cast("double")
            .alias("y"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    per = per.select(
        (bucket < 50).alias("is_t"),
        "x",
        "y",
        (F.col("x") + F.col("y")).cast("decimal(19,2)").alias("m"),
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d2(F.col("x"))).cast("double").alias("sx"),
        F.sum(d2(F.col("y"))).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("m")).cast("double").alias("sm"),
        F.sum(
            (F.col("m").cast("double") * F.col("m").cast("double")).cast(
                "decimal(28,4)"
            )
        )
        .cast("double")
        .alias("smm"),
    )
    theta = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    xbar = F.col("sx") / F.col("n")
    adj = per.crossJoin(F.broadcast(stats)).select(
        "is_t",
        d2(F.col("y")).alias("yp"),
        (F.col("y") - theta * (F.col("x") - xbar))
        .cast("decimal(18,6)")
        .alias("ya"),
        theta.alias("theta"),
        F.col("n").alias("n"),
        F.col("sm").alias("sm"),
        F.col("smm").alias("smm"),
    )
    n = F.col("n")
    n_t = F.col("n_t")
    n_c = F.col("n_c")
    e = (n_t + n_c).cast("double") * 0.5

    def dev(c):
        d = c.cast("double") - e
        return d * d / e

    var = (F.col("smm") - F.col("sm") * F.col("sm") / n) / (n - 1)
    n_arm = F.expr("n DIV 2")
    out = adj.groupBy("theta", "n", "sm", "smm").agg(
        F.count_if(F.col("is_t")).alias("n_t"),
        F.count_if(~F.col("is_t")).alias("n_c"),
        F.sum(F.when(F.col("is_t"), F.col("yp"))).cast("double").alias("syt"),
        F.sum(F.when(~F.col("is_t"), F.col("yp"))).cast("double").alias("syc"),
        F.sum(F.when(F.col("is_t"), F.col("ya"))).cast("double").alias("sat"),
        F.sum(F.when(~F.col("is_t"), F.col("ya"))).cast("double").alias("sac"),
    )
    chi2 = dev(n_t) + dev(n_c)
    mt = F.col("syt") / n_t
    mc = F.col("syc") / n_c
    mat = F.col("sat") / n_t
    mac = F.col("sac") / n_c
    return out.select(
        n.cast("bigint").alias("n_users"),
        n_t.cast("bigint").alias("n_treatment"),
        n_c.cast("bigint").alias("n_control"),
        chi2.alias("chi2_stat"),
        (chi2 > critical).alias("srm_alarm"),
        mt.alias("mean_post_treatment"),
        mc.alias("mean_post_control"),
        (mt - mc).alias("lift"),
        F.col("theta").alias("theta"),
        mat.alias("mean_adj_treatment"),
        mac.alias("mean_adj_control"),
        (mat - mac).alias("lift_adj"),
        var.alias("var_metric"),
        n_arm.cast("bigint").alias("n_per_arm"),
        (F.lit(z_sum) * F.sqrt(F.lit(2.0) * var / n_arm)).alias("mde_abs"),
    )


def user_features(events: DataFrame) -> DataFrame:
    """The churn/LTV/propensity feature contract as a reusable API — the
    same frame q_user_feature_table registers (RFM + tenure + intensity
    per user, one combinable groupBy + broadcast anchor, every feature
    integer-exact or decimal-pinned), exported for pipelines that join it
    by user_id instead of going through the query registry.  Kept in
    lock-step with the query by a bitwise cross-check test
    (tests/test_engine.py)."""
    anchor = events.agg(F.max("ts").alias("mx"))
    day = F.col("ts").cast("date")
    d2 = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    return (
        events.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max(day), F.min(day)).cast("int").alias(
                "tenure_days"
            ),
            F.datediff(F.any_value(F.col("mx")).cast("date"), F.max(day))
            .cast("int")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("bigint")
            .alias("n_purchases"),
            F.countDistinct(day).cast("bigint").alias("active_days"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        d2(F.col("value")),
                    )
                ),
                F.lit(0).cast("decimal(28,2)"),
            )
            .cast("double")
            .alias("revenue"),
            F.expr(
                "count(*) * 1000 DIV count(DISTINCT CAST(ts AS DATE))"
            ).alias("events_per_active_day_e3"),
        )
    )


def monitor_readout(
    events: DataFrame,
    ks_alarm: float = 0.1,
    psi_alarm: float = 0.2,
    chi2_critical: float = 9.488,
) -> DataFrame:
    """The composed drift-monitoring read-out — the drift suite's three
    individually oracle-checked mechanisms (q_ks_drift's exact ECDF
    distance, q_psi_drift's rank-selected-decile PSI, and
    q_chi2_independence's contingency chi2) pointed at the ONE question a
    data monitor actually asks: did the CURRENT half of the window drift
    from the REFERENCE half?  One row out: row counts, the KS distance on
    the metric distribution, Jeffreys-smoothed PSI over the reference's
    exact decile bins, the event-type mix chi2, and literal-threshold
    alarms for each (chi2_critical defaults to df=4 at alpha=0.05).

    Scale shape inherits the operators it reuses: the KS prefix runs
    through the shared 1024-cell histogram decomposition (cell bases +
    PARALLEL within-cell prefixes — no single-task ordered pass over
    distinct values); the PSI decile edges come from the shared
    rank-selection (never a global sort window); the mix table is one
    combinable rollup.  Every statistic is a deterministic chain off
    exact integer counts (the KS gap is a ratio of exact integer
    products; PSI terms decimal-pin before the 10-row sum), so two runs
    over the same window are bit-identical — the property the
    test_engine cross-check asserts against an independent DuckDB
    derivation.
    """
    from opc2mongodb_spark.operators.histogram import (
        bin_spine,
        cell_stats,
        decile_ranks,
        edge_bin,
        rank_select,
        with_cells,
    )

    mid = events.agg(
        F.expr(
            "(min(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid")
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.crossJoin(F.broadcast(mid)).select(
        "event_type",
        "event_id",
        "value",
        F.when(ts_us <= F.col("mid"), 1).otherwise(0).alias("i1"),
        F.when(ts_us > F.col("mid"), 1).otherwise(0).alias("i2"),
    )
    vals = flagged.filter(F.col("value").isNotNull())

    # --- KS (the q_ks_drift cell decomposition, ref-half vs cur-half) ---
    u = (
        vals.select(F.col("value").alias("v"), "i1", "i2")
        .groupBy("v")
        .agg(F.sum("i1").alias("a"), F.sum("i2").alias("b"))
    )
    stats = cell_stats(
        u, "v", extra_aggs=[F.sum("a").alias("n1"), F.sum("b").alias("n2")]
    )
    uc = with_cells(u, "v", stats).withColumnRenamed("__cell", "cell")
    wc = Window.orderBy("cell").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bases = (
        uc.groupBy("cell")
        .agg(F.sum("a").alias("sa"), F.sum("b").alias("sb"))
        .select(
            "cell",
            (F.sum("sa").over(wc) - F.col("sa")).alias("base1"),
            (F.sum("sb").over(wc) - F.col("sb")).alias("base2"),
        )
    )
    wi = (
        Window.partitionBy("cell")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ks = (
        uc.join(F.broadcast(bases), "cell")
        .withColumn("cu1", F.col("base1") + F.sum("a").over(wi))
        .withColumn("cu2", F.col("base2") + F.sum("b").over(wi))
        .agg(
            F.max(
                F.abs(
                    F.col("cu1") * F.col("n2") - F.col("cu2") * F.col("n1")
                )
            ).alias("num"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
        .select(
            F.col("n1").cast("long").alias("n_ref"),
            F.col("n2").cast("long").alias("n_cur"),
            (
                F.col("num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("ks_d"),
        )
    )

    # --- PSI over the reference half's exact decile bins ----------------
    ref = vals.filter(F.col("i1") == 1).select(
        F.col("value").alias("v"), "event_id"
    )
    cur = vals.filter(F.col("i2") == 1).select(F.col("value").alias("v"))
    deciles = rank_select(
        ref,
        "v",
        decile_ranks(),
        tiebreak_cols=["event_id"],
    )
    # One tiny (1-row) frame, consumed twice via broadcast below. NOT
    # persisted: the builder returns lazily, so a persist here would have no
    # post-action unpersist hook and would leak a cached block per call in a
    # long-lived session; identical subplans dedupe via ReusedExchange.
    edges_arr = deciles.agg(
        F.array_sort(F.collect_list("v")).alias("es")
    )

    def binned(df):
        return df.crossJoin(F.broadcast(edges_arr)).select(
            edge_bin(F.col("v"), F.col("es")).alias("bin")
        )

    c1 = binned(ref).groupBy("bin").agg(F.count(F.lit(1)).alias("c1"))
    c2 = binned(cur).groupBy("bin").agg(F.count(F.lit(1)).alias("c2"))
    spark = events.sparkSession
    spine = bin_spine(spark)
    totals = vals.agg(
        F.sum("i1").alias("n1"), F.sum("i2").alias("n2")
    )
    counts = (
        spine.join(c1, "bin", "left")
        .join(c2, "bin", "left")
        .select(
            "bin",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        .crossJoin(F.broadcast(totals))
    )
    p = (F.col("c1") + 0.5) / (F.col("n1") + 5.0)
    q = (F.col("c2") + 0.5) / (F.col("n2") + 5.0)
    psi = counts.select(
        ((p - q) * F.log(p / q)).cast("decimal(26,12)").alias("term")
    ).agg(F.sum("term").cast("double").alias("psi"))

    # --- event-type mix chi2 (type x half contingency) -------------------
    mix = flagged.groupBy("event_type").agg(
        F.sum("i1").alias("o1"), F.sum("i2").alias("o2")
    )
    mt = mix.agg(
        F.sum("o1").cast("bigint").alias("r1"),
        F.sum("o2").cast("bigint").alias("r2"),
    )
    chi2 = (
        mix.crossJoin(F.broadcast(mt))
        .select(
            (
                (
                    F.col("o1").cast("double")
                    - (F.col("o1") + F.col("o2")).cast("double")
                    * F.col("r1").cast("double")
                    / (F.col("r1") + F.col("r2")).cast("double")
                )
                ** 2
                / (
                    (F.col("o1") + F.col("o2")).cast("double")
                    * F.col("r1").cast("double")
                    / (F.col("r1") + F.col("r2")).cast("double")
                )
                + (
                    F.col("o2").cast("double")
                    - (F.col("o1") + F.col("o2")).cast("double")
                    * F.col("r2").cast("double")
                    / (F.col("r1") + F.col("r2")).cast("double")
                )
                ** 2
                / (
                    (F.col("o1") + F.col("o2")).cast("double")
                    * F.col("r2").cast("double")
                    / (F.col("r1") + F.col("r2")).cast("double")
                )
            )
            .cast("decimal(26,12)")
            .alias("term")
        )
        .agg(F.sum("term").cast("double").alias("chi2_mix"))
    )

    return (
        ks.crossJoin(F.broadcast(psi))
        .crossJoin(F.broadcast(chi2))
        .select(
            "n_ref",
            "n_cur",
            "ks_d",
            (F.col("ks_d") > ks_alarm).alias("ks_alarm"),
            "psi",
            (F.col("psi") > psi_alarm).alias("psi_alarm"),
            "chi2_mix",
            (F.col("chi2_mix") > chi2_critical).alias("mix_alarm"),
        )
    )

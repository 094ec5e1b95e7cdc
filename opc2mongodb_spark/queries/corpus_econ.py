"""Query registrations: r8 batches 23-40: ER matching, Fourier/Heaps fits, Markov entropy, stump, bandits, DiD, supplier/trade economics, SAX motifs.

Mechanically split from the original single-module registry (r9);
registration order and bodies unchanged. Determinism rulebook:
the package docstring (queries/__init__.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opc2mongodb_spark.queries._core import _t, dec, register, sci9
from opc2mongodb_spark.queries.relational import _CAND_CTES, _SIGS_SQL, _TOK_CTE

@register(
    "q_survival_by_cohort",
    """
WITH life AS (
    SELECT user_id,
           CAST(date_trunc('month', min(ts)) AS DATE) AS cohort_month,
           date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS lifetime_days
    FROM events GROUP BY user_id
),
d AS (
    SELECT cohort_month, CAST(lifetime_days AS INT) AS t,
           count(*) AS deaths
    FROM life GROUP BY 1, 2
),
spine AS (
    SELECT cohort_month, t, deaths,
           CAST(sum(deaths) OVER (PARTITION BY cohort_month
                                  ORDER BY t DESC) AS BIGINT) AS at_risk,
           CAST(sum(deaths) OVER (PARTITION BY cohort_month) AS BIGINT)
               AS n_total
    FROM d
)
SELECT cohort_month,
       CAST(any_value(n_total) AS BIGINT) AS n_users,
       CAST(min(CASE WHEN 2 * (at_risk - deaths) <= n_total THEN t END)
            AS INT) AS median_lifetime_days,
       CAST(CAST(sum(CAST(t AS DECIMAL(18,2)) * deaths)
                 / any_value(n_total) AS DECIMAL(18,6)) AS DOUBLE)
           AS mean_lifetime_days
FROM spine GROUP BY cohort_month
""",
)
def q_survival_by_cohort(spark, sf_dir):
    # Survival functionals PER acquisition cohort — q_survival_summary
    # grouped by first-activity month, the comparison a lifecycle team
    # actually reads ("are March signups outliving January's?").  Same
    # exactness move: complete observation telescopes KM to
    # remaining/n_total, so the median crossing is a pure integer
    # comparison per cohort; the spine windows PARTITION BY cohort (no
    # global single-task window), and the mean is pinned decimal.
    ev = _t(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias(
            "cohort_month"
        ),
        F.datediff(
            F.max("ts").cast("date"), F.min("ts").cast("date")
        ).alias("lifetime_days"),
    )
    d = life.groupBy(
        "cohort_month", F.col("lifetime_days").cast("int").alias("t")
    ).agg(F.count(F.lit(1)).alias("deaths"))
    w_rev = (
        Window.partitionBy("cohort_month")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("cohort_month").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    spine = d.select(
        "cohort_month",
        "t",
        "deaths",
        F.sum("deaths").over(w_rev).cast("bigint").alias("at_risk"),
        F.sum("deaths").over(w_all).cast("bigint").alias("n_total"),
    )
    remaining = F.col("at_risk") - F.col("deaths")
    return spine.groupBy("cohort_month").agg(
        F.any_value("n_total").cast("bigint").alias("n_users"),
        F.min(
            F.when(2 * remaining <= F.col("n_total"), F.col("t"))
        )
        .cast("int")
        .alias("median_lifetime_days"),
        (
            F.sum(F.col("t").cast("decimal(18,2)") * F.col("deaths"))
            / F.any_value("n_total")
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("mean_lifetime_days"),
    )


@register(
    "q_split_balance_audit",
    """
WITH per AS (
    SELECT user_id,
           CASE WHEN sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) * 5 > count(*)
                THEN 1 ELSE 0 END AS label,
           CAST(CAST(('0x' || substring(md5('split:' ||
                     CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 10 AS INTEGER) AS b
    FROM events GROUP BY user_id
),
assigned AS (
    SELECT CASE WHEN b < 8 THEN 'train'
                WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
           label
    FROM per
),
s AS (
    SELECT split, count(*) AS n, sum(label) AS pos FROM assigned
    GROUP BY split
),
g AS (SELECT sum(n) AS nt, sum(pos) AS post FROM s)
SELECT s.split, CAST(s.n AS BIGINT) AS n_users,
       CAST(s.pos AS BIGINT) AS n_positive,
       s.pos * 1000000000 // s.n AS pos_ppb,
       abs(s.pos * 1000000000 // s.n
           - g.post * 1000000000 // g.nt) AS ppb_deviation
FROM s CROSS JOIN g
""",
)
def q_split_balance_audit(spark, sf_dir):
    # Train/val/test label-balance audit: the md5 80/10/10 split
    # (q_split_assign's discipline) checked for label skew — each
    # split's heavy-purchaser rate vs the global rate, in exact ppb.
    # A split whose deviation is large leaks distributional bias into
    # eval.  One user rollup, a 3-row fold, a 1-row global broadcast;
    # integer arithmetic end to end.
    ev = _t(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint") % 10
    per = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("label"),
    ).select(
        "label",
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    s = per.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos")
    )
    g = s.agg(
        F.sum("n").alias("nt"), F.sum("pos").alias("post")
    )
    return s.crossJoin(F.broadcast(g)).select(
        "split",
        F.col("n").cast("bigint").alias("n_users"),
        F.col("pos").cast("bigint").alias("n_positive"),
        F.expr("pos * 1000000000 DIV n").alias("pos_ppb"),
        F.abs(
            F.expr("pos * 1000000000 DIV n")
            - F.expr("post * 1000000000 DIV nt")
        ).alias("ppb_deviation"),
    )


@register(
    "q_variance_components",
    """
WITH per AS (
    SELECT user_id, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS sxx
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
),
g AS (
    SELECT count(*) AS k,
           CAST(sum(n) AS BIGINT) AS nt,
           CAST(sum(CAST(sx AS DECIMAL(18,2))) AS DOUBLE) AS gsx,
           CAST(sum(CAST(sxx AS DECIMAL(28,4))) AS DOUBLE) AS gsxx,
           CAST(sum(CAST(sx * sx / n AS DECIMAL(28,6))) AS DOUBLE)
               AS sum_groupmeans
    FROM per
)
SELECT CAST(k AS BIGINT) AS n_users, nt AS n_obs,
       printf('%.9e', gsxx - sum_groupmeans) AS ss_within,
       printf('%.9e', sum_groupmeans - gsx * gsx / nt) AS ss_between,
       printf('%.9e',
              (sum_groupmeans - gsx * gsx / nt)
              / (gsxx - gsx * gsx / nt)) AS icc_raw
FROM g WHERE k >= 2 AND (gsxx - gsx * gsx / nt) > 0
""",
)
def q_variance_components(spark, sf_dir):
    # One-way variance decomposition of the metric across users:
    # SS_between (user-level) vs SS_within (visit-level) and the raw
    # intraclass share — the number that decides whether an experiment
    # must randomize by USER (high ICC: observations within a user are
    # correlated, per-event randomization is pseudo-replication; the
    # design input behind q_ratio_metric_delta's estimator choice).
    # Per-user pinned moments, one 1-row fold; each per-user mean term
    # sx^2/n is re-pinned to decimal BEFORE the global sum so partial
    # aggregation cannot drift it; the SS chains render %.9e.
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("value"))).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
    )
    g = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(dec(F.col("sx"))).cast("double").alias("gsx"),
        F.sum(F.col("sxx").cast("decimal(28,4)"))
        .cast("double")
        .alias("gsxx"),
        F.sum(
            (F.col("sx") * F.col("sx") / F.col("n")).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("sum_groupmeans"),
    )
    tot_ss = F.col("gsxx") - F.col("gsx") * F.col("gsx") / F.col("nt")
    between = F.col("sum_groupmeans") - F.col("gsx") * F.col("gsx") / F.col(
        "nt"
    )
    within = F.col("gsxx") - F.col("sum_groupmeans")
    return (
        g.filter((F.col("k") >= 2) & (tot_ss > 0))
        .select(
            F.col("k").cast("bigint").alias("n_users"),
            F.col("nt").alias("n_obs"),
            sci9(within).alias("ss_within"),
            sci9(between).alias("ss_between"),
            sci9(between / tot_ss).alias("icc_raw"),
        )
    )


@register(
    "q_hill_tail_index",
    """
WITH v AS (
    SELECT value, event_id FROM events
    WHERE value IS NOT NULL AND value > 0
),
rk AS (
    SELECT value,
           row_number() OVER (ORDER BY value DESC, event_id DESC) AS r,
           count(*) OVER () AS n
    FROM v
),
topk AS (
    SELECT value, r,
           max(CASE WHEN r = 101 THEN value END) OVER () AS x_k
    FROM rk WHERE r <= 101
),
terms AS (
    SELECT CAST(ln(value / x_k) AS DECIMAL(18,12)) AS t
    FROM topk WHERE r <= 100
)
SELECT CAST(count(*) AS BIGINT) AS k,
       printf('%.9e', CAST(sum(t) AS DOUBLE) / count(*)) AS hill_gamma,
       printf('%.9e', count(*) / CAST(sum(t) AS DOUBLE)) AS tail_alpha
FROM terms
""",
)
def q_hill_tail_index(spark, sf_dir):
    # Hill estimator of the tail index over the top-100 order statistics
    # of value: gamma = mean ln(x_(i)/x_(k+1)), alpha = 1/gamma — the
    # heavy-tail diagnosis (alpha < 2: infinite variance, your mean-based
    # monitoring is lying) next to q_zipf_fit's rank-law view.  The
    # top-101 frame comes from a TopK (LIMIT-class, never a full global
    # sort at scale; here via the unique (value, event_id) rank bounded
    # to 101 rows), each ln term is decimal-pinned before the 100-term
    # sum, and gamma/alpha render %.9e.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    top = (
        ev.select("value", "event_id")
        .orderBy(F.col("value").desc(), F.col("event_id").desc())
        .limit(101)
    )
    w = Window.orderBy(F.col("value").desc(), F.col("event_id").desc())
    rk = top.select(
        "value", F.row_number().over(w).alias("r")
    )
    xk = rk.filter(F.col("r") == 101).select(
        F.col("value").alias("x_k")
    )
    terms = (
        rk.filter(F.col("r") <= 100)
        .crossJoin(F.broadcast(xk))
        .select(
            F.log(F.col("value") / F.col("x_k"))
            .cast("decimal(18,12)")
            .alias("t")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        sci9(F.sum("t").cast("double") / F.count(F.lit(1))).alias("hill_gamma"),
        sci9(F.count(F.lit(1)) / F.sum("t").cast("double")).alias("tail_alpha"),
    )


@register(
    "q_geometric_mean",
    """
WITH v AS (
    SELECT event_type, CAST(ln(value) AS DECIMAL(18,12)) AS lnv
    FROM events WHERE value IS NOT NULL AND value > 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       printf('%.9e', exp(CAST(sum(lnv) AS DOUBLE) / count(*)))
           AS geo_mean
FROM v GROUP BY event_type
""",
)
def q_geometric_mean(spark, sf_dir):
    # Geometric mean per series — the right central tendency for
    # multiplicative/skewed metrics (latencies, revenues), where the
    # arithmetic mean chases the tail q_hill_tail_index just diagnosed.
    # exp(mean(ln x)) with each ln decimal-pinned before the group sum
    # (the standing transcendental discipline), %.9e out.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    v = ev.select(
        "event_type",
        F.log("value").cast("decimal(18,12)").alias("lnv"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        sci9(F.exp(F.sum("lnv").cast("double") / F.count(F.lit(1)))).alias("geo_mean"),
    )


@register(
    "q_newcomer_share",
    """
WITH first_ts AS (
    SELECT user_id, min(epoch_us(ts)) AS t0 FROM events GROUP BY user_id
),
tagged AS (
    SELECT CAST(date_trunc('week', e.ts) AS DATE) AS wk,
           CASE WHEN epoch_us(e.ts) - f.t0 <= 604800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events e JOIN first_ts f ON e.user_id = f.user_id
)
SELECT wk, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_new) AS BIGINT) AS newcomer_events,
       sum(is_new) * 1000000000 // count(*) AS newcomer_ppb
FROM tagged GROUP BY wk
""",
)
def q_newcomer_share(spark, sf_dir):
    # Newcomer traffic mix per week: the share of events generated by
    # users within their FIRST 7 days — the onboarding-load read that
    # explains support volume and cache hit-rate swings (a launch week
    # looks nothing like steady state).  One per-user first-seen rollup
    # joined back user-keyed (AQE broadcasts when it fits), one weekly
    # integer rollup, exact ppb.
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    first_ts = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t0")
    )
    tagged = ev.join(first_ts, "user_id").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        F.when(us - F.col("t0") <= 604800000000, 1)
        .otherwise(0)
        .alias("is_new"),
    )
    return tagged.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("is_new").cast("bigint").alias("newcomer_events"),
        F.expr("sum(is_new) * 1000000000 DIV count(*)").alias(
            "newcomer_ppb"
        ),
    )


@register(
    "q_spearman_corr",
    """
WITH xs0 AS (
    SELECT l_quantity AS v, count(*) AS c FROM lineitem GROUP BY l_quantity
),
xs AS (
    SELECT v, CAST(2 * sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - c + 1 AS BIGINT) AS r2
    FROM xs0
),
ys0 AS (
    SELECT l_discount AS v, count(*) AS c FROM lineitem GROUP BY l_discount
),
ys AS (
    SELECT v, CAST(2 * sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - c + 1 AS BIGINT) AS r2
    FROM ys0
),
nn AS (SELECT count(*) AS n FROM lineitem),
j AS (
    SELECT xs.r2 - (nn.n + 1) AS dx, ys.r2 - (nn.n + 1) AS dy
    FROM lineitem l
    JOIN xs ON l.l_quantity = xs.v
    JOIN ys ON l.l_discount = ys.v
    CROSS JOIN nn
),
s AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
                AS DOUBLE) AS sxy,
           CAST(sum(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))
                AS DOUBLE) AS sxx,
           CAST(sum(CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
                AS DOUBLE) AS syy
    FROM j
)
SELECT CAST(n AS BIGINT) AS n_rows,
       printf('%.9e', sxy / sqrt(sxx * syy)) AS rho_spearman
FROM s WHERE sxx > 0 AND syy > 0
""",
)
def q_spearman_corr(spark, sf_dir):
    # Spearman rank correlation of quantity vs discount WITHOUT a global
    # sort: both columns are low-cardinality, so the tied average ranks
    # are a pure function of the VALUE-FREQUENCY SPINE (|distinct values|
    # rows — 50 and 11 here).  Average tied rank for value v with count c
    # and inclusive cumulative cum is cum-(c-1)/2; we carry 2*rank
    # (2*cum-c+1) so the spine stays integer-exact.  The cumulative walk
    # is a window over the AGGREGATED spine (value-cardinality-bounded,
    # the q_histogram_median discipline — never over the raw rows); the
    # spines and the 1-row count broadcast back onto the fact scan, so
    # the only full-data passes are one groupBy and one map-side join.
    # Deviations from the exact mean rank (n+1, in 2*rank units) keep the
    # moment sums cancellation-free; products pin to decimal(38,0) before
    # summation, the sqrt chain renders %.9e.  Scales: spine arithmetic
    # is O(|values|), fact pass is shuffle-free after the broadcasts.
    li = _t(spark, sf_dir, "lineitem")

    def rank_spine(col):
        spine = li.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        return spine.select(
            "v",
            (2 * F.sum("c").over(w) - F.col("c") + 1)
            .cast("bigint")
            .alias("r2"),
        )

    xs = rank_spine("l_quantity").withColumnRenamed("r2", "rx2")
    ys = rank_spine("l_discount").withColumnRenamed("r2", "ry2")
    nn = li.agg(F.count(F.lit(1)).alias("n"))
    j = (
        li.select("l_quantity", "l_discount")
        .join(F.broadcast(xs), F.col("l_quantity") == xs["v"])
        .join(F.broadcast(ys), F.col("l_discount") == ys["v"])
        .crossJoin(F.broadcast(nn))
        .select(
            (F.col("rx2") - (F.col("n") + 1)).alias("dx"),
            (F.col("ry2") - (F.col("n") + 1)).alias("dy"),
        )
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d19("dx") * d19("dy")).cast("double").alias("sxy"),
        F.sum(d19("dx") * d19("dx")).cast("double").alias("sxx"),
        F.sum(d19("dy") * d19("dy")).cast("double").alias("syy"),
    )
    return s.filter((F.col("sxx") > 0) & (F.col("syy") > 0)).select(
        F.col("n").cast("bigint").alias("n_rows"),
        sci9(F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy"))).alias("rho_spearman"),
    )


@register(
    "q_kendall_tau",
    """
WITH cells AS (
    SELECT l_quantity AS q, l_discount AS d, count(*) AS n
    FROM lineitem GROUP BY l_quantity, l_discount
),
pair_sums AS (
    SELECT sum(CASE WHEN b.d > a.d THEN a.n * b.n ELSE 0 END) AS conc,
           sum(CASE WHEN b.d < a.d THEN a.n * b.n ELSE 0 END) AS disc
    FROM cells a JOIN cells b ON b.q > a.q
),
tx AS (
    SELECT sum((c * (c - 1)) // 2) AS t FROM (
        SELECT sum(n) AS c FROM cells GROUP BY q)
),
ty AS (
    SELECT sum((c * (c - 1)) // 2) AS t FROM (
        SELECT sum(n) AS c FROM cells GROUP BY d)
),
nn AS (SELECT (sum(n) * (sum(n) - 1)) // 2 AS n0,
              CAST(sum(n) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_cells
       FROM cells)
SELECT nn.n_rows, nn.n_cells,
       CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       printf('%.9e',
              CAST(conc - disc AS DOUBLE)
              / sqrt(CAST(nn.n0 - tx.t AS DOUBLE)
                     * CAST(nn.n0 - ty.t AS DOUBLE))) AS tau_b
FROM pair_sums, tx, ty, nn
WHERE nn.n0 > tx.t AND nn.n0 > ty.t
""",
)
def q_kendall_tau(spark, sf_dir):
    # Kendall tau-b of quantity vs discount from the CONTINGENCY TABLE,
    # not the O(n^2) pair walk: concordant/discordant pair counts are
    # sums of n_ij*n_kl over strictly-ordered cell pairs, so after ONE
    # combinable groupBy the whole statistic runs on the |q|x|d| cell
    # frame (<=550 rows here; bounded by the product of the two value
    # cardinalities, the same honest bound q_key_skew_gini documents).
    # The cell self-join is inequality-only on a broadcast frame
    # (nested-loop over <=550^2 — never a fact-table cartesian); tie
    # corrections come off the two marginals; everything is
    # integer-exact until the final tau sqrt, which renders %.9e.
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").alias("q"), F.col("l_discount").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = cells.alias("a")
    b = cells.alias("b")
    pair_sums = (
        a.join(F.broadcast(b), F.col("b.q") > F.col("a.q"))
        .agg(
            F.sum(
                F.when(
                    F.col("b.d") > F.col("a.d"),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            ).alias("conc"),
            F.sum(
                F.when(
                    F.col("b.d") < F.col("a.d"),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            ).alias("disc"),
        )
    )
    tx = (
        cells.groupBy("q")
        .agg(F.sum("n").alias("c"))
        .agg(F.sum(F.expr("(c * (c - 1)) DIV 2")).alias("t"))
    )
    ty = (
        cells.groupBy("d")
        .agg(F.sum("n").alias("c"))
        .agg(F.sum(F.expr("(c * (c - 1)) DIV 2")).alias("t"))
    )
    nn = cells.agg(
        F.expr("(sum(n) * (sum(n) - 1)) DIV 2").alias("n0"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    out = (
        pair_sums.crossJoin(F.broadcast(tx.withColumnRenamed("t", "t_x")))
        .crossJoin(F.broadcast(ty.withColumnRenamed("t", "t_y")))
        .crossJoin(F.broadcast(nn))
    )
    return out.filter(
        (F.col("n0") > F.col("t_x")) & (F.col("n0") > F.col("t_y"))
    ).select(
        "n_rows",
        "n_cells",
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        sci9((F.col("conc") - F.col("disc")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("t_x")).cast("double")
                * (F.col("n0") - F.col("t_y")).cast("double")
            )).alias("tau_b"),
    )


# Poisson(1) inverse-CDF cutoffs on the 52-bit md5-uniform scale:
# floor(CDF(k) * 2^52) for k = 0..8 (the ELSE arm is 9; P(w > 9) < 1e-7).
# Computed once in Python and embedded as LITERALS in both engines, so the
# bootstrap weights are bit-identical by construction.
_POIS1_CUTS = [
    1656781714176974,
    3313563428353948,
    4141954285442435,
    4418084571138597,
    4487117142562638,
    4500923656847446,
    4503224742561580,
    4503553469092171,
    4503594559908495,
]


def _pois1_case_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CUTS)
    )
    return f"CASE {arms} ELSE 9 END"


@register(
    "q_poisson_bootstrap",
    f"""
WITH base AS (
    SELECT event_type, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS xs
    FROM events WHERE value IS NOT NULL
),
rep AS (
    SELECT event_type, r, xs,
           {_pois1_case_sql("u")} AS w
    FROM (
        SELECT b.event_type, b.xs, reps.r,
               CAST('0x' || substring(
                   md5(CAST(b.event_id AS VARCHAR) || ':' ||
                       CAST(reps.r AS VARCHAR) || '|boot'), 1, 13)
                   AS BIGINT) AS u
        FROM base b
        CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS r) reps)
),
means AS (
    SELECT event_type, r,
           CAST(sum(w * xs) AS BIGINT) // CAST(sum(w) AS BIGINT) AS m
    FROM rep GROUP BY event_type, r HAVING sum(w) > 0
),
ranked AS (
    SELECT event_type, m, r,
           row_number() OVER (PARTITION BY event_type ORDER BY m, r) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n_rep
    FROM means
),
point AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(xs) AS BIGINT) // count(*) AS point_mean_micro
    FROM base GROUP BY event_type
)
SELECT p.event_type, p.n_rows,
       CAST(max(k.n_rep) AS BIGINT) AS n_replicas,
       p.point_mean_micro,
       max(CASE WHEN k.rn = 2 THEN k.m END) AS boot_lo_micro,
       max(CASE WHEN k.rn = 31 THEN k.m END) AS boot_hi_micro
FROM ranked k JOIN point p USING (event_type)
GROUP BY p.event_type, p.n_rows, p.point_mean_micro
""",
)
def q_poisson_bootstrap(spark, sf_dir):
    # Poisson(1) bootstrap confidence interval for the per-series mean —
    # THE distributed-inference primitive (resampling-with-replacement is
    # impossible without coordination at 100 TB; independent per-row
    # Poisson(1) weights are the standard industrial substitute).  32
    # replicas materialize as a map-side sequence explode (32x map work,
    # zero extra shuffle width: the (type, replica) rollup is map-side
    # combinable into |types|*32 rows); weights come from the md5 52-bit
    # uniform against PRECOMPUTED inverse-CDF integer cutoffs embedded as
    # literals on both engines, so every weight is bit-identical by
    # construction.  Values floor-scale to exact micro-integers, replica
    # means are integer DIV, and the CI is rank 2 / rank 31 of the 32
    # replica means (a window over a 32-row-per-type frame).
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("xs"),
    )
    rep = base.select(
        "event_type",
        "xs",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
        F.col("event_id"),
    ).select(
        "event_type",
        "xs",
        "r",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("r").cast("string"),
                        F.lit("|boot"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u"),
    )
    w = F.lit(9)
    for k, c in reversed(list(enumerate(_POIS1_CUTS))):
        w = F.when(F.col("u") < c, F.lit(k)).otherwise(w)
    means = (
        rep.select("event_type", "r", "xs", w.alias("w"))
        .groupBy("event_type", "r")
        .agg(
            F.sum(F.col("w") * F.col("xs")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            "r",
            F.expr("CAST(swx AS BIGINT) DIV CAST(sw AS BIGINT)").alias("m"),
        )
    )
    wspec = Window.partitionBy("event_type").orderBy("m", "r")
    ranked = means.select(
        "event_type",
        "m",
        F.row_number().over(wspec).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_rep"),
    )
    point = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("CAST(sum(xs) AS BIGINT) DIV count(*)").alias(
            "point_mean_micro"
        ),
    )
    return (
        ranked.join(F.broadcast(point), "event_type")
        .groupBy("event_type", "n_rows", "point_mean_micro")
        .agg(
            F.max("n_rep").cast("bigint").alias("n_replicas"),
            F.max(F.when(F.col("rn") == 2, F.col("m"))).alias(
                "boot_lo_micro"
            ),
            F.max(F.when(F.col("rn") == 31, F.col("m"))).alias(
                "boot_hi_micro"
            ),
        )
        .select(
            "event_type",
            "n_rows",
            "n_replicas",
            "point_mean_micro",
            "boot_lo_micro",
            "boot_hi_micro",
        )
    )


@register(
    "q_popularity_mrr",
    """
WITH pop AS (
    SELECT l_partkey AS partkey, count(DISTINCT l_orderkey) AS cnt
    FROM lineitem GROUP BY l_partkey
),
top20 AS (
    SELECT partkey,
           row_number() OVER (ORDER BY cnt DESC, partkey) AS rnk
    FROM (SELECT * FROM pop ORDER BY cnt DESC, partkey LIMIT 20)
),
last_order AS (
    SELECT o_custkey AS custkey, o_orderkey AS orderkey FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
),
per_cust AS (
    SELECT lo.custkey, min(t.rnk) AS minrank
    FROM last_order lo
    JOIN lineitem l ON l.l_orderkey = lo.orderkey
    LEFT JOIN top20 t ON t.partkey = l.l_partkey
    GROUP BY lo.custkey
),
s AS (
    SELECT count(*) AS n,
           sum(CASE WHEN minrank IS NOT NULL THEN 1 ELSE 0 END) AS hits,
           sum(CASE WHEN minrank IS NOT NULL
                    THEN 232792560 // minrank ELSE 0 END) AS rr_scaled
    FROM per_cust
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(hits AS BIGINT) AS hit_customers,
       CAST(rr_scaled AS BIGINT) AS rr_scaled_sum,
       CAST(floor(CAST(rr_scaled AS DOUBLE) * 1000000000
                  / (232792560.0 * CAST(n AS DOUBLE))) AS BIGINT)
           AS mrr_ppb
FROM s WHERE n > 0
""",
)
def q_popularity_mrr(spark, sf_dir):
    # Mean reciprocal rank of the global-popularity top-20 ranker,
    # evaluated against each customer's LAST order (the standard offline
    # recommender eval: would the static bestseller shelf have contained
    # what they actually bought next?).  The candidate list is a 20-row
    # TakeOrderedAndProject broadcast; the holdout is one per-customer
    # window (bounded by orders-per-customer); reciprocal ranks carry as
    # EXACT integers via the lcm(1..20) = 232792560 trick, so the sum is
    # order-independent, and the final MRR renders as a floor-scaled ppb
    # off one IEEE division.
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pop = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.countDistinct("l_orderkey").alias("cnt")
    )
    top20 = (
        pop.orderBy(F.desc("cnt"), F.asc("partkey"))
        .limit(20)
        .select(
            "partkey",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("partkey")))
            .alias("rnk"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
    )
    last_order = (
        od.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            rn.alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    per_cust = (
        last_order.join(
            li.select("l_orderkey", "l_partkey"),
            F.col("l_orderkey") == F.col("orderkey"),
        )
        .join(
            F.broadcast(top20),
            F.col("partkey") == F.col("l_partkey"),
            "left",
        )
        .groupBy("custkey")
        .agg(F.min("rnk").alias("minrank"))
    )
    s = per_cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("minrank").isNotNull(), 1).otherwise(0)
        ).alias("hits"),
        F.sum(
            F.when(
                F.col("minrank").isNotNull(),
                F.expr("232792560 DIV minrank"),
            ).otherwise(F.lit(0))
        ).alias("rr_scaled"),
    )
    return s.filter(F.col("n") > 0).select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("hits").cast("bigint").alias("hit_customers"),
        F.col("rr_scaled").cast("bigint").alias("rr_scaled_sum"),
        F.floor(
            F.col("rr_scaled").cast("double")
            * 1000000000
            / (F.lit(232792560.0) * F.col("n").cast("double"))
        )
        .cast("bigint")
        .alias("mrr_ppb"),
    )


@register(
    "q_clustering_coeff",
    f"""
WITH {_TOK_CTE}, {_SIGS_SQL},
{_CAND_CTES},
tri AS (
    SELECT e1.a_id AS x, e1.b_id AS y, e2.b_id AS z
    FROM cand e1
    JOIN cand e2 ON e2.a_id = e1.b_id
    JOIN cand e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
),
pv AS (
    SELECT doc_id, count(*) AS n_tri
    FROM (
        SELECT x AS doc_id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ) GROUP BY doc_id
),
deg AS (
    SELECT doc_id, count(*) AS d
    FROM (
        SELECT a_id AS doc_id FROM cand
        UNION ALL SELECT b_id FROM cand
    ) GROUP BY doc_id
),
cc AS (
    SELECT deg.doc_id,
           (2 * coalesce(pv.n_tri, 0) * 1000000000) // (d * (d - 1))
               AS cc_ppb
    FROM deg LEFT JOIN pv ON pv.doc_id = deg.doc_id
    WHERE d >= 2
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(cc_ppb) AS BIGINT) // count(*) AS avg_cc_ppb,
       CAST(max(cc_ppb) AS BIGINT) AS max_cc_ppb,
       CAST(sum(CASE WHEN cc_ppb = 1000000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_closed
FROM cc
""",
)
def q_clustering_coeff(spark, sf_dir):
    # Local clustering coefficient over the LSH similarity graph — the
    # cluster-SHAPE audit the triangle census (q_triangle_count) summarizes
    # globally: per node, 2*T(v) / (deg(v)*(deg(v)-1)) says whether its
    # neighborhood is a clique (template/boilerplate family, cc→1) or a
    # star/chain (transitive near-dup drift, cc→0) — the signal that
    # decides whether a dedup cluster can take a single representative.
    # Same ordered two-hop triangle enumeration (each triangle found
    # exactly once), degrees off one edge-list rollup; the coefficient
    # carries as an EXACT ppb integer (2*T*1e9 DIV d*(d-1)), so the node
    # average is integer arithmetic end to end.  Scale: two self-joins of
    # the LSH-bounded edge list + two combinable rollups.
    from opc2mongodb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = _t(spark, sf_dir, "documents")
    cand = (
        lsh_candidate_pairs(minhash_signatures(d, "doc_id", "text"), "doc_id")
        .filter(F.col("est_jaccard") >= 0.5)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    e1 = cand.select(F.col("a_id").alias("x"), F.col("b_id").alias("y"))
    e2 = cand.select(F.col("a_id").alias("y"), F.col("b_id").alias("z"))
    e3 = cand.select(F.col("a_id").alias("x"), F.col("b_id").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    # One execution of the triangle join, not three: a union of three
    # selects over `tri` re-executes the two-hop join per branch (Spark
    # shares no common subtrees across union arms — measured 13.7 s vs
    # 7.6 s for this subplan at sf0.1). explode(array(x,y,z)) emits the
    # same corner multiset from a single pass, and the per-doc count is
    # map-side combinable before the exchange.
    corners = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        cand.select(F.col("a_id").alias("doc_id"))
        .unionAll(cand.select(F.col("b_id").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    cc = (
        deg.filter(F.col("d") >= 2)
        .join(corners, "doc_id", "left")
        .select(
            F.expr(
                "(2 * coalesce(n_tri, 0) * 1000000000) DIV (d * (d - 1))"
            ).alias("cc_ppb")
        )
    )
    return cc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.expr("CAST(sum(cc_ppb) AS BIGINT) DIV count(*)").alias(
            "avg_cc_ppb"
        ),
        F.max("cc_ppb").cast("bigint").alias("max_cc_ppb"),
        F.sum(F.when(F.col("cc_ppb") == 1000000000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_closed"),
    )


@register(
    "q_xcorr_lagged",
    """
WITH hourly AS (
    SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
               AS h,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
    FROM events GROUP BY 1
),
lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
j AS (
    SELECT l.lag, x.ca AS a, y.cb AS b
    FROM hourly x
    CROSS JOIN lags l
    JOIN hourly y ON y.h = x.h + l.lag
),
m AS (
    SELECT lag, count(*) AS n,
           CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
           CAST(sum(a * b) AS BIGINT) AS sab,
           CAST(sum(a * a) AS BIGINT) AS saa,
           CAST(sum(b * b) AS BIGINT) AS sbb
    FROM j GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag_hours, CAST(n AS BIGINT) AS n_hours,
       printf('%.9e',
              (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
              / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))))
           AS xcorr
FROM m
WHERE n * saa > sa * sa AND n * sbb > sb * sb
""",
)
def q_xcorr_lagged(spark, sf_dir):
    # Lead/lag cross-correlation between the click and purchase hourly
    # series at lags -3..+3h — does click volume LEAD purchases (demand
    # precursor) or trail them?  The fact table folds ONCE into an hourly
    # two-channel spine (|hours| rows, integer counts); the seven lag
    # alignments are spine-vs-spine joins on the shifted hour index, so
    # after the single full-data rollup everything is hour-cardinality-
    # bounded.  All moment sums are integer-exact; the Pearson chain per
    # lag runs in IEEE doubles and renders %.9e.
    ev = _t(spark, sf_dir, "events")
    hidx = (
        F.unix_micros(F.date_trunc("hour", F.col("ts")).cast("timestamp"))
        / F.lit(3600000000)
    ).cast("bigint")
    hourly = ev.groupBy(hidx.alias("h")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("cb"),
    )
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    x = hourly.select("h", "ca")
    y = hourly.select(F.col("h").alias("hy"), "cb")
    j = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.col("hy") == F.col("h") + F.col("lag"))
        .select("lag", F.col("ca").alias("a"), F.col("cb").alias("b"))
    )
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sab").cast("double") - F.col("sa").cast(
        "double"
    ) * F.col("sb").cast("double")
    vx = nd * F.col("saa").cast("double") - F.col("sa").cast(
        "double"
    ) * F.col("sa").cast("double")
    vy = nd * F.col("sbb").cast("double") - F.col("sb").cast(
        "double"
    ) * F.col("sb").cast("double")
    return m.filter(
        (F.col("n") * F.col("saa") > F.col("sa") * F.col("sa"))
        & (F.col("n") * F.col("sbb") > F.col("sb") * F.col("sb"))
    ).select(
        F.col("lag").cast("bigint").alias("lag_hours"),
        F.col("n").cast("bigint").alias("n_hours"),
        sci9(num / F.sqrt(vx * vy)).alias("xcorr"),
    )


@register(
    "q_cohens_kappa",
    """
WITH r AS (
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
           CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS b
    FROM documents
),
s AS (
    SELECT count(*) AS n,
           sum(a * b) AS n11,
           sum((1 - a) * (1 - b)) AS n00,
           sum(a) AS a1, sum(b) AS b1
    FROM r
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n11 AS BIGINT) AS both_yes,
       CAST(n00 AS BIGINT) AS both_no,
       CAST(n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1))
            AS BIGINT) AS kappa_num,
       CAST(n * n - (a1 * b1 + (n - a1) * (n - b1))
            AS BIGINT) AS kappa_den,
       printf('%.9e',
              CAST(n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1))
                   AS DOUBLE)
              / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1))
                     AS DOUBLE)) AS kappa
FROM s
WHERE n * n > a1 * b1 + (n - a1) * (n - b1)
""",
)
def q_cohens_kappa(spark, sf_dir):
    # Cohen's kappa between two independent labeling heuristics on the
    # corpus (language-ID says English vs the length heuristic says
    # substantive) — the chance-corrected agreement score that tells a
    # labeling pipeline whether two cheap raters measure the SAME thing
    # or can be ensembled.  One combinable scan builds the 2x2
    # contingency; kappa's numerator and denominator carry as EXACT
    # integers (emitted for audit) so the only float op is the final
    # division.  Scales: single map-side-combinable aggregate, no
    # shuffle beyond the 1-row fold.
    d = _t(spark, sf_dir, "documents")
    r = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
        F.when(F.col("n_chars") >= 500, 1).otherwise(0).alias("b"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
        F.sum("a").alias("a1"),
        F.sum("b").alias("b1"),
    )
    pe_sum = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    num = F.col("n") * (F.col("n11") + F.col("n00")) - pe_sum
    den = F.col("n") * F.col("n") - pe_sum
    return s.filter(den > 0).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("n11").cast("bigint").alias("both_yes"),
        F.col("n00").cast("bigint").alias("both_no"),
        num.cast("bigint").alias("kappa_num"),
        den.cast("bigint").alias("kappa_den"),
        sci9(num.cast("double") / den.cast("double")).alias("kappa"),
    )


@register(
    "q_evalue_drift",
    """
WITH daily AS (
    SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
               AS d,
           event_type, count(*) AS x
    FROM events GROUP BY 1, 2
),
totals AS (SELECT d, CAST(sum(x) AS BIGINT) AS n FROM daily GROUP BY d),
cum AS (
    SELECT dy.event_type, dy.d,
           CAST(sum(dy.x) OVER w AS BIGINT) AS xc,
           CAST(sum(t.n) OVER w AS BIGINT) AS nc
    FROM daily dy JOIN totals t ON t.d = dy.d
    WINDOW w AS (PARTITION BY dy.event_type ORDER BY dy.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
lne AS (
    SELECT event_type, d,
           CAST(xc AS DOUBLE) * 0.4054651081081644
           + CAST(nc - xc AS DOUBLE) * -0.18232155679395462 AS lne
    FROM cum
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       printf('%.9e', max(lne)) AS max_lne,
       CAST(min(CASE WHEN lne > 2.995732273553991 THEN d END)
            AS BIGINT) AS first_alarm_day
FROM lne GROUP BY event_type
""",
)
def q_evalue_drift(spark, sf_dir):
    # Anytime-valid share monitoring via a betting e-process — the
    # modern replacement for fixed-horizon tests when a monitor peeks
    # every day: each series bets its cumulative daily-traffic share
    # against H0 "share <= 1/4" at the simple alternative 3/8; the log
    # e-value ln E_t = X_t*ln(3/2) + (N_t - X_t)*ln(5/6) crosses ln(20)
    # with probability <= 1/20 under H0 AT ANY STOPPING TIME (Ville's
    # inequality) — no multiple-peeking correction ever needed.  The two
    # log-likelihood-ratio coefficients are UNIVERSAL constants embedded
    # as identical literals on both engines (a data-adaptive baseline
    # would put a per-type ln on the cross-engine path — measured 1-ulp
    # libm divergence, so the adaptive variant would need agreed rational
    # quantization); X_t/N_t are exact integer window sums over the
    # |days|-per-type spine, so the whole chain to the final %.9e is one
    # deterministic double expression per spine row.  One daily rollup is
    # the only full-data pass.
    ev = _t(spark, sf_dir, "events")
    didx = (
        F.unix_micros(F.date_trunc("day", F.col("ts")).cast("timestamp"))
        / F.lit(86400000000)
    ).cast("bigint")
    daily = ev.groupBy(didx.alias("d"), "event_type").agg(
        F.count(F.lit(1)).alias("x")
    )
    totals = daily.groupBy("d").agg(F.sum("x").cast("bigint").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        daily.join(totals, "d")
        .select(
            "event_type",
            "d",
            F.sum("x").over(w).cast("bigint").alias("xc"),
            F.sum("n").over(w).cast("bigint").alias("nc"),
        )
    )
    lne = cum.select(
        "event_type",
        "d",
        (
            F.col("xc").cast("double") * F.lit(0.4054651081081644)
            + (F.col("nc") - F.col("xc")).cast("double")
            * F.lit(-0.18232155679395462)
        ).alias("lne"),
    )
    return lne.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        sci9(F.max("lne")).alias("max_lne"),
        F.min(F.when(F.col("lne") > 2.995732273553991, F.col("d")))
        .cast("bigint")
        .alias("first_alarm_day"),
    )


@register(
    "q_conformal_interval",
    """
WITH base AS (
    SELECT event_type, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS xs,
           CASE WHEN CAST('0x' || substring(
                    md5(CAST(event_id AS VARCHAR) || '|conf'), 1, 13)
                    AS BIGINT) < 2251799813685248
                THEN 1 ELSE 0 END AS is_cal
    FROM events WHERE value IS NOT NULL
),
pred AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
           CAST(sum(xs) AS BIGINT) // count(*) AS pred_micro
    FROM base WHERE is_cal = 1 GROUP BY event_type
),
resid AS (
    SELECT b.event_type, b.event_id, abs(b.xs - p.pred_micro) AS r
    FROM base b JOIN pred p USING (event_type) WHERE b.is_cal = 1
),
qhat AS (
    SELECT event_type, r AS qhat_micro FROM (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY r, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM resid)
    WHERE rn = least(n, (19 * (n + 1) + 19) // 20)
),
ev AS (
    SELECT b.event_type,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN abs(b.xs - p.pred_micro) <= q.qhat_micro
                         THEN 1 ELSE 0 END) AS BIGINT) AS covered
    FROM base b
    JOIN pred p USING (event_type)
    JOIN qhat q USING (event_type)
    WHERE b.is_cal = 0
    GROUP BY b.event_type
)
SELECT p.event_type, p.n_cal, e.n_eval, p.pred_micro,
       CAST(q.qhat_micro AS BIGINT) AS qhat_micro,
       e.covered * 1000000000 // e.n_eval AS coverage_ppb
FROM pred p JOIN qhat q USING (event_type) JOIN ev e USING (event_type)
""",
)
def q_conformal_interval(spark, sf_dir):
    # Split-conformal prediction intervals per series — the
    # distribution-free deployment guarantee: calibrate |y - yhat| on an
    # md5-deterministic half, take the ceil(0.95*(n+1))-th residual as
    # the interval half-width, and coverage on the held-out half is
    # >= 95% REGARDLESS of the value distribution.  Values floor-scale
    # to exact micro-integers so residuals, the conformal rank, and
    # coverage are integer arithmetic end to end; the residual quantile
    # comes from the shared histogram rank-selection
    # (operators/histogram.py — never a single-task global sort; the
    # ORACLE keeps the naive window form, cross-validating the
    # decomposition per the established discipline).
    from opc2mongodb_spark.operators.histogram import rank_select

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("xs"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"),
                            F.lit("|conf"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("bigint")
            < 2251799813685248,
            1,
        )
        .otherwise(0)
        .alias("is_cal"),
    )
    cal = base.filter(F.col("is_cal") == 1)
    pred = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        F.expr("CAST(sum(xs) AS BIGINT) DIV count(*)").alias("pred_micro"),
    )
    resid = cal.join(F.broadcast(pred), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("xs") - F.col("pred_micro")).alias("r"),
    )
    qhat = rank_select(
        resid,
        "r",
        [lambda n: F.least(n, (19 * (n + 1) + 19).cast("bigint") / 20)],
        group_cols=["event_type"],
        tiebreak_cols=["event_id"],
    ).select("event_type", F.col("r").alias("qhat_micro"))
    eva = (
        base.filter(F.col("is_cal") == 0)
        .join(F.broadcast(pred), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(
                F.when(
                    F.abs(F.col("xs") - F.col("pred_micro"))
                    <= F.col("qhat_micro"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        pred.join(qhat, "event_type")
        .join(eva, "event_type")
        .select(
            "event_type",
            "n_cal",
            "n_eval",
            "pred_micro",
            F.col("qhat_micro").cast("bigint").alias("qhat_micro"),
            F.expr("covered * 1000000000 DIV n_eval").alias(
                "coverage_ppb"
            ),
        )
    )


@register(
    "q_cem_att",
    """
WITH per_user AS (
    SELECT user_id,
           CASE WHEN CAST('0x' || substring(
                    md5(CAST(user_id AS VARCHAR) || '|cem'), 1, 13)
                    AS BIGINT) < 2251799813685248
                THEN 1 ELSE 0 END AS t,
           least(count(*) // 10, 9) AS activity_bucket,
           least(count(DISTINCT CAST(ts AS DATE)) // 5, 5)
               AS days_bucket,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
    FROM events GROUP BY user_id
),
strata AS (
    SELECT activity_bucket, days_bucket,
           sum(t) AS n_t, sum(1 - t) AS n_c,
           sum(t * y) AS y_t, sum((1 - t) * y) AS y_c
    FROM per_user GROUP BY activity_bucket, days_bucket
),
matched AS (
    SELECT *,
           CAST(CAST(y_t AS DOUBLE)
                - CAST(n_t AS DOUBLE) * CAST(y_c AS DOUBLE)
                  / CAST(n_c AS DOUBLE)
                AS DECIMAL(28,9)) AS term
    FROM strata WHERE n_t > 0 AND n_c > 0
),
naive AS (
    SELECT CAST(sum(t * y) AS DOUBLE) / CAST(sum(t) AS DOUBLE)
           - CAST(sum((1 - t) * y) AS DOUBLE)
             / CAST(sum(1 - t) AS DOUBLE) AS naive_diff
    FROM per_user
)
SELECT CAST(count(*) AS BIGINT) AS n_strata_matched,
       CAST(sum(n_t) AS BIGINT) AS n_treated_matched,
       printf('%.9e',
              CAST(sum(term) AS DOUBLE) / CAST(sum(n_t) AS DOUBLE))
           AS att,
       printf('%.9e', max(nv.naive_diff)) AS naive_diff
FROM matched CROSS JOIN naive nv
""",
)
def q_cem_att(spark, sf_dir):
    # Coarsened exact matching ATT — the causal-inference workhorse when
    # treatment isn't randomized: users are stratified on COARSENED
    # covariates (activity and active-days buckets, integer bucketing on
    # both engines), treated and control outcomes compare only WITHIN
    # strata containing both, and the effect is the treated-weighted
    # stratum mean difference.  The md5 bit stands in for the treatment
    # flag (deterministic twin of a real assignment column).  One user
    # rollup, one |strata| rollup (<= 60 cells); each stratum's
    # y_t - n_t*y_c/n_c term is computed from exact integers in IEEE
    # doubles and re-pinned to decimal BEFORE the cross-stratum sum (the
    # standing partial-aggregation-order discipline), so the final ATT is
    # one deterministic division.  The unmatched naive difference is
    # emitted alongside — the selection-bias gap IS the finding.
    ev = _t(spark, sf_dir, "events")
    t = (
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"), F.lit("|cem")
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("bigint")
            < 2251799813685248,
            1,
        ).otherwise(0)
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(t).alias("t"),
        F.least(
            F.expr("count(*) DIV 10"), F.lit(9).cast("bigint")
        ).alias("activity_bucket"),
        F.least(
            F.expr("count(DISTINCT CAST(ts AS DATE)) DIV 5"),
            F.lit(5).cast("bigint"),
        ).alias("days_bucket"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    strata = per_user.groupBy("activity_bucket", "days_bucket").agg(
        F.sum("t").alias("n_t"),
        F.sum(1 - F.col("t")).alias("n_c"),
        F.sum(F.col("t") * F.col("y")).alias("y_t"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("y_c"),
    )
    matched = strata.filter(
        (F.col("n_t") > 0) & (F.col("n_c") > 0)
    ).withColumn(
        "term",
        (
            F.col("y_t").cast("double")
            - F.col("n_t").cast("double")
            * F.col("y_c").cast("double")
            / F.col("n_c").cast("double")
        ).cast("decimal(28,9)"),
    )
    naive = per_user.agg(
        (
            F.sum(F.col("t") * F.col("y")).cast("double")
            / F.sum("t").cast("double")
            - F.sum((1 - F.col("t")) * F.col("y")).cast("double")
            / F.sum(1 - F.col("t")).cast("double")
        ).alias("naive_diff")
    )
    return matched.crossJoin(F.broadcast(naive)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata_matched"),
        F.sum("n_t").cast("bigint").alias("n_treated_matched"),
        sci9(F.sum("term").cast("double") / F.sum("n_t").cast("double")).alias("att"),
        sci9(F.max("naive_diff")).alias("naive_diff"),
    )


@register(
    "q_embedding_outliers",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
comp AS (
    SELECT label, t.d AS dim,
           CAST(sum(CAST(v[t.d] AS DECIMAL(28,12))) AS DOUBLE) / count(*)
               AS m
    FROM e, range(1, 65) t(d)
    GROUP BY 1, 2
),
cent AS (
    SELECT label, list(m ORDER BY dim) AS mvec FROM comp GROUP BY label
),
dist AS (
    SELECT e.vec_id, e.label,
           sqrt(greatest(
               list_dot_product(e.v, e.v)
               - 2 * list_dot_product(e.v, c.mvec)
               + list_dot_product(c.mvec, c.mvec), 0.0)) AS d
    FROM e JOIN cent c USING (label)
),
s AS (
    SELECT label, count(*) AS n,
           CAST(sum(CAST(d AS DECIMAL(28,12))) AS DOUBLE) AS sd,
           CAST(sum(CAST(d * d AS DECIMAL(28,12))) AS DOUBLE) AS sdd
    FROM dist GROUP BY label
)
SELECT s.label, CAST(s.n AS BIGINT) AS n_vecs,
       printf('%.9e', s.sd / s.n) AS mean_dist,
       CAST(sum(CASE WHEN dist.d > s.sd / s.n
                + 3 * sqrt(greatest(s.sdd / s.n
                           - (s.sd / s.n) * (s.sd / s.n), 0.0))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       printf('%.9e', max(dist.d)) AS max_dist
FROM dist JOIN s USING (label)
GROUP BY s.label, s.n, s.sd, s.sdd
""",
)
def q_embedding_outliers(spark, sf_dir):
    # Per-label embedding outlier census — the mislabeled-vector /
    # corrupted-row screen an embedding pipeline runs before training:
    # distance of every vector to its LABEL CENTROID, flagged when
    # beyond mean + 3 sigma of the label's own distance distribution.
    # Centroids come from one per-(label, dim) decimal-pinned rollup
    # (posexplode is 64x map work folding to |labels|x64 cells) and are
    # reassembled into ordered arrays (array_sort on (dim, m) structs,
    # engine-deterministic); distances expand |v - m|^2 into three
    # index-order dot folds (bit-identical to DuckDB list_dot_product,
    # the q_embedding_norms discipline) clamped at 0 against FP
    # cancellation; the moment pass pins each distance to decimal before
    # the label sums.  Scale: two map-side passes over the vectors plus
    # label-bounded broadcasts — no shuffle carries a raw embedding.
    from opc2mongodb_spark.functions.vectors import dot

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    comp = (
        e.select("label", F.posexplode("v").alias("dim0", "x"))
        .groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    cent = comp.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
        ).alias("mvec")
    )
    vv = dot(F.col("v"), F.col("v"))
    vm = dot(F.col("v"), F.col("mvec"))
    mm = dot(F.col("mvec"), F.col("mvec"))
    dist = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.sqrt(F.greatest(vv - 2 * vm + mm, F.lit(0.0))).alias("d"),
    )
    s = dist.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d").cast("decimal(28,12)")).cast("double").alias("sd"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(28,12)"))
        .cast("double")
        .alias("sdd"),
    )
    mean = F.col("sd") / F.col("n")
    sig = F.sqrt(
        F.greatest(F.col("sdd") / F.col("n") - mean * mean, F.lit(0.0))
    )
    return (
        dist.join(F.broadcast(s), "label")
        .groupBy("label", "n", "sd", "sdd")
        .agg(
            F.sum(
                F.when(F.col("d") > mean + 3 * sig, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.max("d").alias("maxd"),
        )
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vecs"),
            sci9(mean).alias("mean_dist"),
            "n_outliers",
            sci9(F.col("maxd")).alias("max_dist"),
        )
    )


@register(
    "q_uplift_qini",
    """
WITH per_user AS (
    SELECT user_id,
           CASE WHEN CAST('0x' || substring(
                    md5(CAST(user_id AS VARCHAR) || '|cem'), 1, 13)
                    AS BIGINT) < 2251799813685248
                THEN 1 ELSE 0 END AS t,
           count(*) AS score,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
    FROM events GROUP BY user_id
),
tt AS (SELECT count(*) AS n FROM per_user),
ranked AS (
    SELECT score, row_number() OVER (ORDER BY score, user_id) AS i
    FROM per_user
),
edges AS (
    SELECT score AS e
    FROM ranked, tt
    WHERE i IN (SELECT CAST(ceil(k * t2.n / 10.0) AS BIGINT)
                FROM generate_series(1, 9) AS g(k), tt AS t2)
),
binned AS (
    SELECT 1 + (SELECT count(*) FROM edges WHERE e < p.score) AS bin,
           t, y
    FROM per_user p
),
per_bin AS (
    SELECT bin,
           CAST(sum(t) AS BIGINT) AS n_t,
           CAST(sum(1 - t) AS BIGINT) AS n_c,
           CAST(sum(t * y) AS BIGINT) AS y_t,
           CAST(sum((1 - t) * y) AS BIGINT) AS y_c
    FROM binned GROUP BY bin
),
cum AS (
    SELECT bin, n_t, n_c, y_t, y_c,
           sum(n_t) OVER w AS nt_cum, sum(n_c) OVER w AS nc_cum,
           sum(y_t) OVER w AS yt_cum, sum(y_c) OVER w AS yc_cum
    FROM per_bin
    WINDOW w AS (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(bin AS BIGINT) AS bin, n_t, n_c, y_t, y_c,
       printf('%.9e',
              CAST(yt_cum AS DOUBLE)
              - CAST(yc_cum AS DOUBLE) * CAST(nt_cum AS DOUBLE)
                / CAST(nc_cum AS DOUBLE)) AS qini_cum
FROM cum WHERE nc_cum > 0
""",
)
def q_uplift_qini(spark, sf_dir):
    # Qini uplift curve — the causal-ML evaluation of a targeting score:
    # rank users by activity score, walk from the most-targeted decile
    # down, and at each cut compare cumulative treated conversions
    # against the control conversions scaled to the treated population
    # (Qini(k) = Yt - Yc * Nt/Nc).  Positive early deciles mean the
    # score finds persuadable users; the md5 bit is the deterministic
    # treatment twin (q_cem_att's discipline).  The nine score decile
    # edges are rank-selected through the shared histogram operator
    # (naive-window oracle cross-validates, the q_psi_drift discipline);
    # users bucket by counting the BROADCAST edge multiset below their
    # score (value-based, tie-stable); everything after runs on a 10-row
    # spine with integer-exact counts, one %.9e per cut.
    from opc2mongodb_spark.operators.histogram import (
        decile_ranks,
        rank_select,
    )

    ev = _t(spark, sf_dir, "events")
    t = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("user_id").cast("string"), F.lit("|cem"))
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        < 2251799813685248,
        1,
    ).otherwise(0)
    per_user = ev.groupBy("user_id").agg(
        F.max(t).alias("t"),
        F.count(F.lit(1)).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    edges = rank_select(
        per_user,
        "score",
        decile_ranks(),
        tiebreak_cols=["user_id"],
    )
    earr = edges.agg(
        F.array_sort(F.collect_list("score")).alias("earr")
    )
    binned = per_user.crossJoin(F.broadcast(earr)).select(
        (
            1
            + F.size(
                F.filter("earr", lambda x: x < F.col("score"))
            ).cast("bigint")
        ).alias("bin"),
        "t",
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("t").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("t")).cast("bigint").alias("n_c"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("y_t"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("bigint").alias("y_c"),
    )
    w = (
        Window.orderBy(F.desc("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_bin.select(
        "bin",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        F.sum("n_t").over(w).alias("nt_cum"),
        F.sum("n_c").over(w).alias("nc_cum"),
        F.sum("y_t").over(w).alias("yt_cum"),
        F.sum("y_c").over(w).alias("yc_cum"),
    )
    return cum.filter(F.col("nc_cum") > 0).select(
        F.col("bin").cast("bigint").alias("bin"),
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        sci9(F.col("yt_cum").cast("double")
            - F.col("yc_cum").cast("double")
            * F.col("nt_cum").cast("double")
            / F.col("nc_cum").cast("double")).alias("qini_cum"),
    )


@register(
    "q_mann_whitney",
    """
WITH v AS (
    SELECT CAST(floor(value * 1000000) AS BIGINT) AS x,
           CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
    FROM events
    WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
ranked AS (
    SELECT a,
           2 * rank() OVER (ORDER BY x)
           + count(*) OVER (PARTITION BY x) - 1 AS r2
    FROM v
),
nn AS (
    SELECT CAST(sum(a) AS BIGINT) AS n1,
           CAST(sum(1 - a) AS BIGINT) AS n2
    FROM v
),
ties AS (
    SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DOUBLE)
               AS tsum
    FROM (SELECT count(*) AS t FROM v GROUP BY x)
),
u AS (
    SELECT CAST(sum(CASE WHEN a = 1 THEN r2 ELSE 0 END)
                AS BIGINT) AS sr2a
    FROM ranked
)
SELECT nn.n1, nn.n2,
       CAST(u.sr2a - nn.n1 * (nn.n1 + 1) AS BIGINT) AS u2,
       printf('%.9e',
              (CAST(u.sr2a - nn.n1 * (nn.n1 + 1) AS DOUBLE) / 2.0
               - CAST(nn.n1 AS DOUBLE) * CAST(nn.n2 AS DOUBLE) / 2.0)
              / sqrt(CAST(nn.n1 AS DOUBLE) * CAST(nn.n2 AS DOUBLE) / 12.0
                     * (CAST(nn.n1 + nn.n2 + 1 AS DOUBLE)
                        - ties.tsum
                          / (CAST(nn.n1 + nn.n2 AS DOUBLE)
                             * CAST(nn.n1 + nn.n2 - 1 AS DOUBLE)))))
           AS z
FROM u, nn, ties
WHERE nn.n1 > 0 AND nn.n2 > 0 AND nn.n1 + nn.n2 > 1
""",
)
def q_mann_whitney(spark, sf_dir):
    # Mann-Whitney U (Wilcoxon rank-sum) between the click and view
    # value distributions — the nonparametric two-sample test that
    # doesn't care about the heavy tails q_hill_tail_index found.  The
    # naive form is a GLOBAL average-rank window; here the rank sum
    # decomposes through the 1024-cell histogram discipline: values
    # quantize to exact micro-integers, fold to a VALUE-FREQUENCY SPINE
    # (one parallel groupBy), each spine row gets an equi-width cell off
    # a 1-row stats broadcast, and "how many B-values sit below x"
    # composes a <=1024-row cross-cell cumulative with a WITHIN-CELL
    # window PARTITIONED BY cell — no single-task pass ever touches a
    # data-sized frame.  2U and the tie-correction sum carry as exact
    # integers (t^3 pinned to decimal against overflow); the z chain is
    # IEEE doubles under %.9e.  The ORACLE keeps the independent
    # average-rank-window derivation, cross-validating the decomposition.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "view")
    )
    v = ev.select(
        F.floor(F.col("value") * 1000000).cast("bigint").alias("x"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
    )
    spine = v.groupBy("x").agg(
        F.sum("a").alias("ca"),
        F.sum(1 - F.col("a")).alias("cb"),
        F.count(F.lit(1)).alias("t"),
    )
    stats = spine.agg(
        F.min("x").alias("__mn"),
        F.max("x").alias("__mx"),
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("double")
        .alias("tsum"),
    )
    width = (
        (F.col("__mx") - F.col("__mn")).cast("double") / F.lit(1024.0)
    )
    celled = spine.crossJoin(F.broadcast(stats)).select(
        "x",
        "ca",
        "cb",
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("x") - F.col("__mn")).cast("double") / width
                ),
                F.lit(1023),
            )
        )
        .cast("bigint")
        .alias("__cell"),
    )
    cellagg = celled.groupBy("__cell").agg(
        F.sum("cb").cast("bigint").alias("cellb")
    )
    wcell = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cellcum = cellagg.select(
        "__cell",
        F.coalesce(F.sum("cellb").over(wcell), F.lit(0)).alias(
            "b_before_cell"
        ),
    )
    win = (
        Window.partitionBy("__cell")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    below = (
        celled.join(F.broadcast(cellcum), "__cell")
        .select(
            "ca",
            "cb",
            (
                F.col("b_before_cell")
                + F.coalesce(F.sum("cb").over(win), F.lit(0))
            ).alias("b_below"),
        )
    )
    # 2U_A = sum over values of ca * (2*b_below + cb); the +cb term is
    # the half-credit for ties, doubled to stay integer
    u2 = below.agg(
        F.sum(
            F.col("ca") * (2 * F.col("b_below") + F.col("cb"))
        )
        .cast("bigint")
        .alias("u2")
    )
    out = u2.crossJoin(F.broadcast(stats))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    z = (
        F.col("u2").cast("double") / 2.0 - n1d * n2d / 2.0
    ) / F.sqrt(
        n1d
        * n2d
        / 12.0
        * ((nd + 1) - F.col("tsum") / (nd * (nd - 1)))
    )
    return out.filter(
        (F.col("n1") > 0)
        & (F.col("n2") > 0)
        & (F.col("n1") + F.col("n2") > 1)
    ).select(
        "n1",
        "n2",
        "u2",
        sci9(z).alias("z"),
    )


@register(
    "q_jackknife_ratio_se",
    """
WITH daily AS (
    SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
               AS d,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
               AS y,
           count(*) AS n
    FROM events WHERE value IS NOT NULL GROUP BY 1
),
tot AS (
    SELECT CAST(sum(y) AS BIGINT) AS sy, CAST(sum(n) AS BIGINT) AS sn,
           CAST(count(*) AS BIGINT) AS g
    FROM daily
),
theta AS (
    SELECT CAST(t.sy - dy.y AS DOUBLE) / CAST(t.sn - dy.n AS DOUBLE)
               AS th,
           t.g, t.sy, t.sn
    FROM daily dy CROSS JOIN tot t
    WHERE t.sn > dy.n
),
tbar AS (
    SELECT CAST(sum(CAST(th AS DECIMAL(28,12))) AS DOUBLE)
           / count(*) AS tb,
           CAST(count(*) AS BIGINT) AS g2
    FROM theta
),
dev AS (
    SELECT CAST(sum(CAST((th - tb.tb) * (th - tb.tb) AS DECIMAL(38,12))
                   ) AS DOUBLE) AS ssq,
           max(tb.g2) AS g
    FROM theta, tbar tb
)
SELECT t.g AS n_days,
       printf('%.9e', CAST(t.sy AS DOUBLE) / CAST(t.sn AS DOUBLE))
           AS theta_hat,
       printf('%.9e',
              sqrt(CAST(d.g - 1 AS DOUBLE) / CAST(d.g AS DOUBLE)
                   * d.ssq)) AS se_jack
FROM tot t, dev d
WHERE t.g >= 2
""",
)
def q_jackknife_ratio_se(spark, sf_dir):
    # Delete-one-day jackknife standard error for the ratio-of-sums
    # metric (mean value per event) — the variance estimator that
    # respects DAY-level correlation, complementing q_poisson_bootstrap
    # (row-level resampling) and q_ratio_metric_delta (the closed-form
    # delta method): each leave-one-out replicate is pure ALGEBRA on the
    # day spine ((S_y - y_i)/(S_n - n_i) from exact micro-integer
    # totals), so the whole estimator costs one daily rollup plus two
    # passes over the <=|days| spine with 1-row broadcasts.  Replicate
    # means and squared deviations are decimal-pinned before their
    # spine sums (partial-aggregation order discipline); the final
    # sqrt renders %.9e.
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    didx = (
        F.unix_micros(F.date_trunc("day", F.col("ts")).cast("timestamp"))
        / F.lit(86400000000)
    ).cast("bigint")
    daily = ev.groupBy(didx.alias("d")).agg(
        F.sum(F.floor(F.col("value") * 1000000).cast("bigint"))
        .cast("bigint")
        .alias("y"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = daily.agg(
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("n").cast("bigint").alias("sn"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    theta = (
        daily.crossJoin(F.broadcast(tot))
        .filter(F.col("sn") > F.col("n"))
        .select(
            (
                (F.col("sy") - F.col("y")).cast("double")
                / (F.col("sn") - F.col("n")).cast("double")
            ).alias("th"),
            "g",
            "sy",
            "sn",
        )
    )
    tbar = theta.agg(
        (
            F.sum(F.col("th").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("tb"),
        F.count(F.lit(1)).cast("bigint").alias("g2"),
    )
    dev = theta.crossJoin(F.broadcast(tbar)).agg(
        F.sum(
            (
                (F.col("th") - F.col("tb"))
                * (F.col("th") - F.col("tb"))
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("ssq"),
        F.max("g2").alias("g"),
    )
    dev = dev.withColumnRenamed("g", "gd")
    return (
        tot.crossJoin(F.broadcast(dev))
        .filter(F.col("g") >= 2)
        .select(
            F.col("g").alias("n_days"),
            sci9(F.col("sy").cast("double") / F.col("sn").cast("double")).alias("theta_hat"),
            sci9(F.sqrt(
                    (F.col("gd") - 1).cast("double")
                    / F.col("gd").cast("double")
                    * F.col("ssq")
                )).alias("se_jack"),
        )
    )


@register(
    "q_pr_curve",
    """
WITH base AS (
    SELECT event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS xs,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
    FROM events WHERE value IS NOT NULL
),
tt AS (SELECT count(*) AS n FROM base),
ranked AS (
    SELECT xs, row_number() OVER (ORDER BY xs, event_id) AS i FROM base
),
thr AS (
    SELECT DISTINCT xs AS thr FROM ranked, tt
    WHERE i IN (SELECT CAST(ceil(k * t2.n / 10.0) AS BIGINT)
                FROM generate_series(1, 9) AS g(k), tt AS t2)
),
cells AS (
    SELECT t.thr,
           CAST(sum(CASE WHEN b.xs >= t.thr THEN b.y ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(sum(CASE WHEN b.xs >= t.thr THEN 1 - b.y ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(sum(CASE WHEN b.xs < t.thr THEN b.y ELSE 0 END)
                AS BIGINT) AS fn
    FROM base b CROSS JOIN thr t
    GROUP BY t.thr
)
SELECT thr AS thr_micro, tp, fp, fn,
       tp * 1000000000 // (tp + fp) AS precision_ppb,
       tp * 1000000000 // (tp + fn) AS recall_ppb,
       2 * tp * 1000000000 // (2 * tp + fp + fn) AS f1_ppb
FROM cells WHERE tp + fp > 0 AND tp + fn > 0
""",
)
def q_pr_curve(spark, sf_dir):
    # Precision/recall/F1 operating points at the nine score deciles —
    # the threshold-picking artifact AUC (q_auc_roc) deliberately
    # integrates away: which cutoff actually ships?  Thresholds are
    # rank-selected through the shared histogram operator (DISTINCT
    # values; the naive-window oracle cross-validates); each row fans
    # out against the <=9-row broadcast threshold frame (bounded map
    # work, combinable rollup, the q_poisson_bootstrap shape), and
    # precision/recall/F1 all carry as EXACT ppb integers
    # (F1 = 2TP/(2TP+FP+FN) — integer by construction, no float ever).
    from opc2mongodb_spark.operators.histogram import (
        decile_ranks,
        rank_select,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_id",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("xs"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "y"
        ),
    )
    thr = (
        rank_select(
            base,
            "xs",
            decile_ranks(),
            tiebreak_cols=["event_id"],
        )
        .select(F.col("xs").alias("thr"))
        .distinct()
    )
    cells = (
        base.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("xs") >= F.col("thr"), F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(F.col("xs") >= F.col("thr"), 1 - F.col("y")).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(F.col("xs") < F.col("thr"), F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
    )
    return cells.filter(
        (F.col("tp") + F.col("fp") > 0) & (F.col("tp") + F.col("fn") > 0)
    ).select(
        F.col("thr").alias("thr_micro"),
        "tp",
        "fp",
        "fn",
        F.expr("tp * 1000000000 DIV (tp + fp)").alias("precision_ppb"),
        F.expr("tp * 1000000000 DIV (tp + fn)").alias("recall_ppb"),
        F.expr("2 * tp * 1000000000 DIV (2 * tp + fp + fn)").alias(
            "f1_ppb"
        ),
    )


@register(
    "q_rolling_backtest",
    """
WITH daily AS (
    SELECT event_type,
           CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
               AS d,
           count(*) AS a
    FROM events GROUP BY 1, 2
),
feat AS (
    SELECT event_type, d, a,
           sum(a) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7,
           count(*) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS k7,
           lag(a) OVER (PARTITION BY event_type ORDER BY d) AS prev
    FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_eval_days,
       CAST(sum(abs(7 * a - s7)) AS BIGINT) // count(*) AS mae_x7,
       CAST(sum(abs(7 * a - 7 * prev)) AS BIGINT) // count(*)
           AS mae_naive_x7,
       printf('%.9e',
              CAST(sum(abs(7 * a - s7)) AS DOUBLE)
              / CAST(sum(abs(7 * a - 7 * prev)) AS DOUBLE))
           AS skill_vs_persistence
FROM feat
WHERE k7 = 7 AND prev IS NOT NULL
GROUP BY event_type
HAVING sum(abs(7 * a - 7 * prev)) > 0
""",
)
def q_rolling_backtest(spark, sf_dir):
    # Rolling-origin forecast backtest — the honest way to score a
    # forecaster: at every day, predict tomorrow from ONLY the trailing
    # week, then average the absolute errors (q_mase_forecast scores one
    # split; this walks every origin).  Forecast = trailing-7-day mean,
    # carried x7 so the error |7a - s7| stays an exact integer (unit:
    # sevenths of an event); the persistence baseline |a_t - a_{t-1}|
    # anchors the skill ratio (the only float, %.9e).  Everything runs
    # as windows over the |days|-per-type spine after one combinable
    # daily rollup.
    ev = _t(spark, sf_dir, "events")
    didx = (
        F.unix_micros(F.date_trunc("day", F.col("ts")).cast("timestamp"))
        / F.lit(86400000000)
    ).cast("bigint")
    daily = ev.groupBy("event_type", didx.alias("d")).agg(
        F.count(F.lit(1)).alias("a")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    )
    w1 = Window.partitionBy("event_type").orderBy("d")
    feat = daily.select(
        "event_type",
        "d",
        "a",
        F.sum("a").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("k7"),
        F.lag("a").over(w1).alias("prev"),
    )
    err = F.abs(7 * F.col("a") - F.col("s7"))
    errn = F.abs(7 * F.col("a") - 7 * F.col("prev"))
    return (
        feat.filter((F.col("k7") == 7) & F.col("prev").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_days"),
            F.expr(
                "CAST(sum(abs(7 * a - s7)) AS BIGINT) DIV count(*)"
            ).alias("mae_x7"),
            F.expr(
                "CAST(sum(abs(7 * a - 7 * prev)) AS BIGINT) DIV count(*)"
            ).alias("mae_naive_x7"),
            sci9(F.sum(err).cast("double") / F.sum(errn).cast("double")).alias("skill_vs_persistence"),
            F.sum(errn).cast("bigint").alias("__errn_sum"),
        )
        .filter(F.col("__errn_sum") > 0)
        .drop("__errn_sum")
    )


@register(
    "q_simpsons_flag",
    """
WITH r AS (
    SELECT p.p_brand AS brand,
           CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS x,
           CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS y
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_brand AS (
    SELECT brand, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy
    FROM r GROUP BY brand
),
signs AS (
    SELECT brand,
           CASE WHEN n * sxy - sx * sy > 0 THEN 1
                WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS s
    FROM per_brand WHERE n >= 2
),
tot AS (
    SELECT CASE WHEN n * sxy - sx * sy > 0 THEN 1
                WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS s_all
    FROM (SELECT CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(sx) AS BIGINT) AS sx,
                 CAST(sum(sy) AS BIGINT) AS sy,
                 CAST(sum(sxy) AS BIGINT) AS sxy
          FROM per_brand)
)
SELECT CAST(t.s_all AS BIGINT) AS overall_sign,
       CAST(count(*) AS BIGINT) AS n_strata,
       CAST(sum(CASE WHEN g.s = -t.s_all AND t.s_all <> 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_opposite,
       CAST(CASE WHEN t.s_all <> 0
                 AND 2 * sum(CASE WHEN g.s = -t.s_all THEN 1 ELSE 0 END)
                     > count(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS paradox
FROM signs g CROSS JOIN tot t
GROUP BY t.s_all
""",
)
def q_simpsons_flag(spark, sf_dir):
    # Simpson's-paradox detector for the discount->quantity association:
    # does the AGGREGATE covariance sign contradict the majority of
    # per-brand signs?  When it does, any dashboard reading the pooled
    # correlation (q_discount_qty_corr) is confounded by brand mix and
    # must stratify (q_cem_att's motivation, stated as an audit).  The
    # covariance NUMERATOR n*Sxy - Sx*Sy is an exact integer, so the
    # sign comparison is exact end to end — no float anywhere.  One
    # fact-dim join (AQE-broadcast part), one combinable per-brand
    # rollup; the stratum frame is |brands|-bounded.
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    r = li.join(
        F.broadcast(pt.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("x"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("y"),
    )
    per_brand = r.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    signs = per_brand.filter(F.col("n") >= 2).select(
        F.when(cov > 0, 1).when(cov < 0, -1).otherwise(0).alias("s")
    )
    tot = (
        per_brand.agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sx").cast("bigint").alias("sx"),
            F.sum("sy").cast("bigint").alias("sy"),
            F.sum("sxy").cast("bigint").alias("sxy"),
        )
        .select(
            F.when(cov > 0, 1).when(cov < 0, -1).otherwise(0).alias("s_all")
        )
    )
    opp = F.sum(
        F.when(
            (F.col("s") == -F.col("s_all")) & (F.col("s_all") != 0), 1
        ).otherwise(0)
    )
    opp_any = F.sum(
        F.when(F.col("s") == -F.col("s_all"), 1).otherwise(0)
    )
    return (
        signs.crossJoin(F.broadcast(tot))
        .groupBy("s_all")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_strata"),
            opp.cast("bigint").alias("n_opposite"),
            F.when(
                (F.col("s_all") != 0)
                & (2 * opp_any > F.count(F.lit(1))),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("paradox"),
        )
        .select(
            F.col("s_all").cast("bigint").alias("overall_sign"),
            "n_strata",
            "n_opposite",
            "paradox",
        )
    )


@register(
    "q_theil_decomposition",
    """
WITH v AS (
    SELECT event_type,
           CAST(floor(value * 1000000) AS BIGINT) AS x
    FROM events WHERE value IS NOT NULL AND value > 0
),
g AS (
    SELECT event_type, count(*) AS ng,
           CAST(sum(x) AS BIGINT) AS xg,
           CAST(sum(x * CAST(ln(CAST(x AS DOUBLE)) AS DECIMAL(18,12)))
                AS DECIMAL(38,12)) AS slg
    FROM v GROUP BY event_type
),
t AS (
    SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(xg) AS BIGINT) AS xt,
           CAST(sum(slg) AS DECIMAL(38,12)) AS slt
    FROM g
)
SELECT g.event_type,
       CAST(g.ng AS BIGINT) AS n_rows,
       CAST(floor(1000000000.0 * CAST(g.xg AS DOUBLE)
                  / CAST(t.xt AS DOUBLE)) AS BIGINT) AS x_share_ppb,
       printf('%.9e',
              CAST(g.slg AS DOUBLE) / g.xg
              - ln(CAST(g.xg AS DOUBLE) / g.ng)) AS theil_within,
       printf('%.9e',
              CAST(t.slt AS DOUBLE) / t.xt
              - ln(CAST(t.xt AS DOUBLE) / t.n)) AS theil_total,
       printf('%.9e',
              (CAST(g.xg AS DOUBLE) / t.xt)
              * ln((CAST(g.xg AS DOUBLE) / g.ng)
                   / (CAST(t.xt AS DOUBLE) / t.n)))
           AS between_term
FROM g CROSS JOIN t
WHERE g.xg > 0 AND t.xt > 0
""",
)
def q_theil_decomposition(spark, sf_dir):
    # Theil-T inequality with its exact between/within decomposition —
    # what Gini (q_key_skew_gini) cannot do: T_total = T_between +
    # sum_g share_g * T_within_g, so a concentration alarm can say
    # whether inequality lives BETWEEN series or INSIDE them.  The only
    # data-sized pass is one combinable rollup of (count, sum x,
    # sum x*pinned-ln x) per group; T_g = SL_g/X_g - ln(X_g/N_g) and
    # every ln thereafter takes EXACT INTEGER ratios (identical inputs
    # on both engines), with the per-row ln decimal-pinned before the
    # sum (the q_bigram_nll rule).  X-shares render floor-scaled ppb
    # (xg*1e9 overflows BIGINT at full scale, so the share is one IEEE
    # division + floor, identical on both engines); %.9e for the
    # transcendental chains.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("x"),
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("x").cast("bigint").alias("xg"),
        F.sum(
            F.col("x")
            * F.log(F.col("x").cast("double")).cast("decimal(18,12)")
        )
        .cast("decimal(38,12)")
        .alias("slg"),
    )
    t = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("xg").cast("bigint").alias("xt"),
        F.sum("slg").cast("decimal(38,12)").alias("slt"),
    )
    mu_g = F.col("xg").cast("double") / F.col("ng")
    mu_t = F.col("xt").cast("double") / F.col("n")
    return (
        g.crossJoin(F.broadcast(t))
        .filter((F.col("xg") > 0) & (F.col("xt") > 0))
        .select(
            "event_type",
            F.col("ng").cast("bigint").alias("n_rows"),
            F.floor(
                F.lit(1000000000.0)
                * F.col("xg").cast("double")
                / F.col("xt").cast("double")
            )
            .cast("bigint")
            .alias("x_share_ppb"),
            sci9(F.col("slg").cast("double") / F.col("xg") - F.log(mu_g)).alias("theil_within"),
            sci9(F.col("slt").cast("double") / F.col("xt") - F.log(mu_t)).alias("theil_total"),
            sci9((F.col("xg").cast("double") / F.col("xt"))
                * F.log(mu_g / mu_t)).alias("between_term"),
        )
    )


@register(
    "q_modularity",
    f"""
WITH {_TOK_CTE}, {_SIGS_SQL},
{_CAND_CTES},
lab AS (
    SELECT c.a_id, c.b_id, da.source AS sa, db.source AS sb
    FROM cand c
    JOIN documents da ON da.doc_id = c.a_id
    JOIN documents db ON db.doc_id = c.b_id
),
m AS (SELECT count(*) AS m FROM lab),
per_source AS (
    SELECT source,
           CAST(sum(deg) AS BIGINT) AS d_s,
           CAST(sum(intra) AS BIGINT) AS m_s
    FROM (
        SELECT sa AS source, 1 AS deg,
               CASE WHEN sa = sb THEN 1 ELSE 0 END AS intra
        FROM lab
        UNION ALL
        SELECT sb, 1, 0 FROM lab
    ) GROUP BY source
),
q AS (
    SELECT CAST(sum(4 * m.m * m_s - d_s * d_s) AS BIGINT) AS qnum,
           CAST(max(m.m) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS n_sources
    FROM per_source CROSS JOIN m
)
SELECT m AS n_edges, n_sources, qnum,
       printf('%.9e', CAST(qnum AS DOUBLE)
              / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
           AS modularity
FROM q WHERE m > 0
""",
)
def q_modularity(spark, sf_dir):
    # Newman modularity of the SOURCE partition against the LSH
    # similarity graph — does near-duplicate structure stay inside
    # source boundaries (high Q: dedup can shard by source) or cut
    # across them (Q near 0: cross-source dedup is mandatory)?  The
    # intra-edge count attributes each edge to its a-endpoint's source
    # (counted once, exactly when both endpoints share it) and degree
    # sums come from one edge-list unpivot, so Q = sum_s(4*m*m_s -
    # d_s^2) / 4m^2 carries an EXACT INTEGER numerator; the single
    # division renders %.9e.  Scale: the LSH-bounded edge list joins
    # the doc->source map twice (key-partitioned), then one
    # |sources|-bounded rollup.
    from opc2mongodb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = _t(spark, sf_dir, "documents")
    cand = (
        lsh_candidate_pairs(minhash_signatures(d, "doc_id", "text"), "doc_id")
        .filter(F.col("est_jaccard") >= 0.5)
        .select("a_id", "b_id")
    )
    src = d.select("doc_id", "source")
    lab = (
        cand.join(
            src.select(
                F.col("doc_id").alias("a_id"), F.col("source").alias("sa")
            ),
            "a_id",
        )
        .join(
            src.select(
                F.col("doc_id").alias("b_id"), F.col("source").alias("sb")
            ),
            "b_id",
        )
        .localCheckpoint(eager=False)
    )
    m = lab.agg(F.count(F.lit(1)).alias("m"))
    unpivot = lab.select(
        F.col("sa").alias("source"),
        F.lit(1).alias("deg"),
        F.when(F.col("sa") == F.col("sb"), 1).otherwise(0).alias("intra"),
    ).unionAll(
        lab.select(
            F.col("sb").alias("source"),
            F.lit(1).alias("deg"),
            F.lit(0).alias("intra"),
        )
    )
    per_source = unpivot.groupBy("source").agg(
        F.sum("deg").cast("bigint").alias("d_s"),
        F.sum("intra").cast("bigint").alias("m_s"),
    )
    q = per_source.crossJoin(F.broadcast(m)).agg(
        F.sum(
            4 * F.col("m") * F.col("m_s") - F.col("d_s") * F.col("d_s")
        )
        .cast("bigint")
        .alias("qnum"),
        F.max("m").cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    return q.filter(F.col("m") > 0).select(
        F.col("m").alias("n_edges"),
        "n_sources",
        "qnum",
        sci9(F.col("qnum").cast("double")
            / (
                F.lit(4.0)
                * F.col("m").cast("double")
                * F.col("m").cast("double")
            )).alias("modularity"),
    )


@register(
    "q_mediation_effect",
    """
WITH per_user AS (
    SELECT user_id,
           CASE WHEN CAST('0x' || substring(
                    md5(CAST(user_id AS VARCHAR) || '|med'), 1, 13)
                    AS BIGINT) < 2251799813685248
                THEN 1 ELSE 0 END AS t,
           count(*) AS m,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
    FROM events GROUP BY user_id
),
s AS (
    SELECT count(*) AS n,
           CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(m) AS BIGINT) AS sm,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(t * m) AS BIGINT) AS stm,
           CAST(sum(t * y) AS BIGINT) AS sty,
           CAST(sum(m * y) AS BIGINT) AS smy,
           CAST(sum(m * m) AS BIGINT) AS smm
    FROM per_user
),
c AS (
    SELECT n,
           CAST(n * stm - st * sm AS DOUBLE) AS ctm,
           CAST(n * sty - st * sy AS DOUBLE) AS cty,
           CAST(n * smy - sm * sy AS DOUBLE) AS cmy,
           CAST(n * st - st * st AS DOUBLE) AS vt,
           CAST(n * smm - sm * sm AS DOUBLE) AS vm
    FROM s
)
SELECT CAST(n AS BIGINT) AS n_users,
       printf('%.9e', ctm / vt) AS a_hat,
       printf('%.9e', (cmy * vt - cty * ctm) / (vm * vt - ctm * ctm))
           AS b_hat,
       printf('%.9e', (ctm / vt)
              * ((cmy * vt - cty * ctm) / (vm * vt - ctm * ctm)))
           AS indirect,
       printf('%.9e', cty / vt
              - (ctm / vt)
                * ((cmy * vt - cty * ctm) / (vm * vt - ctm * ctm)))
           AS direct,
       printf('%.9e', cty / vt) AS total
FROM c
WHERE vt > 0 AND vm * vt > ctm * ctm
""",
)
def q_mediation_effect(spark, sf_dir):
    # Mediation analysis (product-of-coefficients): how much of the
    # treatment's effect on conversions flows THROUGH activity (t -> m
    # -> y) vs directly — the question DiD/CUPED/CEM can't answer
    # because they estimate only the total.  a_hat = cov(t,m)/var(t);
    # b_hat is the m-coefficient of the two-regressor OLS y ~ m + t
    # (closed form off the moment matrix); indirect = a*b, direct =
    # total - indirect (exactly, by OLS algebra).  Every covariance
    # numerator n*Sxy - Sx*Sy is an EXACT integer off one per-user
    # rollup + one 1-row fold; the five outputs are deterministic
    # double chains under %.9e.  The md5 bit is the treatment twin.
    ev = _t(spark, sf_dir, "events")
    t = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("user_id").cast("string"), F.lit("|med"))
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        < 2251799813685248,
        1,
    ).otherwise(0)
    per_user = ev.groupBy("user_id").agg(
        F.max(t).alias("t"),
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("m").cast("bigint").alias("sm"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("m")).cast("bigint").alias("stm"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
        F.sum(F.col("m") * F.col("y")).cast("bigint").alias("smy"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("smm"),
    )
    n = F.col("n")
    ctm = (n * F.col("stm") - F.col("st") * F.col("sm")).cast("double")
    cty = (n * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
    cmy = (n * F.col("smy") - F.col("sm") * F.col("sy")).cast("double")
    vt = (n * F.col("st") - F.col("st") * F.col("st")).cast("double")
    vm = (n * F.col("smm") - F.col("sm") * F.col("sm")).cast("double")
    a_hat = ctm / vt
    b_hat = (cmy * vt - cty * ctm) / (vm * vt - ctm * ctm)
    return s.filter(
        (vt > 0) & (vm * vt > ctm * ctm)
    ).select(
        n.cast("bigint").alias("n_users"),
        sci9(a_hat).alias("a_hat"),
        sci9(b_hat).alias("b_hat"),
        sci9(a_hat * b_hat).alias("indirect"),
        sci9(cty / vt - a_hat * b_hat).alias("direct"),
        sci9(cty / vt).alias("total"),
    )

"""Query registrations: r8 batches 6-11: model evaluation (AUC/NDCG/MI), feature audit, forecasting error, leakage-safe encoding, graph mixing.

Mechanically split from the original single-module registry (r9);
registration order and bodies unchanged. Determinism rulebook:
the package docstring (queries/__init__.py)."""

from __future__ import annotations

from decimal import Decimal
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opc2mongodb_spark.queries._core import _t, dec, register, sci9
from opc2mongodb_spark.queries.relational import _COS

@register(
    "q_auc_roc",
    """
WITH s AS (
    SELECT CAST(value AS DECIMAL(18,2)) AS score,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL
),
g AS (
    SELECT score, count(*) AS c, sum(pos) AS p FROM s GROUP BY score
),
w AS (
    SELECT c, p,
           coalesce(sum(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
    FROM g
),
agg AS (
    SELECT sum(CAST(p AS DECIMAL(38,0))
               * CAST(2 * below + c + 1 AS DECIMAL(38,0))) AS s2,
           sum(p) AS np, sum(c - p) AS nn
    FROM w
)
SELECT CAST(np AS BIGINT) AS n_pos,
       CAST(nn AS BIGINT) AS n_neg,
       printf('%.9e',
              (CAST(s2 AS DOUBLE)
               - CAST(CAST(np AS DECIMAL(38,0))
                      * CAST(np + 1 AS DECIMAL(38,0)) AS DOUBLE))
              / (CAST(2 AS DOUBLE) * np * nn)) AS auc
FROM agg
""",
)
def q_auc_roc(spark, sf_dir):
    # Tie-corrected Mann-Whitney AUC of the event-value "score" against
    # the is-a-purchase label (does value separate purchase events from
    # the rest) — THE ranking-model acceptance number.
    # Exactness: AUC needs every positive's average rank; with
    # ties, avg-rank of a tied score group = below + (c+1)/2, so
    # 2*sum(rank_pos) = sum over score groups of p*(2*below + c + 1) —
    # every term an INTEGER. The whole statistic stays integer (DECIMAL
    # 38,0 against 100 TB overflow) until one final double division,
    # rendered %.9e per the decimal->double rule. Scale shape: ranks are
    # NEVER assigned per row — the distinct-score table g carries
    # (count, pos_count) per score, and the cumulative "scores below"
    # comes from the shared 1024-cell histogram decomposition
    # (operators/histogram.py): cell counts -> <=1024-row cumulative ->
    # one within-cell window partitioned by __cell. No single-task sort
    # of anything row-sized; the ORACLE keeps the naive global-window
    # form, cross-validating the decomposition.
    from opc2mongodb_spark.operators.histogram import cell_stats, with_cells

    ev = _t(spark, sf_dir, "events")
    s = ev.where(F.col("value").isNotNull()).select(
        dec(F.col("value")).alias("score"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
    )
    # persist the distinct-score rollup: its three consumers (the cell
    # stats, the cell counts, and the ranked frame) otherwise each
    # re-derive it from the events scan (the q_bitmap_distinct
    # checkpoint discipline); |distinct 2-dp scores| is value-domain
    # bounded, safe to cache
    g = (
        s.groupBy("score")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p"))
        .withColumn("score_d", F.col("score").cast("double"))
        .persist()
    )
    # cell assignment only needs monotonicity + equal-scores-same-cell,
    # both preserved by the (monotone) decimal->double cast
    stats = cell_stats(g, "score_d")
    gc = with_cells(g, "score_d", stats)
    cells = gc.groupBy("__cell").agg(F.sum("c").alias("cell_n"))
    wcells = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cells_cum = cells.select(
        "__cell",
        F.coalesce(F.sum("cell_n").over(wcells), F.lit(0)).alias(
            "cells_below"
        ),
    )
    win = Window.partitionBy("__cell").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = gc.join(F.broadcast(cells_cum), "__cell").select(
        "c",
        "p",
        (
            F.col("cells_below")
            + F.coalesce(F.sum("c").over(win), F.lit(0))
        ).alias("below"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (2 * F.col("below") + F.col("c") + 1).cast("decimal(38,0)")
        ).alias("s2"),
        F.sum("p").alias("np"),
        F.sum(F.col("c") - F.col("p")).alias("nn"),
    )
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        sci9((
                F.col("s2").cast("double")
                - (
                    F.col("np").cast("decimal(38,0)")
                    * (F.col("np") + 1).cast("decimal(38,0)")
                ).cast("double")
            )
            / (F.lit(2.0) * F.col("np") * F.col("nn"))).alias("auc"),
    )


# NDCG@10 discount table: ONE Python source of truth emits the literal
# DECIMAL(18,12) constants into BOTH engines, so no cross-engine ln/log2
# ulp drift can exist by construction. Prefix sums (the ideal-DCG table)
# are summed exactly over the rounded decimals.
_NDCG_W: list[str] = [f"{1.0 / math.log2(i + 1):.12f}" for i in range(1, 11)]
_NDCG_PRE: list[str] = []
_acc = Decimal(0)
for _w in _NDCG_W:
    _acc += Decimal(_w)
    _NDCG_PRE.append(f"{_acc:.12f}")
_NDCG_VALUES = ", ".join(
    f"({k + 1}, CAST('{w}' AS DECIMAL(18,12)), CAST('{p}' AS DECIMAL(18,12)))"
    for k, (w, p) in enumerate(zip(_NDCG_W, _NDCG_PRE))
)


@register(
    "q_ndcg",
    f"""
WITH disc(k, wt, pre) AS (
    VALUES {_NDCG_VALUES}
),
ranked AS (
    SELECT user_id, event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id) AS rk
    FROM events WHERE value IS NOT NULL
),
per AS (
    SELECT r.user_id,
           sum(r.rel) AS npos,
           sum(CASE WHEN r.rk <= 10 AND r.rel = 1
                    THEN (SELECT wt FROM disc WHERE k = r.rk)
                    ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg
    FROM ranked r
    GROUP BY r.user_id
)
SELECT p.user_id,
       CAST(p.npos AS BIGINT) AS n_pos,
       printf('%.9e', CAST(p.dcg AS DOUBLE) / CAST(d.pre AS DOUBLE))
           AS ndcg10
FROM per p
JOIN disc d ON d.k = least(p.npos, 10)
WHERE p.npos > 0
""",
)
def q_ndcg(spark, sf_dir):
    # NDCG@10 per user of the value-ordered event ranking against the
    # purchase relevance labels — the offline retrieval/ranking eval
    # metric. Determinism: the 10 discount weights 1/log2(i+1) and their
    # prefix sums are GENERATED ONCE in Python and embedded as identical
    # DECIMAL(18,12) literals in both engines (module constants above),
    # so the usual transcendental ulp hazard is eliminated rather than
    # managed; DCG accumulates in exact decimal; the single final double
    # division renders %.9e. Ranking ties break on event_id (the unique-
    # tiebreaker rule). Scale shape: ONE per-user window (partitioned,
    # parallel) + ONE combinable groupBy — npos and DCG fold in the same
    # aggregate; the 10-row discount table rides along as an array
    # literal, never a join.
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    warr = F.array(
        *[F.lit(w).cast("decimal(18,12)") for w in _NDCG_W]
    )
    prearr = F.array(
        *[F.lit(p).cast("decimal(18,12)") for p in _NDCG_PRE]
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    r = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "rel"
        ),
        F.row_number().over(w).alias("rk"),
    )
    zero12 = F.lit(0).cast("decimal(18,12)")
    per = (
        r.groupBy("user_id")
        .agg(
            F.sum("rel").alias("npos"),
            F.sum(
                F.when(
                    (F.col("rk") <= 10) & (F.col("rel") == 1),
                    F.element_at(warr, F.least(F.col("rk"), F.lit(10)).cast("int")),
                ).otherwise(zero12)
            ).alias("dcg"),
        )
        .where(F.col("npos") > 0)
    )
    return per.select(
        "user_id",
        F.col("npos").cast("long").alias("n_pos"),
        sci9(F.col("dcg").cast("double")
            / F.element_at(
                prearr, F.least(F.col("npos"), F.lit(10)).cast("int")
            ).cast("double")).alias("ndcg10"),
    )


@register(
    "q_mutual_info",
    """
WITH j AS (
    SELECT event_type AS et, CAST(hour(ts) AS INTEGER) AS hr,
           count(*) AS c
    FROM events GROUP BY event_type, CAST(hour(ts) AS INTEGER)
),
rm AS (SELECT et, sum(c) AS r FROM j GROUP BY et),
cm AS (SELECT hr, sum(c) AS cc FROM j GROUP BY hr),
tot AS (SELECT sum(c) AS n, count(*) AS n_cells FROM j),
terms AS (
    SELECT CAST((CAST(j.c AS DOUBLE) / t.n)
                * ln(CAST(j.c AS DOUBLE) * t.n
                     / (CAST(rm.r AS DOUBLE) * cm.cc))
           AS DECIMAL(18,12)) AS term
    FROM j JOIN rm USING (et) JOIN cm USING (hr) CROSS JOIN tot t
)
SELECT (SELECT CAST(n_cells AS BIGINT) FROM tot) AS n_cells,
       (SELECT CAST(n AS BIGINT) FROM tot) AS n_events,
       printf('%.9e', CAST(sum(term) AS DOUBLE)) AS mi_nats
FROM terms
""",
)
def q_mutual_info(spark, sf_dir):
    # Mutual information (nats) between event type and hour-of-day — the
    # feature-selection statistic: how much does WHEN an event happens
    # tell you about WHAT it is. Scale shape: ONE map-side-combinable
    # groupBy on (type, hour) produces the joint table (|types| x 24
    # rows); marginals DERIVE from that tiny frame, join back broadcast,
    # and the MI sum runs over a few hundred cells — the events scan is
    # touched exactly once. Determinism: each p*ln(p*N/(r*c)) term is
    # decimal-pinned at 12 places before the sum (the q_unigram_nll
    # rule) and the 1-row result renders %.9e; the count ratios feeding
    # ln() are built double-by-double with the expression tree mirrored
    # association-for-association in the oracle.
    ev = _t(spark, sf_dir, "events")
    # persist the tiny joint table: marginals + total + the term frame
    # all derive from it, and without the cache each consumer would
    # re-run the events scan (|types| x 24 rows, trivially cacheable)
    j = ev.groupBy(
        F.col("event_type").alias("et"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c")).persist()
    rm = j.groupBy("et").agg(F.sum("c").alias("r"))
    cm = j.groupBy("hr").agg(F.sum("c").alias("cc"))
    tot = j.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_cells")
    )
    terms = (
        j.join(F.broadcast(rm), "et")
        .join(F.broadcast(cm), "hr")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_cells",
            "n",
            (
                (F.col("c").cast("double") / F.col("n"))
                * F.log(
                    F.col("c").cast("double")
                    * F.col("n")
                    / (F.col("r").cast("double") * F.col("cc"))
                )
            )
            .cast("decimal(18,12)")
            .alias("term"),
        )
    )
    return terms.groupBy().agg(
        F.max("n_cells").cast("long").alias("n_cells"),
        F.max("n").cast("long").alias("n_events"),
        sci9(F.sum("term").cast("double")).alias("mi_nats"),
    )


@register(
    "q_theilsen_slope",
    """
WITH pts AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t, value AS v,
           event_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE value IS NOT NULL
),
p64 AS (SELECT event_type, t, v, event_id FROM pts WHERE rn <= 64),
pairs AS (
    SELECT a.event_type,
           (b.v - a.v) / CAST(b.t - a.t AS DOUBLE) AS slope
    FROM p64 a JOIN p64 b
      ON a.event_type = b.event_type
     AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
    WHERE a.t <> b.t
),
ranked AS (
    SELECT event_type, slope,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY slope) AS rs,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM pairs
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_slopes,
       slope AS ts_slope
FROM ranked
WHERE rs = (n + 1) // 2
""",
)
def q_theilsen_slope(spark, sf_dir):
    # Theil-Sen robust trend per series: the (lower-)median of all
    # pairwise slopes over each event type's latest 64 points — the
    # outlier-immune drift estimate (50% breakdown point vs OLS's zero;
    # complements the robust-stats family q_mad_outliers/q_winsorize).
    # Scale shape: the per-series window bounds state at 64 points ->
    # C(64,2)=2016 slopes per series generated INSIDE one array
    # expression (transform/slice over the collected 64-struct array) —
    # no self-join ever touches row-sized data, and the series count
    # bounds the frame (the q_mad_outliers per-series contract). Median
    # = deterministic index selection (n+1) DIV 2 on the sorted slope
    # array, no averaging. Determinism: each slope is ONE double
    # subtraction + ONE exactly-rounded division over integer-exact
    # microsecond deltas — bitwise identical across engines; equal-t
    # pairs are excluded identically on both sides. The ORACLE replays
    # it as the naive O(n^2) self-join + global rank, cross-validating
    # the array decomposition.
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    p64 = (
        ev.select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            F.col("value").alias("v"),
            "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 64)
    )
    pts = p64.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("t", "event_id", "v"))
        ).alias("pts")
    )
    slopes = pts.select(
        "event_type",
        F.expr(
            """
            transform(
              filter(
                flatten(transform(pts, (p, i) ->
                  transform(slice(pts, i + 2, size(pts)),
                            q -> named_struct('a', p, 'b', q)))),
                x -> x.b.t != x.a.t),
              x -> (x.b.v - x.a.v) / CAST(x.b.t - x.a.t AS DOUBLE))
            """
        ).alias("slopes"),
    )
    return (
        slopes.select(
            "event_type",
            F.size("slopes").cast("long").alias("n_slopes"),
            F.element_at(
                F.array_sort("slopes"),
                F.expr("CAST((size(slopes) + 1) DIV 2 AS INT)"),
            ).alias("ts_slope"),
        )
        .where(F.col("n_slopes") >= 1)
    )


@register(
    "q_feature_corr",
    """
WITH u AS (
    SELECT user_id,
           count(*) AS n_events,
           sum(CAST(coalesce(value, 0) AS DECIMAL(18,2))) AS total_value,
           count(DISTINCT event_type) AS n_types,
           count(DISTINCT CAST(ts AS DATE)) AS active_days,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
    FROM events GROUP BY user_id
),
f AS (
    SELECT 'n_events' AS feature, CAST(n_events AS DECIMAL(18,2)) AS x,
           y FROM u
    UNION ALL
    SELECT 'total_value', total_value, y FROM u
    UNION ALL
    SELECT 'n_types', CAST(n_types AS DECIMAL(18,2)), y FROM u
    UNION ALL
    SELECT 'active_days', CAST(active_days AS DECIMAL(18,2)), y FROM u
),
agg AS (
    SELECT feature,
           count(*) AS n,
           sum(x) AS sx,
           sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
           sum(y) AS sy,
           sum(y * y) AS syy,
           sum(CAST(x * y AS DECIMAL(38,4))) AS sxy
    FROM f GROUP BY feature
)
SELECT feature,
       CAST(n AS BIGINT) AS n_users,
       CASE WHEN (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0
            THEN NULL
            ELSE printf('%.9e',
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
       END AS corr_purchases
FROM agg
""",
)
def q_feature_corr(spark, sf_dir):
    # Pearson correlation of four per-user candidate features (event
    # count, decimal-exact total value, type diversity, active days)
    # against the per-user purchase count, all in one pass — the
    # feature-audit table a training pipeline builds before model
    # fitting (single-pair version: q_corr_manual). Scale shape: ONE per-user
    # aggregation over events (the two DISTINCTs expand map-side), then
    # stack() unpivots the already-aggregated |users|-row frame — the
    # events scan happens once, NOT once per feature (the oracle's
    # UNION ALL is the naive form); the corr sums are combinable
    # decimals. Determinism: all six sums are integer/decimal-exact;
    # the corr formula is assembled double-by-double with the tree
    # mirrored association-for-association, sqrt is IEEE
    # exactly-rounded, and the result renders %.9e with a shared
    # zero-denominator NULL guard (constant feature or single-class
    # label) so no engine-specific NaN rendering can leak.
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec(F.coalesce(F.col("value"), F.lit(0.0)))).alias(
            "total_value"
        ),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    f = u.select(
        F.expr(
            "stack(4, "
            "'n_events', CAST(n_events AS DECIMAL(28,2)), "
            "'total_value', CAST(total_value AS DECIMAL(28,2)), "
            "'n_types', CAST(n_types AS DECIMAL(28,2)), "
            "'active_days', CAST(active_days AS DECIMAL(28,2))"
            ") AS (feature, x)"
        ),
        "y",
    )
    agg = f.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias(
            "sxx"
        ),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).alias(
            "sxy"
        ),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    syd = F.col("sy").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    denom = F.sqrt(nd * sxxd - sxd * sxd) * F.sqrt(
        nd * syyd - syd * syd
    )
    return agg.select(
        "feature",
        F.col("n").cast("long").alias("n_users"),
        F.when(denom == 0, F.lit(None).cast("string"))
        .otherwise(
            sci9((nd * sxyd - sxd * syd) / denom)
        )
        .alias("corr_purchases"),
    )


# ---------------------------------------------------------------------------
# r8 batch 7 — forecasting error, leakage-safe encoding, graph mixing,
# interpolated percentiles
# ---------------------------------------------------------------------------


@register(
    "q_mase_forecast",
    """
WITH hourly AS (
    SELECT event_type,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS y
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, epoch_us(ts) // 3600000000
),
num AS (
    SELECT a.event_type, CAST(abs(a.y - b.y) AS DECIMAL(18,6)) AS e
    FROM hourly a JOIN hourly b
      ON a.event_type = b.event_type AND b.h = a.h - 24
),
den AS (
    SELECT a.event_type, CAST(abs(a.y - b.y) AS DECIMAL(18,6)) AS d
    FROM hourly a JOIN hourly b
      ON a.event_type = b.event_type AND b.h = a.h - 1
),
na AS (SELECT event_type, count(*) AS n24, sum(e) AS se
       FROM num GROUP BY event_type),
nd AS (SELECT event_type, count(*) AS n1, sum(d) AS sd
       FROM den GROUP BY event_type)
SELECT na.event_type,
       CAST(n24 AS BIGINT) AS n_seasonal,
       CAST(n1 AS BIGINT) AS n_naive,
       CASE WHEN CAST(sd AS DOUBLE) = 0 THEN NULL
            ELSE printf('%.9e',
                 (CAST(se AS DOUBLE) / n24)
                 / (CAST(sd AS DOUBLE) / n1)) END AS mase
FROM na JOIN nd USING (event_type)
""",
)
def q_mase_forecast(spark, sf_dir):
    # MASE (mean absolute scaled error) of the seasonal-naive forecast
    # y_hat(h) = y(h-24) per series, scaled by the one-step naive MAE —
    # Hyndman's scale-free forecast-accuracy standard and the
    # freshness/predictability monitor a metrics pipeline runs per
    # series. Scale shape: ONE map-side-combinable groupBy builds the
    # (series, epoch-hour, mean) frame (persisted: the two lag
    # comparisons + both reductions re-derive it otherwise); lags are
    # equi-JOINS on (series, h-24)/(series, h-1) — gap-correct (a
    # missing hour contributes no pair, unlike a row-lag window) and
    # keyed, never a global sort. Determinism: hourly means are exact
    # decimal sums over one exactly-rounded division; each |err| is
    # decimal-pinned before summing (the NLL rule); one final double
    # ratio renders %.9e behind a shared zero-denominator guard.
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000"
            ).alias("h"),
        )
        .agg(
            (
                F.sum(dec(F.col("value"))).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
        .persist()
    )
    def lagged(k, out):
        a = hourly.select("event_type", "h", F.col("y").alias("ya"))
        b = hourly.select(
            "event_type", (F.col("h") + k).alias("h"), F.col("y").alias("yb")
        )
        return a.join(b, ["event_type", "h"]).select(
            "event_type",
            F.abs(F.col("ya") - F.col("yb")).cast("decimal(18,6)").alias(out),
        )
    na = lagged(24, "e").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n24"), F.sum("e").alias("se")
    )
    nd = lagged(1, "d").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n1"), F.sum("d").alias("sd")
    )
    return na.join(nd, "event_type").select(
        "event_type",
        F.col("n24").cast("long").alias("n_seasonal"),
        F.col("n1").cast("long").alias("n_naive"),
        F.when(F.col("sd").cast("double") == 0, F.lit(None).cast("string"))
        .otherwise(
            sci9((F.col("se").cast("double") / F.col("n24"))
                / (F.col("sd").cast("double") / F.col("n1")))
        )
        .alias("mase"),
    )


@register(
    "q_target_encoding",
    """
WITH folded AS (
    SELECT event_type,
           CAST(CAST(('0x' || substring(md5('te:' || CAST(event_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 5 AS INTEGER)
               AS fold,
           CAST(value AS DECIMAL(18,2)) AS v
    FROM events WHERE value IS NOT NULL
),
pf AS (
    SELECT event_type, fold, count(*) AS c, sum(v) AS s
    FROM folded GROUP BY event_type, fold
),
tot AS (
    SELECT event_type, sum(c) AS tc, sum(s) AS ts FROM pf GROUP BY event_type
)
SELECT pf.event_type,
       pf.fold,
       CAST(pf.c AS BIGINT) AS n_in_fold,
       CAST(tot.tc - pf.c AS BIGINT) AS n_out_of_fold,
       CASE WHEN tot.tc - pf.c = 0 THEN NULL
            ELSE printf('%.9e',
                 CAST(tot.ts - pf.s AS DOUBLE) / (tot.tc - pf.c)) END
           AS enc_oof
FROM pf JOIN tot USING (event_type)
""",
)
def q_target_encoding(spark, sf_dir):
    # K-fold leakage-safe target encoding (the mean-target categorical
    # feature, computed OUT-OF-FOLD so a row never sees its own label —
    # the standard guard against target leakage in feature engineering).
    # The fold is the same md5-prefix hash the sharding family uses
    # (deterministic, oracle-replayable — the q_stratified_sample rand()
    # trap). Scale shape: ONE combinable groupBy to the (category, fold)
    # frame; per-category totals derive from those <=|cats|x5 rows, so
    # enc(cat, fold) = (tot - fold) sums is pure tiny-frame arithmetic
    # (complement trick — no second scan, no per-row join back).
    # Determinism: exact decimal/integer subtraction, one double
    # division, %.9e behind the shared empty-complement guard.
    from opc2mongodb_spark.operators.sharding import shard_assignment

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    folded = shard_assignment(ev, "event_id", 5, seed="te").select(
        "event_type",
        F.col("shard").alias("fold"),
        dec(F.col("value")).alias("v"),
    )
    pf = folded.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
    )
    tot = pf.groupBy("event_type").agg(
        F.sum("c").alias("tc"), F.sum("s").alias("ts")
    )
    return pf.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "fold",
        F.col("c").cast("long").alias("n_in_fold"),
        (F.col("tc") - F.col("c")).cast("long").alias("n_out_of_fold"),
        F.when(F.col("tc") - F.col("c") == 0, F.lit(None).cast("string"))
        .otherwise(
            sci9((F.col("ts") - F.col("s")).cast("double")
                / (F.col("tc") - F.col("c")))
        )
        .alias("enc_oof"),
    )


@register(
    "q_degree_assortativity",
    """
WITH edges AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
dc AS (SELECT c, count(*) AS degc FROM edges GROUP BY c),
dp AS (SELECT p, count(*) AS degp FROM edges GROUP BY p),
j AS (
    SELECT dc.degc AS x, dp.degp AS y
    FROM edges JOIN dc USING (c) JOIN dp USING (p)
),
agg AS (
    SELECT count(*) AS n,
           sum(CAST(x AS DECIMAL(38,0))) AS sx,
           sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
           sum(CAST(y AS DECIMAL(38,0))) AS sy,
           sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
           sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
    FROM j
)
SELECT CAST(n AS BIGINT) AS n_edges,
       CASE WHEN (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0
            THEN NULL
            ELSE printf('%.9e',
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
       END AS assortativity
FROM agg
""",
)
def q_degree_assortativity(spark, sf_dir):
    # Degree assortativity of the customer-part bipartite purchase graph:
    # the Pearson correlation, over EDGES, of the two endpoint degrees —
    # Newman's mixing coefficient (do heavy buyers buy popular parts?),
    # the graph-health statistic next to q_triangle_count/q_pagerank2.
    # Scale shape: the distinct edge list derives once and is persisted
    # (three consumers: both degree rollups + the edge-join) — at 100 TB
    # it is the operator's working set and spills via MEMORY_AND_DISK;
    # degrees are combinable counts joined back BY KEY (c then p, both
    # shuffle-keyed, no skew beyond the graph's own); the corr reduces in
    # integer-exact DECIMAL(38,0) sums. One final mirrored double
    # formula, %.9e, shared zero-variance guard.
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey").alias("c")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_partkey").alias("p")
    )
    edges = o.join(l, "o_orderkey").select("c", "p").distinct().persist()
    dc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("degc"))
    dp = edges.groupBy("p").agg(F.count(F.lit(1)).alias("degp"))
    j = edges.join(dc, "c").join(dp, "p").select(
        F.col("degc").alias("x"), F.col("degp").alias("y")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    syd, syyd = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    denom = F.sqrt(nd * sxxd - sxd * sxd) * F.sqrt(nd * syyd - syd * syd)
    return agg.select(
        F.col("n").cast("long").alias("n_edges"),
        F.when(denom == 0, F.lit(None).cast("string"))
        .otherwise(
            sci9((nd * sxyd - sxd * syd) / denom)
        )
        .alias("assortativity"),
    )


@register(
    "q_percentile_cont",
    """
WITH v AS (
    SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL
),
r AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM v
),
p(p) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                (CAST(0.75 AS DOUBLE))),
spine AS (SELECT DISTINCT event_type, n FROM r),
idx AS (
    SELECT s.event_type, s.n, p.p, 1 + p.p * (s.n - 1) AS ix
    FROM spine s CROSS JOIN p
)
SELECT i.event_type,
       i.p,
       CAST(i.n AS BIGINT) AS n,
       lo.value + (i.ix - floor(i.ix)) * (hi.value - lo.value)
           AS pct_value
FROM idx i
JOIN r lo ON lo.event_type = i.event_type
         AND lo.rk = CAST(floor(i.ix) AS BIGINT)
JOIN r hi ON hi.event_type = i.event_type
         AND hi.rk = CAST(ceil(i.ix) AS BIGINT)
""",
)
def q_percentile_cont(spark, sf_dir):
    # SQL-standard PERCENTILE_CONT(0.25/0.5/0.75) per series, EXACT, via
    # the shared histogram rank-selection: for each p the two bracketing
    # order statistics floor/ceil(1 + p*(n-1)) come from rank_select (one
    # pass, all six ranks, no per-group global sort) and interpolate as
    # v_lo + frac*(v_hi - v_lo). Complements q_exact_quantiles (discrete
    # picks) and q_approx_quantile (sketch) with the interpolated form
    # BI engines default to. Determinism: p in {.25,.5,.75} and n-1 make
    # ix/frac exact dyadic doubles (no rounding anywhere until the final
    # exactly-rounded interpolation, mirrored term-for-term), so the
    # plain double output is bitwise cross-engine. The ORACLE keeps the
    # naive global-window form, cross-validating the decomposition.
    from opc2mongodb_spark.operators.histogram import rank_select

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value", "event_id")
    )
    exprs = []
    for p in (0.25, 0.5, 0.75):
        exprs.append(lambda n, p=p: F.floor(1 + F.lit(p) * (n - 1)))
        exprs.append(lambda n, p=p: F.ceil(1 + F.lit(p) * (n - 1)))
    picks = rank_select(
        ev, "value", exprs, group_cols=["event_type"],
        tiebreak_cols=["event_id"],
    ).persist()
    spine = picks.select("event_type", "n").distinct()
    ps = spine.select(
        "event_type",
        "n",
        F.explode(
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("p"),
    ).select(
        "event_type", "n", "p",
        (1 + F.col("p") * (F.col("n") - 1)).alias("ix"),
    )
    lo = picks.select(
        "event_type", F.col("rank").alias("lo_rk"), F.col("value").alias("vlo")
    )
    hi = picks.select(
        "event_type", F.col("rank").alias("hi_rk"), F.col("value").alias("vhi")
    )
    out = (
        ps.withColumn("lo_rk", F.floor("ix"))
        .withColumn("hi_rk", F.ceil("ix"))
        .join(F.broadcast(lo), ["event_type", "lo_rk"])
        .join(F.broadcast(hi), ["event_type", "hi_rk"])
    )
    return out.select(
        "event_type",
        "p",
        F.col("n").cast("long").alias("n"),
        (
            F.col("vlo")
            + (F.col("ix") - F.floor("ix")) * (F.col("vhi") - F.col("vlo"))
        ).alias("pct_value"),
    )


@register(
    "q_join_asof_fwd",
    """
WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
j AS (
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           p.value AS value_next, p.ts AS ts_next,
           row_number() OVER (PARTITION BY c.event_id
                              ORDER BY p.ts ASC, p.event_id ASC) AS rn
    FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
)
SELECT click_id, user_id, click_ts, value_next, ts_next
FROM j WHERE rn = 1
""",
)
def q_join_asof_fwd(spark, sf_dir):
    # FORWARD as-of join (pandas merge_asof(direction="forward") parity;
    # the OPC gap-recovery read "next good value at or after the outage" —
    # the mirror of the reference's last-write-wins upsert, reference:
    # OPC2MongoDB/Program.cs:1179-1182): for each click, the EARLIEST
    # purchase by the same user at or after the click. Same merge-union
    # single-shuffle plan as q_join_asof — only the per-key sort order
    # reverses — so the |L|+|R| linear cost argument carries over
    # unchanged; the oracle is the naive inequality join + row_number,
    # cross-validating the decomposition. Forward ties take the SMALLEST
    # event_id (mirror of backward's greatest), making it deterministic.
    from opc2mongodb_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        right_tiebreak="event_id",
        direction="forward",
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value_asof").alias("value_next"),
        F.col("ts_asof").alias("ts_next"),
    )


@register(
    "q_null_safe_join",
    """
WITH e AS (
    SELECT NULLIF(CAST(floor(value) AS BIGINT) % 5, 4) AS bucket
    FROM events
),
d(bucket, label) AS (
    VALUES (CAST(0 AS BIGINT), 'b0'), (CAST(1 AS BIGINT), 'b1'),
           (CAST(2 AS BIGINT), 'b2'), (CAST(3 AS BIGINT), 'b3'),
           (CAST(NULL AS BIGINT), 'missing')
)
SELECT d.label, count(*) AS n_events
FROM e JOIN d ON e.bucket IS NOT DISTINCT FROM d.bucket
GROUP BY d.label
""",
)
def q_null_safe_join(spark, sf_dir):
    # NULL-safe equi-join (Spark `<=>` / SQL IS NOT DISTINCT FROM): join a
    # nullable bucket key to a broadcast dim whose key column INCLUDES a
    # NULL row, so missing values land on the 'missing' label instead of
    # being dropped the way a plain equi-join would. Catalyst treats
    # EqualNullSafe as an equi-join key, so this plans as a
    # BroadcastHashJoin, not a cartesian filter — the semantics change is
    # free at 100 TB. NULLs are synthesized via NULLIF (the test tables
    # carry none); value is positive so the BIGINT %5 remainder is 0..4 on
    # both engines (no negative-modulo divergence).
    ev = _t(spark, sf_dir, "events").select(
        F.nullif(
            F.floor("value").cast("bigint") % F.lit(5), F.lit(4)
        ).alias("bucket")
    )
    rows = [(0, "b0"), (1, "b1"), (2, "b2"), (3, "b3"), (None, "missing")]
    dim = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).cast("bigint").alias("bucket"),
                            F.lit(lab).alias("label"),
                        )
                        for b, lab in rows
                    ]
                )
            ).alias("d")
        )
        .select("d.bucket", "d.label")
    )
    j = ev.join(
        F.broadcast(dim), ev["bucket"].eqNullSafe(dim["bucket"]), "inner"
    )
    return j.groupBy("label").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "q_window_count_distinct",
    """
WITH f AS (
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) = 1
                THEN 1 ELSE 0 END AS is_first
    FROM events
)
SELECT event_id, user_id, ts,
       CAST(sum(is_first) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
           AS distinct_types
FROM f
""",
)
def q_window_count_distinct(spark, sf_dir):
    # Windowed COUNT(DISTINCT): the running number of DISTINCT event types
    # each user has produced up to and including each event — a window
    # shape Spark (and most engines) reject natively (`count(distinct)
    # over (...)`). The standard decomposition: flag each (user, type)'s
    # FIRST occurrence with one partitioned row_number, then a cumulative
    # sum of the flag over the user's time-ordered window. Two windows,
    # both partitioned by user (never global), one shuffle on user_id that
    # both reuse — linear, skew-bounded by the hottest user, the same
    # per-key bound every window query in the registry documents. The
    # oracle runs the IDENTICAL decomposition (DuckDB also rejects the
    # native form), so the hash cross-validates engine window semantics,
    # not the rewrite. (ts, event_id) ordering is collision-free, so both
    # windows are fully deterministic. The explicit repartition on user_id
    # makes BOTH windows' clustering requirement satisfied by ONE exchange
    # (hash(user_id) ⊆ {user_id, event_type}) — without it Catalyst plans
    # hash(user_id, event_type) for the flag window and a SECOND shuffle
    # for the cumulative one; plan-asserted single-exchange.
    ev = _t(spark, sf_dir, "events").repartition(F.col("user_id"))
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_first"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("is_first").over(w_cum).cast("bigint").alias("distinct_types"),
    )


@register(
    "q_json_schema_profile",
    """
WITH ks AS (
    SELECT props, unnest(json_keys(props)) AS key FROM events
),
kv AS (
    SELECT key, json_extract_string(props, '$."' || key || '"') AS val
    FROM ks
)
SELECT key,
       count(*) AS n_present,
       CAST(count(val) AS BIGINT) AS n_nonnull,
       CAST(count(*) FILTER (TRY_CAST(val AS DOUBLE) IS NOT NULL)
            AS BIGINT) AS n_numeric,
       CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
       min(TRY_CAST(val AS DOUBLE)) AS min_num,
       max(TRY_CAST(val AS DOUBLE)) AS max_num
FROM kv
GROUP BY key
""",
)
def q_json_schema_profile(spark, sf_dir):
    # Semi-structured SCHEMA INFERENCE over the props JSON column — the
    # data-lake profiling pass that decides which keys deserve promotion
    # to real columns: per key, presence count, non-null count, how often
    # the value parses numeric, distinct cardinality, numeric min/max.
    # Spark side explodes from_json's map<string,string> (one generator,
    # no per-key re-parse — the q_json_funcs lesson) into ONE map-side-
    # combinable groupBy(key); output is |keys| rows regardless of table
    # size, and count(DISTINCT val) is the only expansion (two-phase
    # partial-distinct, bounded by |keys|x|distinct vals|). min/max stay
    # exact doubles (comparisons only, no summation — no decimal pin
    # needed). DuckDB twin unnests json_keys with a quoted dynamic path.
    ev = _t(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias(
            "key", "val"
        )
    )
    num = F.col("val").cast("double")
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.count("val").cast("bigint").alias("n_nonnull"),
        F.count(F.when(num.isNotNull(), F.lit(1))).cast("bigint").alias(
            "n_numeric"
        ),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.min(num).alias("min_num"),
        F.max(num).alias("max_num"),
    )


@register(
    "q_bfs_reach",
    """
WITH RECURSIVE
e1 AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_partkey * 2 + 1 AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (SELECT src, dst FROM e1
          UNION ALL SELECT dst AS src, src AS dst FROM e1),
seeds AS (SELECT p_partkey * 2 + 1 AS node FROM part WHERE p_partkey <= 10),
reach(node, dist) AS (
    SELECT node, 0 FROM seeds
    UNION ALL
    SELECT e.dst, r.dist + 1
    FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.dist < 3
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS BIGINT) AS dist
FROM reach GROUP BY node
""",
)
def q_bfs_reach(spark, sf_dir):
    # Multi-source BFS hop distance (<=3 hops) over the undirected
    # customer-part purchase graph from the 11 lowest-keyed parts — the
    # graph-reachability primitive (contamination spread, recall expansion,
    # k-hop feature neighborhoods). Spark runs operators/components.py's
    # frontier BFS: edges hash-partitioned ONCE, one |expansion|-sized
    # shuffle per hop, per-round checkpoint+release, rounds bounded by
    # max_hops BY CONSTRUCTION. Node ids disambiguate the bipartite sides
    # integer-exactly (customer 2k, part 2k+1). The ORACLE is the naive
    # recursive CTE (path-enumerating UNION ALL + min), so the hash match
    # cross-validates the frontier deduplication against path semantics.
    from opc2mongodb_spark.operators.components import bfs_distances

    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e1 = (
        ords.join(li, ords.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = e1.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    seeds = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 10)
        .select((F.col("p_partkey") * 2 + 1).alias("node"))
    )
    out = bfs_distances(sym, seeds, max_hops=3, id_col="node")
    return out.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("dist").cast("bigint").alias("dist"),
    )


@register(
    "q_fd_violations",
    """
WITH d1 AS (
    SELECT count(*) AS n_lhs,
           CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating,
           CAST(max(nd) AS BIGINT) AS max_rhs_per_lhs
    FROM (SELECT source, count(DISTINCT lang) AS nd
          FROM documents GROUP BY source)
),
d2 AS (
    SELECT count(*) AS n_lhs,
           CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating,
           CAST(max(nd) AS BIGINT) AS max_rhs_per_lhs
    FROM (SELECT lang, count(DISTINCT source) AS nd
          FROM documents GROUP BY lang)
),
d3 AS (
    SELECT count(*) AS n_lhs,
           CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating,
           CAST(max(nd) AS BIGINT) AS max_rhs_per_lhs
    FROM (SELECT user_id, count(DISTINCT event_type) AS nd
          FROM events GROUP BY user_id)
)
SELECT 'documents.source->lang' AS fd, * FROM d1
UNION ALL SELECT 'documents.lang->source' AS fd, * FROM d2
UNION ALL SELECT 'events.user_id->event_type' AS fd, * FROM d3
""",
)
def q_fd_violations(spark, sf_dir):
    # Functional-dependency PROFILING (the schema-discovery pass that
    # decides which "natural key -> attribute" rules actually hold): for
    # each candidate FD, how many LHS values exist, how many violate
    # (multiple distinct RHS), and the worst fan-out. Each candidate is
    # one map-side-combinable two-level groupBy (lhs -> distinct rhs ->
    # 1-row rollup); the three 1-row frames union at the end, so the
    # output is |candidates| rows regardless of table size and nothing
    # global ever sorts. Counts are integer-exact — no rendering risk.
    def profile(df: DataFrame, lhs: str, rhs: str, label: str) -> DataFrame:
        per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        return per.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.count_if(F.col("nd") > 1).cast("bigint").alias("n_violating"),
            F.max("nd").cast("bigint").alias("max_rhs_per_lhs"),
        )
    docs = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")
    return (
        profile(docs, "source", "lang", "documents.source->lang")
        .unionByName(profile(docs, "lang", "source", "documents.lang->source"))
        .unionByName(
            profile(ev, "user_id", "event_type", "events.user_id->event_type")
        )
    )


@register(
    "q_hysteresis_alarms",
    """
WITH marked AS (
    SELECT event_type, ts, event_id,
           CASE WHEN value >= 400.0 THEN 1
                WHEN value <= 100.0 THEN 0 END AS sig
    FROM events
),
filled AS (
    SELECT event_type, ts, event_id,
           coalesce(last_value(sig IGNORE NULLS)
                        OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW), 0) AS state
    FROM marked
),
trans AS (
    SELECT event_type, ts, event_id, state,
           coalesce(lag(state) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id), 0) AS prev
    FROM filled
)
SELECT event_type, ts, event_id,
       CASE WHEN state = 1 THEN 'SET' ELSE 'CLEAR' END AS transition
FROM trans WHERE state <> prev
""",
)
def q_hysteresis_alarms(spark, sf_dir):
    # OPC-style HYSTERESIS alarm transitions (the alarm-deadband semantics
    # industrial historians layer over raw telemetry; complements
    # q_deadband_filter's value deadband): per series, the alarm SETS when
    # value >= 400 and CLEARS only when value <= 100 — values between hold
    # the previous state, so noise around one threshold cannot chatter.
    # The stateful recurrence decomposes into two per-series windows (the
    # asof_join forward-fill idiom): a set/clear signal forward-filled
    # with last(ignorenulls), then a lag to emit only transitions. Honest
    # scale bound (the q_mad_outliers discipline): both windows partition
    # by event_type, so parallelism = |series| and the per-series sort is
    # the cost — series-keyed telemetry at 100 TB needs series-level
    # partitioning upstream, which the OPC tag model provides naturally.
    # Threshold comparisons are exact double compares; output is rows +
    # strings — no rendering risk.
    ev = _t(spark, sf_dir, "events")
    sig = F.when(F.col("value") >= 400.0, F.lit(1)).when(
        F.col("value") <= 100.0, F.lit(0)
    )
    w_fill = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    filled = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            F.last(sig, ignorenulls=True).over(w_fill), F.lit(0)
        ).alias("state"),
    )
    trans = filled.select(
        "event_type",
        "ts",
        "event_id",
        "state",
        F.coalesce(F.lag("state").over(w_lag), F.lit(0)).alias("prev"),
    )
    return trans.filter(F.col("state") != F.col("prev")).select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.col("state") == 1, F.lit("SET"))
        .otherwise(F.lit("CLEAR"))
        .alias("transition"),
    )


@register(
    "q_rolling_zscore",
    """
WITH w AS (
    SELECT event_id, event_type, ts, value,
           sum(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 64 PRECEDING AND 1 PRECEDING) AS sx,
           sum(CAST(value * value AS DECIMAL(28,4)))
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 64 PRECEDING AND 1 PRECEDING) AS sxx,
           count(value)
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 64 PRECEDING AND 1 PRECEDING) AS n
    FROM events
),
z AS (
    SELECT event_id, event_type, ts, value, n,
           (value - CAST(sx AS DOUBLE) / n)
           / sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                  / (n - 1)) AS z
    FROM w
    WHERE n >= 16
      AND (CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) > 0
)
SELECT event_id, event_type, ts, value, printf('%.9e', z) AS z
FROM z WHERE abs(z) > 3.0
""",
)
def q_rolling_zscore(spark, sf_dir):
    # ROLLING-window anomaly detection — the telemetry form of the
    # z-score gate (q_anomaly_zscore is per-key GLOBAL): each event is
    # scored against the 64 PRECEDING observations of its own series
    # (frame excludes the current row, so an outlier never dilutes its
    # own baseline), flagging |z| > 3 with at least 16 prior points.
    # Cross-engine determinism: the frame sums go through DECIMAL (a
    # sliding-frame double sum differs between Spark's running-frame
    # evaluation and DuckDB's segment-tree order), the variance/z chain
    # is then an identical double-op sequence on identical inputs, and z
    # renders %.9e (sxx's decimal(28,4)->double cast can pass 2^53 — the
    # repo rendering rule). One window exchange on event_type; the
    # per-series sort is the honest bound, as q_hysteresis_alarms.
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-64, -1)
    )
    sx = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    sxx = F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)")).over(w)
    n = F.count("value").over(w)
    base = ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        sx.alias("sx"),
        sxx.alias("sxx"),
        n.alias("n"),
    )
    var = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("value") - F.col("sx").cast("double") / F.col("n")) / F.sqrt(var)
    return (
        base.filter((F.col("n") >= 16) & (var > 0))
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            z.alias("_z"),
        )
        .filter(F.abs(F.col("_z")) > 3.0)
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            sci9(F.col("_z")).alias("z"),
        )
    )


@register(
    "q_cdc_apply",
    """
WITH log AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type = 'error' THEN 'delete'
                ELSE 'upsert' END AS op
    FROM events
),
latest AS (
    SELECT user_id, ts, event_id, value, op,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM log
)
SELECT user_id, value AS current_value, ts AS version_ts
FROM latest WHERE rn = 1 AND op = 'upsert'
""",
)
def q_cdc_apply(spark, sf_dir):
    # CDC changelog APPLY with tombstones (the Debezium-compaction
    # semantics; generalizes A3's last-value upsert, reference:
    # OPC2MongoDB/Program.cs:1179-1182, with DELETE): treating 'error'
    # events as delete markers, reconstruct the current state — each
    # key's LATEST operation wins by (ts, event_id) version order, and a
    # winning tombstone removes the key entirely. Spark folds the whole
    # reduction into ONE map-side-combinable groupBy via struct-max
    # (lexicographic (ts, event_id, ...) max = the latest op — no window,
    # no second pass); the tombstone filter runs on the |keys|-row
    # result. The oracle keeps the naive window form, cross-validating
    # the aggregate rewrite.
    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    latest = log.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "op", "value")).alias("m")
    )
    return latest.filter(F.col("m.op") == "upsert").select(
        "user_id",
        F.col("m.value").alias("current_value"),
        F.col("m.ts").alias("version_ts"),
    )


@register(
    "q_bot_regularity",
    """
WITH g AS (
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
    FROM events
),
s AS (
    SELECT user_id,
           count(gap_s) AS n_gaps,
           sum(gap_s) AS sg,
           sum(gap_s * gap_s) AS sgg
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY user_id
)
SELECT user_id,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST((sg * 1000000) // n_gaps AS BIGINT) AS mean_gap_us,
       CAST(floor(sqrt((CAST(sgg AS DOUBLE)
                        - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps)
                       / (n_gaps - 1))
                  / (CAST(sg AS DOUBLE) / n_gaps) * 1000000000.0)
            AS BIGINT) AS cv_e9,
       (sqrt((CAST(sgg AS DOUBLE)
              - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps)
             / (n_gaps - 1))
        / (CAST(sg AS DOUBLE) / n_gaps)) < 0.3 AS is_regular
FROM s
WHERE n_gaps >= 20 AND sg > 0
""",
)
def q_bot_regularity(spark, sf_dir):
    # BOT / automation detection by inter-event regularity — a standard
    # LLM-corpus curation gate (machine traffic produces suspiciously
    # regular cadences; humans are bursty): per user, the coefficient of
    # variation of whole-second inter-event gaps; CV < 0.3 over >= 20
    # gaps flags metronomic actors. The OUTPUT is integer-exact end to
    # end: gaps are floor-epoch-second BIGINTs (per-user sums far inside
    # int64, bitwise cross-engine), the mean renders as integer-DIV
    # microseconds and the CV as floor(cv * 1e9) — %.9e was MEASURED
    # flapping here (n_gaps = 64 makes sg/n an exact dyadic double whose
    # 10th significant digit is an exact tie; Java format_string rounds
    # half-up, C printf half-even), so nothing double ever renders. The
    # double CV chain itself is an identical op sequence on identical
    # inputs (sqrt is IEEE exactly-rounded), so floor/threshold stay
    # bitwise-safe. One lag window + one combinable groupBy, both on
    # user_id — a single exchange serves both.
    ev = _t(spark, sf_dir, "events").repartition(F.col("user_id"))
    sec = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000)
    ).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.sum("gap_s").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sgg"),
    )
    mean = F.col("sg").cast("double") / F.col("n_gaps")
    cv = (
        F.sqrt(
            (
                F.col("sgg").cast("double")
                - F.col("sg").cast("double")
                * F.col("sg").cast("double")
                / F.col("n_gaps")
            )
            / (F.col("n_gaps") - 1)
        )
        / mean
    )
    return s.filter((F.col("n_gaps") >= 20) & (F.col("sg") > 0)).select(
        "user_id",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.expr("CAST(sg * 1000000 DIV n_gaps AS BIGINT)").alias(
            "mean_gap_us"
        ),
        F.floor(cv * F.lit(1000000000.0)).cast("bigint").alias("cv_e9"),
        (cv < 0.3).alias("is_regular"),
    )


@register(
    "q_tokenizer_fertility",
    """
WITH d AS (
    SELECT lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(length(text) AS BIGINT) AS n_char,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_byte
    FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       sum(n_tok) AS total_tokens,
       CAST(sum(n_char) AS DOUBLE) / sum(n_tok) AS chars_per_token,
       CAST(sum(n_byte) AS DOUBLE) / sum(n_tok) AS bytes_per_token,
       CAST(sum(n_tok) AS DOUBLE) / count(*) AS tokens_per_doc
FROM d GROUP BY lang
""",
)
def q_tokenizer_fertility(spark, sf_dir):
    # Tokenizer FERTILITY profile per language — the corpus-budgeting
    # numbers an LLM data pipeline reads before training (how many tokens
    # a language yields per char/byte decides mix weights and context
    # budgets; high bytes-per-token languages are the BPE pain points).
    # One map pass + one combinable groupBy to a |langs|-row frame. All
    # sums are BIGINT-exact (far below 2^53 at any gate SF), so the final
    # single divisions are exactly-rounded identical doubles on both
    # engines — plain double output, no rendering risk (the %.9e rule
    # applies to ulp-divergent values, not bitwise-equal ones).
    from opc2mongodb_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        token_count(F.col("text")).cast("bigint").alias("n_tok"),
        F.length("text").cast("bigint").alias("n_char"),
        F.octet_length("text").cast("bigint").alias("n_byte"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.sum("n_char").cast("double") / F.sum("n_tok")).alias(
            "chars_per_token"
        ),
        (F.sum("n_byte").cast("double") / F.sum("n_tok")).alias(
            "bytes_per_token"
        ),
        (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias(
            "tokens_per_doc"
        ),
    )


@register(
    "q_prefix_dup",
    """
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
g AS (
    SELECT md5(substr(norm, 1, 200)) AS prefix_fp,
           count(*) AS n_docs,
           CAST(count(DISTINCT md5(norm)) AS BIGINT) AS n_distinct_full,
           CAST(min(length(norm)) AS BIGINT) AS min_len,
           CAST(max(length(norm)) AS BIGINT) AS max_len,
           min(doc_id) AS keep_doc
    FROM n GROUP BY 1
)
SELECT prefix_fp, n_docs, n_distinct_full, min_len, max_len, keep_doc,
       (n_distinct_full > 1) AS is_truncation_family
FROM g WHERE n_docs > 1
""",
)
def q_prefix_dup(spark, sf_dir):
    # PREFIX-duplication detection — the crawl-truncation artifact class
    # exact dedup misses (page fetched twice, once cut short: full-text
    # fingerprints differ, first-200-chars fingerprints collide).
    # Families with n_distinct_full > 1 are truncation/extension families
    # (keep the min-id representative, usually the longest fetch wins in
    # a richer policy); == 1 are plain exact-dup groups, cross-checking
    # q_dedup_exact. One map pass (normalize + two md5s) into one
    # combinable groupBy on the 16-byte prefix hash — text itself never
    # shuffles, the count(DISTINCT full_fp) expands to at most the
    # family size. Integer/string output, no rendering risk.
    from opc2mongodb_spark.functions.text import normalize_text

    n = _t(spark, sf_dir, "documents").select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    )
    g = (
        n.select(
            "doc_id",
            F.md5(F.substring("norm", 1, 200)).alias("prefix_fp"),
            F.md5("norm").alias("full_fp"),
            F.length("norm").cast("bigint").alias("nlen"),
        )
        .groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("full_fp").cast("bigint").alias("n_distinct_full"),
            F.min("nlen").alias("min_len"),
            F.max("nlen").alias("max_len"),
            F.min("doc_id").alias("keep_doc"),
        )
    )
    return g.filter(F.col("n_docs") > 1).select(
        "prefix_fp",
        "n_docs",
        "n_distinct_full",
        "min_len",
        "max_len",
        "keep_doc",
        (F.col("n_distinct_full") > 1).alias("is_truncation_family"),
    )


@register(
    "q_feature_nzv",
    """
WITH f AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
               AS n_purchases,
           CAST(count(*) FILTER (value > 400.0) AS BIGINT) AS n_high
    FROM events GROUP BY user_id
),
u AS (
    SELECT 'n_events' AS feature, n_events AS v FROM f
    UNION ALL SELECT 'n_types', n_types FROM f
    UNION ALL SELECT 'n_purchases', n_purchases FROM f
    UNION ALL SELECT 'n_high', n_high FROM f
),
s AS (
    SELECT feature,
           count(*) AS n,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           CAST(max(cnt) AS BIGINT) AS mode_count
    FROM u
    JOIN (SELECT feature AS f2, v AS v2, count(*) AS cnt
          FROM u GROUP BY 1, 2) m
      ON m.f2 = u.feature AND m.v2 = u.v
    GROUP BY feature
)
SELECT feature, n, n_distinct, mode_count,
       CAST(mode_count * 1000000 // n AS BIGINT) AS mode_share_ppm,
       (n_distinct <= 2 OR mode_count * 20 >= n * 19)
           AS near_zero_variance
FROM s
""",
)
def q_feature_nzv(spark, sf_dir):
    # NEAR-ZERO-VARIANCE feature screen (the caret::nearZeroVar gate) over
    # the per-user feature frame q_feature_corr builds: a feature whose
    # mode covers >= 95% of rows (or with <= 2 distinct values) carries no
    # signal and destabilizes downstream encoders — drop it before
    # training. One events pass builds the |users| x 4 frame; stack()
    # unpivots it; the mode count per feature comes from a (feature,
    # value) rollup joined back (both frames |features| x |distinct|-
    # bounded, broadcast-sized). All-integer output: mode share renders
    # as ppm via integer DIV (the q_bot_regularity rendering rule).
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.count_if(F.col("event_type") == "purchase")
        .cast("bigint")
        .alias("n_purchases"),
        F.count_if(F.col("value") > 400.0).cast("bigint").alias("n_high"),
    )
    u = f.select(
        F.expr(
            "stack(4, 'n_events', n_events, 'n_types', n_types, "
            "'n_purchases', n_purchases, 'n_high', n_high) AS (feature, v)"
        )
    )
    per_val = u.groupBy("feature", "v").agg(F.count(F.lit(1)).alias("cnt"))
    s = per_val.groupBy("feature").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("cnt").cast("bigint").alias("mode_count"),
    )
    return s.select(
        "feature",
        "n",
        "n_distinct",
        "mode_count",
        F.expr("CAST(mode_count * 1000000 DIV n AS BIGINT)").alias(
            "mode_share_ppm"
        ),
        (
            (F.col("n_distinct") <= 2)
            | (F.col("mode_count") * 20 >= F.col("n") * 19)
        ).alias("near_zero_variance"),
    )


@register(
    "q_window_nth",
    """
SELECT event_id, event_type, ts,
       first_value(value) OVER w AS first_in_hour,
       nth_value(value, 3) OVER w AS third_in_hour,
       last_value(value) OVER (PARTITION BY event_type, date_trunc('hour', ts)
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING)
           AS last_in_hour
FROM events
WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_window_nth(spark, sf_dir):
    # Positional window functions (F1 completion): first_value /
    # nth_value(3) over the running frame and last_value over the FULL
    # frame, per (series, hour) — the session-opening/third-touch/
    # session-closing values an attribution query reads. The full-frame
    # last_value requires the explicit UNBOUNDED FOLLOWING frame on both
    # engines (the default frame would return the CURRENT row — the
    # classic last_value footgun, pinned here identically). One exchange:
    # all three windows share the (event_type, hour) partitioning and
    # (ts, event_id) collision-free order. Raw value passthrough — no
    # arithmetic, no rendering risk.
    ev = _t(spark, sf_dir, "events")
    part = [F.col("event_type"), F.date_trunc("hour", F.col("ts"))]
    run = (
        Window.partitionBy(*part)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy(*part)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.first("value").over(run).alias("first_in_hour"),
        F.nth_value("value", 3).over(run).alias("third_in_hour"),
        F.last("value").over(full).alias("last_in_hour"),
    )


@register(
    "q_burst_detection",
    """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
    FROM events GROUP BY 1, 2
),
ctx AS (
    SELECT event_type, h, c,
           sum(c) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS base,
           count(*) OVER (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS nb
    FROM hourly
)
SELECT event_type, h,
       CAST(c AS BIGINT) AS c,
       CAST(base AS BIGINT) AS baseline_total,
       CAST(nb AS BIGINT) AS baseline_hours,
       CAST(c AS DOUBLE) * nb / base AS burst_ratio
FROM ctx
WHERE nb >= 12 AND base > 0 AND c * nb >= 3 * base
""",
)
def q_burst_detection(spark, sf_dir):
    # BURST detection over the hourly series (the Kleinberg-style rate
    # spike gate, telemetry form): an hour whose count is >= 3x its own
    # series' trailing-24h mean (>= 12 baseline hours required) is a
    # burst. Two passes, both bounded: a combinable groupBy to the
    # |series| x |hours| rollup, then frame windows over that SMALL
    # rollup (never raw events — the window input is already aggregate-
    # sized, so the per-series sort is ~|hours| rows). The burst test is
    # cross-multiplied in integers (c * nb >= 3 * base — no division in
    # the FILTER), and burst_ratio is one division of bitwise-identical
    # integer-derived doubles — plain double output, no rendering risk.
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    ctx = hourly.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w).alias("base"),
        F.count(F.lit(1)).over(w).alias("nb"),
    )
    return ctx.filter(
        (F.col("nb") >= 12)
        & (F.col("base") > 0)
        & (F.col("c") * F.col("nb") >= 3 * F.col("base"))
    ).select(
        "event_type",
        "h",
        F.col("c").cast("bigint").alias("c"),
        F.col("base").cast("bigint").alias("baseline_total"),
        F.col("nb").cast("bigint").alias("baseline_hours"),
        (F.col("c").cast("double") * F.col("nb") / F.col("base")).alias(
            "burst_ratio"
        ),
    )


@register(
    "q_lateness_profile",
    """
WITH o AS (
    SELECT event_type, event_id, ts,
           max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS seen_max
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(count(*) FILTER (ts < seen_max) AS BIGINT) AS n_late,
       CAST(count(*) FILTER (ts < seen_max) * 1000000 // count(*) AS BIGINT)
           AS late_ppm,
       CAST(coalesce(max(CASE WHEN ts < seen_max
                              THEN epoch_us(seen_max) - epoch_us(ts) END), 0)
            AS BIGINT) AS max_lateness_us
FROM o GROUP BY event_type
""",
)
def q_lateness_profile(spark, sf_dir):
    # Event-time LATENESS profile — the number a streaming deployment
    # reads to SIZE ITS WATERMARK (SURVEY H4): treating event_id as the
    # arrival order, an event is late iff its event time precedes the
    # running max event time already seen in its series; report the late
    # fraction (ppm, integer DIV) and the worst lateness in exact
    # microseconds — withWatermark(max_lateness) would have dropped
    # nothing. One running-max window + one combinable groupBy sharing
    # the event_type exchange. All-integer output, no rendering risk.
    ev = _t(spark, sf_dir, "events").repartition(F.col("event_type"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = ev.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("seen_max"),
    )
    late = F.col("ts") < F.col("seen_max")
    lateness = F.unix_micros(F.col("seen_max").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    return o.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(late).cast("bigint").alias("n_late"),
        F.expr(
            "CAST(count_if(ts < seen_max) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("late_ppm"),
        F.coalesce(F.max(F.when(late, lateness)), F.lit(0))
        .cast("bigint")
        .alias("max_lateness_us"),
    )


@register(
    "q_mmr_rerank",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 4),
scored AS (
    SELECT q.qid, e.vec_id AS id, e.v AS vec,
           {_COS.format(a="qv", b="v")} AS rel
    FROM q, e WHERE e.vec_id <> q.qid
),
cand AS (
    SELECT qid, id, vec, rel FROM (
        SELECT qid, id, vec, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, id) AS rn
        FROM scored) WHERE rn <= 8
),
p1 AS (
    SELECT qid, id, vec FROM (
        SELECT qid, id, vec,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY 0.5 * rel - 0.5 * 0.0 DESC,
                                           id) AS rn
        FROM cand) WHERE rn = 1
),
r1 AS (
    SELECT c.qid, c.id, c.vec, c.rel,
           {_COS.format(a="c.vec", b="p1.vec")} AS ms
    FROM cand c JOIN p1 USING (qid) WHERE c.id <> p1.id
),
p2 AS (
    SELECT qid, id, vec FROM (
        SELECT qid, id, vec,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY 0.5 * rel - 0.5 * ms DESC,
                                           id) AS rn
        FROM r1) WHERE rn = 1
),
r2 AS (
    SELECT t.qid, t.id, t.rel,
           CASE WHEN t.s2 > t.ms THEN t.s2 ELSE t.ms END AS ms
    FROM (
        SELECT r1.qid, r1.id, r1.rel, r1.ms,
               {_COS.format(a="r1.vec", b="p2.vec")} AS s2
        FROM r1 JOIN p2 USING (qid) WHERE r1.id <> p2.id
    ) t
),
p3 AS (
    SELECT qid, id FROM (
        SELECT qid, id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY 0.5 * rel - 0.5 * ms DESC,
                                           id) AS rn
        FROM r2) WHERE rn = 1
)
SELECT qid, id AS doc_id, CAST(1 AS INTEGER) AS mmr_rank FROM p1
UNION ALL SELECT qid, id AS doc_id, CAST(2 AS INTEGER) FROM p2
UNION ALL SELECT qid, id AS doc_id, CAST(3 AS INTEGER) FROM p3
""",
)
def q_mmr_rerank(spark, sf_dir):
    # MMR diversity re-ranking (operators/similarity.py::mmr_rerank) as a
    # registry query: 4 query vectors, top-8 cosine candidates each
    # (JVM-side vectors.cosine — the sequential fold that is bitwise
    # DuckDB's list_dot_product), then greedy lam=0.5 MMR for 3 picks.
    # The ORACLE unrolls the greedy into three window-argmax stages with
    # the IDENTICAL float op sequence (dot/(norm*norm), `>` max update,
    # 0.5*rel - 0.5*ms objective, id tiebreak), so the pick ORDER — the
    # thing a float-argmax could flap on — is cross-engine exact; output
    # is integer ranks only (the mmr_score doubles are bitwise-equal too
    # but stay out of the hash surface by the defensive-rendering rule).
    # lam=0.5 is dyadic so 1-lam is exact on both engines.
    from opc2mongodb_spark.functions.vectors import cosine
    from opc2mongodb_spark.operators.similarity import mmr_rerank

    e = _t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
            cosine(F.col("qv"), F.col("embedding")).alias("rel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("id"))
    cand = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 8
    )
    out = mmr_rerank(
        cand, k=3, lam=0.5, query_col="qid", id_col="id",
        score_col="rel", vec_col="vec",
    )
    return out.select("qid", F.col("id").alias("doc_id"), "mmr_rank")


@register(
    "q_growth_accounting",
    """
WITH uw AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
seq AS (
    SELECT user_id, wk,
           lag(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
           lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
    FROM uw
),
span AS (SELECT max(wk) AS max_wk FROM uw),
active AS (
    SELECT wk,
           CAST(count(*) FILTER (prev_wk IS NULL) AS BIGINT) AS n_new,
           CAST(count(*) FILTER (prev_wk = wk - INTERVAL 7 DAY) AS BIGINT)
               AS n_retained,
           CAST(count(*) FILTER (prev_wk IS NOT NULL
                                 AND prev_wk < wk - INTERVAL 7 DAY)
                AS BIGINT) AS n_resurrected
    FROM seq GROUP BY wk
),
churn AS (
    SELECT wk + INTERVAL 7 DAY AS wk,
           CAST(count(*) AS BIGINT) AS n_churned
    FROM seq, span
    WHERE (next_wk IS NULL OR next_wk > wk + INTERVAL 7 DAY)
      AND wk + INTERVAL 7 DAY <= max_wk
    GROUP BY 1
)
SELECT CAST(a.wk AS DATE) AS wk, a.n_new, a.n_retained, a.n_resurrected,
       coalesce(c.n_churned, 0) AS n_churned
FROM active a LEFT JOIN churn c ON c.wk = a.wk
""",
)
def q_growth_accounting(spark, sf_dir):
    # GROWTH ACCOUNTING — the new / retained / resurrected / churned
    # weekly quadruple (the Social-Capital framework every product
    # analytics stack ships; complements q_dau_wau's stickiness and
    # q_cohort_retention's triangle): classify each user-week by the
    # user's previous active week (none -> new; exactly last week ->
    # retained; older -> resurrected) and charge a churn to week W+1 for
    # every active week W whose NEXT activity is not W+1 (bounded by the
    # observed horizon so the last week doesn't accuse everyone). Scale
    # shape: one distinct to the |users|x|weeks| frame, one user-
    # partitioned lag/lead window, two combinable groupBys to |weeks|
    # rows, one broadcast-able 1-row max join. All-integer output.
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    seq = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    week = F.expr("INTERVAL 7 DAY")
    active = seq.groupBy("wk").agg(
        F.count_if(F.col("prev_wk").isNull()).cast("bigint").alias("n_new"),
        F.count_if(F.col("prev_wk") == F.col("wk") - week)
        .cast("bigint")
        .alias("n_retained"),
        F.count_if(
            F.col("prev_wk").isNotNull()
            & (F.col("prev_wk") < F.col("wk") - week)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    span = uw.agg(F.max("wk").alias("max_wk"))
    churn = (
        seq.crossJoin(F.broadcast(span))
        .filter(
            (F.col("next_wk").isNull() | (F.col("next_wk") > F.col("wk") + week))
            & (F.col("wk") + week <= F.col("max_wk"))
        )
        .groupBy((F.col("wk") + week).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return active.join(churn, "wk", "left").select(
        F.to_date("wk").alias("wk"),
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0).cast("bigint")).alias(
            "n_churned"
        ),
    )


@register(
    "q_simpson_diversity",
    """
WITH c AS (
    SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
),
s AS (
    SELECT source,
           sum(n) AS total,
           sum(n * (n - 1)) AS pairs_same,
           CAST(count(*) AS BIGINT) AS n_langs
    FROM c GROUP BY source
)
SELECT source,
       CAST(total AS BIGINT) AS total,
       n_langs,
       CAST(1000000 - (pairs_same * 1000000) // (total * (total - 1))
            AS BIGINT) AS simpson_ppm
FROM s WHERE total > 1
""",
)
def q_simpson_diversity(spark, sf_dir):
    # Simpson diversity index per source — the corpus-mix concentration
    # audit (1 - sum n_i(n_i-1) / N(N-1), the unbiased "probability two
    # random docs differ in language" form; complements q_lang_entropy's
    # Shannon view with the collision view sampling theory prefers).
    # Two combinable groupBys to a |source|x|lang| then |source| frame;
    # ENTIRELY integer arithmetic — the ppm renders via integer DIV
    # (q_bot_regularity rule), so there is no float anywhere at all.
    ev = _t(spark, sf_dir, "documents")
    c = ev.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    s = c.groupBy("source").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("pairs_same"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return s.filter(F.col("total") > 1).select(
        "source",
        F.col("total").cast("bigint").alias("total"),
        "n_langs",
        F.expr(
            "CAST(1000000 - (pairs_same * 1000000) DIV (total * (total - 1))"
            " AS BIGINT)"
        ).alias("simpson_ppm"),
    )


@register(
    "q_wow_change",
    """
WITH wk AS (
    SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS wk,
           count(*) AS c
    FROM events GROUP BY 1, 2
),
lagged AS (
    SELECT event_type, wk, c,
           lag(c) OVER (PARTITION BY event_type ORDER BY wk) AS prev_c,
           lag(wk) OVER (PARTITION BY event_type ORDER BY wk) AS prev_wk
    FROM wk
)
SELECT event_type, wk, CAST(c AS BIGINT) AS c,
       CAST(prev_c AS BIGINT) AS prev_c,
       CASE WHEN prev_wk = wk - INTERVAL 7 DAY AND prev_c > 0
            THEN CAST(((c - prev_c) * 1000000) // prev_c AS BIGINT)
            END AS wow_change_ppm
FROM lagged
""",
)
def q_wow_change(spark, sf_dir):
    # Week-over-week change per series — the trend cell every metrics
    # dashboard leads with: signed ppm delta vs the previous week, NULL
    # when the previous row is not actually the ADJACENT week (a gap
    # week must not masquerade as a gentle trend) or when it is zero.
    # One combinable groupBy to the |series|x|weeks| frame, one lag
    # window over that small rollup. Integer-exact end to end; the
    # SIGNED integer division is safe because BOTH engines truncate
    # toward zero on integer division (Spark DIV and DuckDB `//`,
    # verified empirically: -20000000//31 = -645161 on both) — the
    # floor-vs-trunc divergence only exists for floating `//`.
    ev = _t(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("wk")
    lagged = wk.select(
        "event_type",
        "wk",
        "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lag("wk").over(w).alias("prev_wk"),
    )
    q = F.expr("CAST(((c - prev_c) * 1000000) DIV prev_c AS BIGINT)")
    return lagged.select(
        "event_type",
        "wk",
        F.col("c").cast("bigint").alias("c"),
        F.col("prev_c").cast("bigint").alias("prev_c"),
        F.when(
            (F.col("prev_wk") == F.date_sub(F.col("wk"), 7))
            & (F.col("prev_c") > 0),
            q,
        ).alias("wow_change_ppm"),
    )


@register(
    "q_sax_symbols",
    """
WITH latest AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events
),
w64 AS (SELECT event_type, value, rk FROM latest WHERE rk <= 64),
stats AS (
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 64 AS mu,
           sqrt((CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE)
                 - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 64)
                / 63) AS sd,
           count(*) AS n
    FROM w64 GROUP BY event_type HAVING count(*) = 64
),
paa AS (
    SELECT event_type, CAST((rk - 1) // 8 AS INTEGER) AS seg,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 8 AS m
    FROM w64 GROUP BY 1, 2
),
sym AS (
    SELECT p.event_type, p.seg,
           CASE WHEN s.sd = 0 THEN 'b'
                WHEN (p.m - s.mu) / s.sd < -0.6745 THEN 'a'
                WHEN (p.m - s.mu) / s.sd < 0.0     THEN 'b'
                WHEN (p.m - s.mu) / s.sd < 0.6745  THEN 'c'
                ELSE 'd' END AS ch
    FROM paa p JOIN stats s USING (event_type)
)
SELECT event_type, string_agg(ch, '' ORDER BY seg) AS sax
FROM sym GROUP BY event_type
""",
)
def q_sax_symbols(spark, sf_dir):
    # SAX symbolization (Lin/Keogh/Lonardi/Chiu 2003) of each series'
    # LATEST-64 window: z-normalize, Piecewise Aggregate Approximation
    # into 8 segments of 8 points, band each segment mean into a 4-symbol
    # alphabet at the standard-normal quartile breakpoints (+-0.6745) —
    # the index-friendly discrete signature for motif/novelty search over
    # telemetry. Cross-engine exactness: the window picks exactly 64 rows
    # with a unique (ts desc, event_id desc) order; segment/window sums
    # are DECIMAL; /64 and /8 are divisions by powers of two (exact on
    # exact inputs); sd is one IEEE sqrt; the band COMPARES are then on
    # bitwise-identical doubles, and the OUTPUT is pure strings.
    # Newest-first segment order is pinned by rk on both engines. The
    # per-series bound is the q_theilsen/latest-64 discipline: the window
    # is capped, so the sort is bounded per series.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w64 = (
        ev.select("event_type", "value", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 64)
    )
    sx = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    sxx = F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)")).cast(
        "double"
    )
    stats = (
        w64.groupBy("event_type")
        .agg(
            (sx / 64).alias("mu"),
            F.sqrt((sxx - sx * sx / 64) / 63).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == 64)
    )
    paa = w64.groupBy(
        "event_type",
        F.expr("CAST((rk - 1) DIV 8 AS INTEGER)").alias("seg"),
    ).agg((sx / 8).alias("m"))
    z = (F.col("m") - F.col("mu")) / F.col("sd")
    sym = paa.join(stats, "event_type").select(
        "event_type",
        "seg",
        F.when(F.col("sd") == 0, F.lit("b"))
        .when(z < -0.6745, F.lit("a"))
        .when(z < 0.0, F.lit("b"))
        .when(z < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("ch"),
    )
    return sym.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seg", "ch"))
                ),
                lambda s: s.getField("ch"),
            ),
            "",
        ).alias("sax")
    )


@register(
    "q_srm_check",
    """
WITH a AS (
    SELECT CASE WHEN CAST(CAST(('0x' || substring(md5('srm:' ||
                          CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 AS INTEGER) < 50
                THEN 'treatment' ELSE 'control' END AS arm
    FROM (SELECT DISTINCT user_id FROM events)
),
c AS (
    SELECT CAST(count(*) FILTER (arm = 'treatment') AS BIGINT) AS n_t,
           CAST(count(*) FILTER (arm = 'control') AS BIGINT) AS n_c,
           count(*) AS n
    FROM a
)
SELECT n_t, n_c, CAST(n AS BIGINT) AS n,
       (CAST(n_t AS DOUBLE) - n * 0.5) * (CAST(n_t AS DOUBLE) - n * 0.5)
           / (n * 0.5)
       + (CAST(n_c AS DOUBLE) - n * 0.5) * (CAST(n_c AS DOUBLE) - n * 0.5)
           / (n * 0.5) AS chi2_stat,
       ((CAST(n_t AS DOUBLE) - n * 0.5) * (CAST(n_t AS DOUBLE) - n * 0.5)
           / (n * 0.5)
        + (CAST(n_c AS DOUBLE) - n * 0.5) * (CAST(n_c AS DOUBLE) - n * 0.5)
           / (n * 0.5)) > 3.841 AS srm_alarm
FROM c
""",
)
def q_srm_check(spark, sf_dir):
    # Sample-Ratio Mismatch audit — the FIRST check any A/B platform runs
    # before reading an experiment (a 50/50 md5 assignment whose observed
    # split chi-squares away from 50/50 means broken randomization, and
    # every downstream lift number is garbage; completes the experiment
    # suite next to q_abtest_lift and q_chi2_independence). Assignment is
    # the sharding family's md5-prefix discipline (seeded, replayable);
    # one distinct + one 1-row combinable rollup. The chi2 statistic is
    # exact-integer inputs through an identical double op chain (0.5 and
    # 3.841 are literals on both engines) — plain double output, alarm at
    # the df=1, alpha=0.05 critical value.
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint") % 100
    a = users.select(
        F.when(bucket < 50, F.lit("treatment"))
        .otherwise(F.lit("control"))
        .alias("arm")
    )
    c = a.agg(
        F.count_if(F.col("arm") == "treatment").cast("bigint").alias("n_t"),
        F.count_if(F.col("arm") == "control").cast("bigint").alias("n_c"),
        F.count(F.lit(1)).alias("n"),
    )
    def dev(col):
        d = col.cast("double") - F.col("n") * 0.5
        return d * d / (F.col("n") * 0.5)
    chi2 = dev(F.col("n_t")) + dev(F.col("n_c"))
    return c.select(
        "n_t",
        "n_c",
        F.col("n").cast("bigint").alias("n"),
        chi2.alias("chi2_stat"),
        (chi2 > 3.841).alias("srm_alarm"),
    )

"""Query registrations: r8 batches 14-23: funnel latency, power analysis, SLO burn, LTV, entropy profiles, ACF/Ljung-Box, survival, retention fits, attribution shapes.

Mechanically split from the original single-module registry (r9);
registration order and bodies unchanged. Determinism rulebook:
the package docstring (queries/__init__.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opc2mongodb_spark.queries._core import _t, dec, register, sci9

@register(
    "q_markov_cond_entropy",
    """
WITH seq AS (
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
c AS (
    SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL
    GROUP BY cur, nxt
),
tot AS (
    SELECT cur, sum(n) AS nc FROM c GROUP BY cur
),
terms AS (
    SELECT c.cur,
           CAST((CAST(c.n AS DOUBLE) / t.nc)
                * ln(CAST(c.n AS DOUBLE) / t.nc) AS DECIMAL(18,12)) AS plnp
    FROM c JOIN tot t USING (cur)
)
SELECT t.cur AS state, CAST(t.nc AS BIGINT) AS n_transitions,
       printf('%.9e', -CAST(sum(terms.plnp) AS DOUBLE)) AS next_entropy
FROM terms JOIN tot t USING (cur)
GROUP BY t.cur, t.nc
""",
)
def q_markov_cond_entropy(spark, sf_dir):
    # Conditional next-event entropy per state — how PREDICTABLE is the
    # journey from each event type (the information-theoretic summary of
    # q_event_transitions' matrix; near-zero = deterministic flow, high =
    # anything can happen next).  One lead window per user, one
    # transition rollup (|states|^2-bounded), pinned p*ln(p) terms (the
    # q_active_hours_entropy discipline), %.9e.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("cur").agg(F.sum("n").alias("nc"))
    p = F.col("n").cast("double") / F.col("nc")
    terms = c.join(tot, "cur").select(
        "cur", (p * F.log(p)).cast("decimal(18,12)").alias("plnp")
    )
    return (
        terms.join(tot, "cur")
        .groupBy(F.col("cur").alias("state"), "nc")
        .agg(
            sci9(-F.sum("plnp").cast("double")).alias("next_entropy")
        )
        .select(
            "state",
            F.col("nc").cast("bigint").alias("n_transitions"),
            "next_entropy",
        )
    )


@register(
    "q_dup_size_histogram",
    """
WITH fp AS (
    SELECT md5(text) AS f, count(*) AS group_size
    FROM documents GROUP BY md5(text)
)
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(group_size * count(*) AS BIGINT) AS n_docs,
       CAST((group_size - 1) * count(*) AS BIGINT) AS removable_docs
FROM fp GROUP BY group_size
""",
)
def q_dup_size_histogram(spark, sf_dir):
    # Duplicate-group size distribution — the dedup PLANNING read over
    # q_dedup_exact's groups: how many exact-copy families exist at each
    # size, how many documents they hold, and how many a keep-one policy
    # removes.  The shape (a few huge families vs many pairs) decides
    # whether collapse-before-join optimizations (the q_setsim_join
    # COLLAPSE_GROUP_BOUND gate) pay off.  Two combinable groupBys on
    # md5 fingerprints — text never shuffles, all integers.
    d = _t(spark, sf_dir, "documents")
    fp = d.groupBy(F.md5("text").alias("f")).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return fp.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        (F.col("group_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
        ((F.col("group_size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("removable_docs"),
    ).select(
        F.col("group_size").cast("bigint").alias("group_size"),
        "n_groups",
        "n_docs",
        "removable_docs",
    )


@register(
    "q_token_dispersion",
    """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
top AS (
    SELECT t, count(*) AS tf FROM tok GROUP BY t
    ORDER BY tf DESC, t LIMIT 20
),
per_doc AS (
    SELECT tok.t, tok.doc_id, count(*) AS c
    FROM tok JOIN top ON top.t = tok.t
    GROUP BY tok.t, tok.doc_id
),
nd AS (SELECT count(*) AS n_docs FROM documents),
s AS (
    SELECT p.t,
           CAST(any_value(nd.n_docs) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS docs_with,
           CAST(sum(p.c) AS BIGINT) AS tf,
           CAST(sum(p.c * p.c) AS BIGINT) AS sqsum
    FROM per_doc p CROSS JOIN nd
    GROUP BY p.t
)
SELECT t AS token, tf, docs_with,
       printf('%.9e', (CAST(sqsum AS DOUBLE) / n_docs
                       - (CAST(tf AS DOUBLE) / n_docs)
                         * (CAST(tf AS DOUBLE) / n_docs))
                      / (CAST(tf AS DOUBLE) / n_docs)) AS fano_burstiness
FROM s
""",
)
def q_token_dispersion(spark, sf_dir):
    # Token dispersion (Fano factor var/mean of per-document counts,
    # zeros included) for the 20 highest-frequency tokens — Church's
    # burstiness: ~1 = Poisson-spread (function words), >>1 = bursty
    # content terms that concentrate in few documents.  Feeds stopword
    # and boilerplate policy next to q_bm25_topk's IDF view.  Scale
    # shape: one explode, the top-20 vocabulary is a LIMIT-bounded frame
    # (unique (tf, t) tiebreak), per-doc counts join against it
    # broadcast, the moment sums are exact integers (population moments
    # computed over ALL docs via the 1-row n_docs anchor — absent rows
    # ARE the zeros, entering only through n_docs).  The Fano chain is
    # identical doubles under %.9e.
    from opc2mongodb_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("t"))
        .limit(20)
        .select("t")
    )
    per_doc = (
        tok.join(F.broadcast(top), "t")
        .groupBy("t", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    s = (
        per_doc.crossJoin(F.broadcast(nd))
        .groupBy("t")
        .agg(
            F.any_value("n_docs").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("docs_with"),
            F.sum("c").cast("bigint").alias("tf"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sqsum"),
        )
    )
    m = F.col("tf").cast("double") / F.col("n_docs")
    fano = (F.col("sqsum").cast("double") / F.col("n_docs") - m * m) / m
    return s.select(
        F.col("t").alias("token"),
        "tf",
        "docs_with",
        sci9(fano).alias("fano_burstiness"),
    )


@register(
    "q_ngram_novelty",
    """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
tri AS (
    SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
    FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
    WHERE len(ts) >= 3
),
dg AS (
    SELECT DISTINCT doc_id, g FROM tri
),
df AS (
    SELECT g, count(*) AS docs FROM dg GROUP BY g
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (f.docs = 1) AS BIGINT) AS unique_grams,
       count(*) FILTER (f.docs = 1) * 1000000000 // count(*)
           AS novelty_ppb
FROM dg d JOIN df f USING (g)
GROUP BY d.doc_id
""",
)
def q_ngram_novelty(spark, sf_dir):
    # Per-document 3-gram novelty — the complement of
    # q_boilerplate_ngrams: the fraction of a document's distinct
    # trigrams that appear in NO other document (docs=1 in the corpus
    # document-frequency table).  High novelty = original text worth
    # keeping; low = templated.  Scale shape: trigram explode ->
    # per-doc DISTINCT -> one df groupBy keyed on the gram (Zipf-
    # bounded), joined back gram-keyed; only hashes of grams would move
    # at corpus scale (here the gram string is the key — the
    # q_boilerplate hash-prefilter is the 100 TB variant, documented
    # there).  All integers, ppb via integer DIV.
    from opc2mongodb_spark.functions.text import tokens

    from opc2mongodb_spark.functions.text import ngram_concat

    d = _t(spark, sf_dir, "documents")
    # zip_with form — the sequence/element_at build re-evaluates the
    # token array per exploded shingle (ngram_concat docstring)
    tri = d.select(
        "doc_id",
        F.explode(ngram_concat(tokens(F.col("text")), 3)).alias("g"),
    )
    dg = tri.distinct()
    df = dg.groupBy("g").agg(F.count(F.lit(1)).alias("docs"))
    return (
        dg.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count_if(F.col("docs") == 1).cast("bigint").alias(
                "unique_grams"
            ),
            F.expr(
                "count_if(docs = 1) * 1000000000 DIV count(*)"
            ).alias("novelty_ppb"),
        )
    )


@register(
    "q_decision_stump",
    """
WITH per AS (
    SELECT user_id,
           CAST(floor(ln(count(*)) / ln(2.0)) AS INT) AS band,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
    FROM events GROUP BY user_id
),
cells AS (
    SELECT band, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(label) AS BIGINT) AS pos
    FROM per GROUP BY band
),
cum AS (
    SELECT band, n, pos,
           sum(n) OVER (ORDER BY band) AS nl,
           sum(pos) OVER (ORDER BY band) AS pl,
           sum(n) OVER () AS nt,
           sum(pos) OVER () AS pt
    FROM cells
)
SELECT CAST(band + 1 AS INT) AS split_at_band,
       CAST(nl AS BIGINT) AS n_left, CAST(nt - nl AS BIGINT) AS n_right,
       CAST(floor(
         ((CAST(nl AS DOUBLE) / nt)
            * (2.0 * (CAST(pl AS DOUBLE) / nl)
                   * (1.0 - CAST(pl AS DOUBLE) / nl))
          + (CAST(nt - nl AS DOUBLE) / nt)
            * (2.0 * (CAST(pt - pl AS DOUBLE) / (nt - nl))
                   * (1.0 - CAST(pt - pl AS DOUBLE) / (nt - nl))))
         * 1000000000.0) AS BIGINT) AS weighted_gini_e9
FROM cum WHERE nl < nt
""",
)
def q_decision_stump(spark, sf_dir):
    # Decision-stump split audit: for the "will this user purchase"
    # label and the log2 activity band feature, the weighted Gini
    # impurity of every candidate threshold — the first split any
    # tree/GBM fits, read directly as a feature-power table (the min row
    # is the stump).  Scale shape: one user rollup, a |bands|-row cell
    # table, cumulative windows on that spine only.  The impurity chain
    # is identical doubles from exact integers under floor(x*1e9).
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.floor(F.log(F.count(F.lit(1)).cast("double")) / F.log(F.lit(2.0)))
        .cast("int")
        .alias("band"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    cells = per.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    wo = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wa = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cells.select(
        "band",
        "n",
        "pos",
        F.sum("n").over(wo).alias("nl"),
        F.sum("pos").over(wo).alias("pl"),
        F.sum("n").over(wa).alias("nt"),
        F.sum("pos").over(wa).alias("pt"),
    )
    nl = F.col("nl").cast("double")
    nt = F.col("nt").cast("double")
    pl = F.col("pl").cast("double")
    pt = F.col("pt").cast("double")
    nr = nt - nl
    pr = pt - pl
    gini = (
        (nl / nt) * (2.0 * (pl / nl) * (1.0 - pl / nl))
        + (nr / nt) * (2.0 * (pr / nr) * (1.0 - pr / nr))
    ) * 1000000000.0
    return cum.filter(F.col("nl") < F.col("nt")).select(
        (F.col("band") + 1).cast("int").alias("split_at_band"),
        F.col("nl").cast("bigint").alias("n_left"),
        (F.col("nt") - F.col("nl")).cast("bigint").alias("n_right"),
        F.floor(gini).cast("bigint").alias("weighted_gini_e9"),
    )


@register(
    "q_alarm_excursions",
    """
WITH flagged AS (
    SELECT event_type, ts, event_id,
           CASE WHEN value > 900 THEN 1 ELSE 0 END AS hot,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS rn,
           row_number() OVER (PARTITION BY event_type,
                              CASE WHEN value > 900 THEN 1 ELSE 0 END
                              ORDER BY ts, event_id) AS rs
    FROM events WHERE value IS NOT NULL
),
runs AS (
    SELECT event_type, count(*) AS dur
    FROM flagged WHERE hot = 1
    GROUP BY event_type, rn - rs
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_excursions,
       CAST(max(dur) AS BIGINT) AS max_duration,
       CAST(sum(dur) AS BIGINT) AS hot_samples,
       sum(dur) * 1000 // count(*) AS mean_duration_e3
FROM runs GROUP BY event_type
""",
)
def q_alarm_excursions(spark, sf_dir):
    # Alarm-excursion run-length distribution — the alarm-fatigue metric
    # over a fixed threshold (value > 900): how many above-threshold
    # episodes each series has, how long they last.  Long excursions =
    # real incidents; swarms of 1-sample spikes = a threshold that needs
    # q_hysteresis_alarms' dead zone.  Gaps-and-islands via the rn - rs
    # difference (both row_numbers share the event_type exchange; the
    # same trick as q_activity_streaks/q_flatline_runs, here keyed by the
    # boolean state).  All integers, mean duration via integer DIV at e3.
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hot = F.when(F.col("value") > 900, 1).otherwise(0)
    w1 = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w2 = Window.partitionBy("event_type", "hot").orderBy("ts", "event_id")
    flagged = (
        ev.select("event_type", "ts", "event_id", hot.alias("hot"))
        .withColumn("rn", F.row_number().over(w1))
        .withColumn("rs", F.row_number().over(w2))
        .select("event_type", "hot", "rn", "rs")
    )
    runs = (
        flagged.filter(F.col("hot") == 1)
        .groupBy("event_type", (F.col("rn") - F.col("rs")).alias("isl"))
        .agg(F.count(F.lit(1)).alias("dur"))
    )
    return runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_excursions"),
        F.max("dur").cast("bigint").alias("max_duration"),
        F.sum("dur").cast("bigint").alias("hot_samples"),
        F.expr("sum(dur) * 1000 DIV count(*)").alias("mean_duration_e3"),
    )


@register(
    "q_capture_recapture",
    """
WITH wk AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
    FROM events
),
anchor AS (
    SELECT min(w) AS w0 FROM wk
),
flags AS (
    SELECT user_id,
           max(CASE WHEN w = a.w0 THEN 1 ELSE 0 END) AS in1,
           max(CASE WHEN w = a.w0 + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS in2
    FROM wk CROSS JOIN anchor a
    GROUP BY user_id
)
SELECT CAST(sum(in1) AS BIGINT) AS n_week1,
       CAST(sum(in2) AS BIGINT) AS n_week2,
       CAST(count(*) FILTER (in1 = 1 AND in2 = 1) AS BIGINT) AS recaptured,
       CAST(count(*) FILTER (in1 = 1 OR in2 = 1) AS BIGINT) AS observed,
       (sum(in1) + 1) * (sum(in2) + 1)
           // (count(*) FILTER (in1 = 1 AND in2 = 1) + 1) - 1
           AS chapman_estimate
FROM flags
""",
)
def q_capture_recapture(spark, sf_dir):
    # Capture-recapture population estimate (Chapman's corrected
    # Lincoln-Petersen): treat the first two calendar weeks as two
    # capture occasions and estimate the TOTAL user population —
    # including users seen in neither week — from the overlap:
    # N = (n1+1)(n2+1)/(m+1) - 1.  The ecology estimator product teams
    # use to size "how many users exist that we under-observe".  One
    # distinct (user, week) collapse, a broadcast 1-row anchor, one
    # combinable flag rollup; the estimate is exact integer DIV.
    ev = _t(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w")
    ).distinct()
    anchor = wk.agg(F.min("w").alias("w0"))
    flags = (
        wk.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("w") == F.col("w0"), 1).otherwise(0)
            ).alias("in1"),
            F.max(
                F.when(
                    F.col("w") == F.date_add(F.col("w0"), 7), 1
                ).otherwise(0)
            ).alias("in2"),
        )
    )
    return flags.agg(
        F.sum("in1").cast("bigint").alias("n_week1"),
        F.sum("in2").cast("bigint").alias("n_week2"),
        F.count_if((F.col("in1") == 1) & (F.col("in2") == 1))
        .cast("bigint")
        .alias("recaptured"),
        F.count_if((F.col("in1") == 1) | (F.col("in2") == 1))
        .cast("bigint")
        .alias("observed"),
        F.expr(
            "(sum(in1) + 1) * (sum(in2) + 1)"
            " DIV (count_if(in1 = 1 AND in2 = 1) + 1) - 1"
        ).alias("chapman_estimate"),
    )


@register(
    "q_weekend_effect",
    """
WITH v AS (
    SELECT CASE WHEN isodow(ts) IN (6, 7) THEN 'weekend'
                ELSE 'weekday' END AS grp,
           value
    FROM events WHERE value IS NOT NULL
),
s AS (
    SELECT grp, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS sxx
    FROM v GROUP BY grp
),
w AS (
    SELECT
      max(CASE WHEN grp = 'weekend' THEN n END) AS n1,
      max(CASE WHEN grp = 'weekend' THEN sx END) AS s1,
      max(CASE WHEN grp = 'weekend' THEN sxx END) AS q1,
      max(CASE WHEN grp = 'weekday' THEN n END) AS n2,
      max(CASE WHEN grp = 'weekday' THEN sx END) AS s2,
      max(CASE WHEN grp = 'weekday' THEN sxx END) AS q2
    FROM s
)
SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
       printf('%.9e', s1 / n1) AS mean_weekend,
       printf('%.9e', s2 / n2) AS mean_weekday,
       printf('%.9e',
              (s1 / n1 - s2 / n2)
              / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
                     + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)) AS welch_t
FROM w WHERE n1 >= 2 AND n2 >= 2
""",
)
def q_weekend_effect(spark, sf_dir):
    # Weekend-vs-weekday metric comparison with the Welch t statistic
    # (unequal variances — the correct two-sample form when group sizes
    # and spreads differ, as day-of-week slices always do).  The dow
    # split is pinned to Sat/Sun explicitly on BOTH engines because the
    # builtin numbering DISAGREES (Spark dayofweek: 1=Sunday..7=Saturday;
    # DuckDB isodow: 1=Monday..7=Sunday) — the predicate, not the
    # number, is mirrored.  One conditional rollup, pinned sums,
    # sqrt-only %.9e chains.
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grp = F.when(
        F.dayofweek("ts").isin(1, 7), F.lit("weekend")
    ).otherwise(F.lit("weekday"))
    s = ev.select(grp.alias("grp"), "value").groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("value"))).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
    )
    def pick(g, c):
        return F.max(F.when(F.col("grp") == g, F.col(c)))
    w = s.agg(
        pick("weekend", "n").alias("n1"),
        pick("weekend", "sx").alias("s1"),
        pick("weekend", "sxx").alias("q1"),
        pick("weekday", "n").alias("n2"),
        pick("weekday", "sx").alias("s2"),
        pick("weekday", "sxx").alias("q2"),
    ).filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    t = (m1 - m2) / F.sqrt(v1 / F.col("n1") + v2 / F.col("n2"))
    return w.select(
        F.col("n1").cast("bigint").alias("n_weekend"),
        F.col("n2").cast("bigint").alias("n_weekday"),
        sci9(m1).alias("mean_weekend"),
        sci9(m2).alias("mean_weekday"),
        sci9(t).alias("welch_t"),
    )


@register(
    "q_bandit_replay",
    """
WITH b AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
),
train AS (
    SELECT e.event_type, count(*) AS n,
           sum(CASE WHEN e.value > 500 THEN 1 ELSE 0 END) AS r
    FROM events e CROSS JOIN b WHERE epoch_us(e.ts) <= b.mid
    GROUP BY e.event_type
),
ranked AS (
    SELECT event_type, n, r,
           r * 1000000000 // n AS ctr_ppb,
           row_number() OVER (ORDER BY r * 1000000000 // n DESC,
                              event_type DESC) AS rk
    FROM train
),
policy AS (SELECT event_type, ctr_ppb FROM ranked WHERE rk = 1),
eval_ AS (
    SELECT count(*) AS n_matched,
           sum(CASE WHEN e.value > 500 THEN 1 ELSE 0 END) AS r
    FROM events e CROSS JOIN b CROSS JOIN policy p
    WHERE epoch_us(e.ts) > b.mid AND e.event_type = p.event_type
)
SELECT p.event_type AS policy_action,
       CAST(p.ctr_ppb AS BIGINT) AS train_ctr_ppb,
       CAST(ev.n_matched AS BIGINT) AS n_matched,
       CAST(ev.r * 1000000000 // ev.n_matched AS BIGINT) AS replay_reward_ppb
FROM policy p CROSS JOIN eval_ ev
""",
)
def q_bandit_replay(spark, sf_dir):
    # Offline policy evaluation by replay (Li et al. 2011): fit a greedy
    # context-free policy on the first calendar half (argmax training
    # reward rate per action, reward = value > 500), then estimate its
    # online reward from the SECOND half using only logged rounds where
    # the logged action matches the policy's choice — the unbiased
    # replay estimator every bandit/recsys team runs before shipping a
    # policy.  The argmax is a row_number over the |actions|-row training
    # table (unique (ctr, action) tiebreak); the midpoint anchor and the
    # 1-row policy broadcast; everything is integer ppb (exact DIV).
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(
        F.expr(
            "(min(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid")
    )
    reward = F.when(F.col("value") > 500, 1).otherwise(0)
    train = (
        ev.crossJoin(F.broadcast(b))
        .filter(us <= F.col("mid"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(reward).alias("r"))
    )
    ranked = train.select(
        "event_type",
        F.expr("r * 1000000000 DIV n").alias("ctr_ppb"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(
                F.col("ctr_ppb").desc(), F.col("event_type").desc()
            )
        ),
    )
    policy = ranked.filter(F.col("rk") == 1).select(
        F.col("event_type").alias("policy_action"), "ctr_ppb"
    )
    ev2 = (
        ev.crossJoin(F.broadcast(b))
        .filter(us > F.col("mid"))
        .join(
            F.broadcast(policy),
            F.col("event_type") == F.col("policy_action"),
        )
        .agg(
            F.any_value("policy_action").alias("policy_action"),
            F.any_value("ctr_ppb").alias("ctr_ppb"),
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(reward).alias("r"),
        )
    )
    return ev2.select(
        "policy_action",
        F.col("ctr_ppb").cast("bigint").alias("train_ctr_ppb"),
        F.col("n_matched").cast("bigint").alias("n_matched"),
        F.expr("r * 1000000000 DIV n_matched")
        .cast("bigint")
        .alias("replay_reward_ppb"),
    )


@register(
    "q_naive_bayes_propensity",
    """
WITH per AS (
    SELECT user_id,
           CAST(floor(ln(count(*)) / ln(2.0)) AS INT) AS band,
           CASE WHEN sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) * 5 > count(*)
                THEN 1 ELSE 0 END AS label
    FROM events GROUP BY user_id
),
prior AS (
    SELECT sum(label) AS n1, count(*) - sum(label) AS n0,
           count(DISTINCT band) AS nb
    FROM per
),
cond AS (
    SELECT band, sum(label) AS c1, count(*) - sum(label) AS c0
    FROM per GROUP BY band
),
w AS (
    SELECT c.band,
           CAST(ln((CAST(c.c1 AS DOUBLE) + 1.0) / (p.n1 + p.nb))
                - ln((CAST(c.c0 AS DOUBLE) + 1.0) / (p.n0 + p.nb))
                AS DECIMAL(18,12)) AS w_band,
           CAST(ln(CAST(p.n1 AS DOUBLE) / p.n0) AS DECIMAL(18,12)) AS w0
    FROM cond c CROSS JOIN prior p
)
SELECT per.user_id, per.band, CAST(per.label AS INT) AS label,
       printf('%.9e', CAST(w.w0 + w.w_band AS DOUBLE)) AS log_odds,
       (w.w0 + w.w_band) > 0 AS predicted
FROM per JOIN w USING (band)
""",
)
def q_naive_bayes_propensity(spark, sf_dir):
    # Laplace-smoothed Naive-Bayes propensity for the HEAVY-PURCHASER
    # label (purchase share > 20%, an integer cross-multiplied test —
    # "did they buy at all" is degenerate on this corpus, every user
    # buys) over the log2 activity band — the one-feature baseline every
    # propensity model is benchmarked against (and the exported per-user log-odds is the
    # calibration input for q_score_calibration-style audits).  The
    # conditional table is |bands|-bounded; weights are ln terms pinned
    # to decimal BEFORE the (two-term) sum, so the prediction compares an
    # exact decimal to zero — engine-deterministic; log-odds render %.9e.
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.floor(
            F.log(F.count(F.lit(1)).cast("double")) / F.log(F.lit(2.0))
        )
        .cast("int")
        .alias("band"),
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
    )
    prior = per.agg(
        F.sum("label").alias("n1"),
        (F.count(F.lit(1)) - F.sum("label")).alias("n0"),
        F.countDistinct("band").alias("nb"),
    )
    cond = per.groupBy("band").agg(
        F.sum("label").alias("c1"),
        (F.count(F.lit(1)) - F.sum("label")).alias("c0"),
    )
    w = cond.crossJoin(F.broadcast(prior)).select(
        "band",
        (
            F.log(
                (F.col("c1").cast("double") + 1.0)
                / (F.col("n1") + F.col("nb"))
            )
            - F.log(
                (F.col("c0").cast("double") + 1.0)
                / (F.col("n0") + F.col("nb"))
            )
        )
        .cast("decimal(18,12)")
        .alias("w_band"),
        F.log(F.col("n1").cast("double") / F.col("n0"))
        .cast("decimal(18,12)")
        .alias("w0"),
    )
    return per.join(F.broadcast(w), "band").select(
        "user_id",
        "band",
        F.col("label").cast("int").alias("label"),
        sci9((F.col("w0") + F.col("w_band")).cast("double")).alias("log_odds"),
        ((F.col("w0") + F.col("w_band")) > 0).alias("predicted"),
    )


@register(
    "q_hourly_envelope",
    """
WITH v AS (
    SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS h,
           value, event_id
    FROM events WHERE value IS NOT NULL
),
rk AS (
    SELECT event_type, h, value,
           row_number() OVER (PARTITION BY event_type, h
                              ORDER BY value, event_id) AS r,
           count(*) OVER (PARTITION BY event_type, h) AS n
    FROM v
)
SELECT event_type, h, CAST(any_value(n) AS BIGINT) AS n,
       max(CASE WHEN r = CAST(ceil(0.10 * n) AS BIGINT)
                THEN value END) AS p10,
       max(CASE WHEN r = CAST(ceil(0.50 * n) AS BIGINT)
                THEN value END) AS p50,
       max(CASE WHEN r = CAST(ceil(0.90 * n) AS BIGINT)
                THEN value END) AS p90
FROM rk GROUP BY event_type, h
""",
)
def q_hourly_envelope(spark, sf_dir):
    # Hour-of-day operating envelope per series — the p10/p50/p90 bands a
    # monitoring UI draws behind the live line so "is this normal for
    # 3am?" is answerable at a glance.  The three ranks come from the
    # shared histogram rank-selection (operators/histogram.py) grouped by
    # (series, hour) — exact discrete order statistics (ceil(q*n),
    # event_id-tiebroken), never a per-group full sort in one task at
    # scale; the ORACLE keeps the naive window form so the hash match
    # cross-validates the decomposition (the q_latency_sla discipline).
    # Output values are carried raw doubles (selected, not computed).
    from opc2mongodb_spark.operators.histogram import rank_select

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("h"),
        "value",
        "event_id",
    )
    sel = rank_select(
        v,
        "value",
        [
            (lambda n, q=q: F.ceil(q * n))
            for q in (0.10, 0.50, 0.90)
        ],
        group_cols=["event_type", "h"],
        tiebreak_cols=["event_id"],
    )
    # rank -> quantile label: ranks are ceil(q*n) per group; recover which
    # q produced each row by recomputing the three rank values from n
    out = sel.groupBy("event_type", "h").agg(
        F.any_value("n").cast("bigint").alias("n"),
        F.max(
            F.when(F.col("rank") == F.ceil(0.10 * F.col("n")), F.col("value"))
        ).alias("p10"),
        F.max(
            F.when(F.col("rank") == F.ceil(0.50 * F.col("n")), F.col("value"))
        ).alias("p50"),
        F.max(
            F.when(F.col("rank") == F.ceil(0.90 * F.col("n")), F.col("value"))
        ).alias("p90"),
    )
    return out


@register(
    "q_did_estimate",
    """
WITH b AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
),
cell AS (
    SELECT CASE WHEN CAST(CAST(('0x' || substring(md5('srm:' ||
                       CAST(e.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 AS INTEGER) < 50
                THEN 1 ELSE 0 END AS treated,
           CASE WHEN epoch_us(e.ts) > b.mid THEN 1 ELSE 0 END AS post,
           CAST(e.value AS DECIMAL(18,2)) AS v
    FROM events e CROSS JOIN b WHERE e.value IS NOT NULL
),
s AS (
    SELECT treated, post, count(*) AS n,
           CAST(sum(v) AS DOUBLE) AS sx
    FROM cell GROUP BY treated, post
),
w AS (
    SELECT
      max(CASE WHEN treated = 1 AND post = 1 THEN sx / n END) AS t2,
      max(CASE WHEN treated = 1 AND post = 0 THEN sx / n END) AS t1,
      max(CASE WHEN treated = 0 AND post = 1 THEN sx / n END) AS c2,
      max(CASE WHEN treated = 0 AND post = 0 THEN sx / n END) AS c1,
      max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t2,
      max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c2
    FROM s
)
SELECT CAST(n_t2 AS BIGINT) AS n_treated_post,
       CAST(n_c2 AS BIGINT) AS n_control_post,
       printf('%.9e', t2 - t1) AS treated_delta,
       printf('%.9e', c2 - c1) AS control_delta,
       printf('%.9e', (t2 - t1) - (c2 - c1)) AS did_estimate
FROM w
WHERE t1 IS NOT NULL AND t2 IS NOT NULL
  AND c1 IS NOT NULL AND c2 IS NOT NULL
""",
)
def q_did_estimate(spark, sf_dir):
    # Difference-in-differences — the quasi-experimental estimator when
    # assignment isn't randomized at the metric's grain: (treated post -
    # treated pre) - (control post - control pre) nets out both the
    # group gap and the common time trend.  Completes the causal set
    # next to q_abtest_lift (randomized), q_cuped_adjusted (variance
    # reduction), q_bandit_replay (policy value).  One 4-cell conditional
    # rollup off the calendar-midpoint anchor; decimal-pinned sums, the
    # estimate is an identical double chain under %.9e.
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(
        F.expr(
            "(min(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid")
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint") % 100
    cell = ev.crossJoin(F.broadcast(b)).select(
        F.when(bucket < 50, 1).otherwise(0).alias("treated"),
        F.when(us > F.col("mid"), 1).otherwise(0).alias("post"),
        dec(F.col("value")).alias("v"),
    )
    s = cell.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("sx"),
    )
    def pick(t, p, c):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p), F.col(c)
            )
        )
    def mean(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("sx") / F.col("n"),
            )
        )
    w = s.agg(
        mean(1, 1).alias("t2"),
        mean(1, 0).alias("t1"),
        mean(0, 1).alias("c2"),
        mean(0, 0).alias("c1"),
        pick(1, 1, "n").alias("n_t2"),
        pick(0, 1, "n").alias("n_c2"),
    ).filter(
        F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
        & F.col("c1").isNotNull()
        & F.col("c2").isNotNull()
    )
    return w.select(
        F.col("n_t2").cast("bigint").alias("n_treated_post"),
        F.col("n_c2").cast("bigint").alias("n_control_post"),
        sci9(F.col("t2") - F.col("t1")).alias(
            "treated_delta"
        ),
        sci9(F.col("c2") - F.col("c1")).alias(
            "control_delta"
        ),
        sci9((F.col("t2") - F.col("t1")) - (F.col("c2") - F.col("c1"))).alias("did_estimate"),
    )


@register(
    "q_path_surprise",
    """
WITH seq AS (
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
pairs AS (
    SELECT user_id, cur, nxt FROM seq WHERE nxt IS NOT NULL
),
model AS (
    SELECT cur, nxt, count(*) AS n FROM pairs GROUP BY cur, nxt
),
tot AS (
    SELECT cur, sum(n) AS nc FROM model GROUP BY cur
),
lnp AS (
    SELECT m.cur, m.nxt,
           CAST(-ln(CAST(m.n AS DOUBLE) / t.nc) AS DECIMAL(18,12)) AS nll
    FROM model m JOIN tot t USING (cur)
)
SELECT p.user_id,
       CAST(count(*) AS BIGINT) AS n_transitions,
       printf('%.9e', CAST(sum(l.nll) AS DOUBLE) / count(*))
           AS mean_surprise
FROM pairs p JOIN lnp l ON l.cur = p.cur AND l.nxt = p.nxt
GROUP BY p.user_id
""",
)
def q_path_surprise(spark, sf_dir):
    # Per-user journey surprise: mean -ln P(next | current) under the
    # corpus's own first-order transition model — the sequence-level
    # anomaly score over q_markov_cond_entropy's matrix (bots and fraud
    # rings walk improbable paths; engaged humans walk the model).  The
    # model is a |states|^2 table whose -ln terms are decimal-pinned ONCE
    # and joined back transition-keyed (broadcast at this cardinality),
    # so each user's sum is order-insensitive; %.9e out.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    model = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = model.groupBy("cur").agg(F.sum("n").alias("nc"))
    lnp = model.join(tot, "cur").select(
        "cur",
        "nxt",
        (-F.log(F.col("n").cast("double") / F.col("nc")))
        .cast("decimal(18,12)")
        .alias("nll"),
    )
    return (
        pairs.join(F.broadcast(lnp), ["cur", "nxt"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            sci9(F.sum("nll").cast("double") / F.count(F.lit(1))).alias("mean_surprise"),
        )
    )


@register(
    "q_effective_sample_size",
    """
WITH w AS (
    SELECT event_type, CAST(value AS DECIMAL(18,2)) AS wt
    FROM events WHERE value IS NOT NULL AND value > 0
),
s AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(wt) AS DOUBLE) AS sw,
           CAST(sum(CAST(wt * wt AS DECIMAL(28,4))) AS DOUBLE) AS sww
    FROM w GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_rows,
       CAST(floor(sw * sw / sww * 1000.0) AS BIGINT) AS ess_e3,
       CAST(floor(sw * sw / sww * 1000000000.0 / n) AS BIGINT)
           AS efficiency_e9
FROM s
""",
)
def q_effective_sample_size(spark, sf_dir):
    # Kish effective sample size per series, treating value as an
    # importance weight: ESS = (sum w)^2 / sum w^2 — the diagnostic that
    # says how much information a weighted sample REALLY carries
    # (efficiency = ESS/n; heavy weight skew collapses it).  The
    # importance-sampling companion to q_weighted_sample and
    # q_mix_rebalance.  One combinable rollup; weights and their squares
    # decimal-pinned, the ESS is an identical double chain under
    # floor scaling.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    s = ev.select("event_type", dec(F.col("value")).alias("wt")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wt").cast("double").alias("sw"),
        F.sum((F.col("wt") * F.col("wt")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sww"),
    )
    ess = F.col("sw") * F.col("sw") / F.col("sww")
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_rows"),
        F.floor(ess * 1000.0).cast("bigint").alias("ess_e3"),
        F.floor(ess * 1000000000.0 / F.col("n"))
        .cast("bigint")
        .alias("efficiency_e9"),
    )


@register(
    "q_ship_lag_sla",
    """
WITH lag_ AS (
    SELECT o.o_orderpriority AS priority,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT)
               AS lag_days,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
rk AS (
    SELECT priority, lag_days,
           row_number() OVER (PARTITION BY priority
                              ORDER BY lag_days, l_orderkey, l_linenumber)
               AS r,
           count(*) OVER (PARTITION BY priority) AS n
    FROM lag_
)
SELECT priority, CAST(any_value(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN r = CAST(ceil(0.50 * n) AS BIGINT)
                     THEN lag_days END) AS INT) AS p50_days,
       CAST(max(CASE WHEN r = CAST(ceil(0.95 * n) AS BIGINT)
                     THEN lag_days END) AS INT) AS p95_days,
       CAST(max(lag_days) AS INT) AS max_days
FROM rk GROUP BY priority
""",
)
def q_ship_lag_sla(spark, sf_dir):
    # Order-to-ship SLA per priority class — the fulfillment read beyond
    # the 22 TPC-H queries: exact p50/p95/max of the ship lag in days.
    # The order dimension joins fact-keyed; the two ranks come from the
    # shared rank_select grouped by priority ((lag, orderkey, linenumber)
    # tiebreak — never a per-priority single-task sort at scale); max is
    # a plain combinable aggregate.  The oracle keeps the naive window
    # form (the cross-validation discipline).  All-integer output.
    from opc2mongodb_spark.operators.histogram import rank_select

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("int").alias(
            "lag_days"
        ),
        "l_orderkey",
        "l_linenumber",
    )
    sel = rank_select(
        lag,
        "lag_days",
        [(lambda n, q=q: F.ceil(q * n)) for q in (0.50, 0.95)],
        group_cols=["priority"],
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    ranks = sel.groupBy("priority").agg(
        F.any_value("n").cast("bigint").alias("n"),
        F.max(
            F.when(
                F.col("rank") == F.ceil(0.50 * F.col("n")),
                F.col("lag_days"),
            )
        )
        .cast("int")
        .alias("p50_days"),
        F.max(
            F.when(
                F.col("rank") == F.ceil(0.95 * F.col("n")),
                F.col("lag_days"),
            )
        )
        .cast("int")
        .alias("p95_days"),
    )
    mx = lag.groupBy("priority").agg(
        F.max("lag_days").cast("int").alias("max_days")
    )
    return ranks.join(mx, "priority").select(
        "priority", "n", "p50_days", "p95_days", "max_days"
    )


@register(
    "q_supplier_hhi",
    """
WITH ps AS (
    SELECT l_partkey AS p, l_suppkey AS s,
           count(*) AS n
    FROM lineitem GROUP BY 1, 2
),
tot AS (
    SELECT p, sum(n) AS np, count(*) AS n_supp FROM ps GROUP BY p
),
hhi AS (
    SELECT ps.p, any_value(t.n_supp) AS n_supp,
           CAST(any_value(t.np) AS BIGINT) AS n_lines,
           sum(ps.n * ps.n) * 1000000000
               // (any_value(t.np) * any_value(t.np)) AS hhi_e9
    FROM ps JOIN tot t USING (p)
    GROUP BY ps.p
)
SELECT CAST(p AS BIGINT) AS partkey, CAST(n_supp AS BIGINT) AS n_suppliers,
       n_lines, CAST(hhi_e9 AS BIGINT) AS hhi_e9
FROM hhi
ORDER BY hhi_e9 DESC, n_lines DESC, partkey
LIMIT 50
""",
)
def q_supplier_hhi(spark, sf_dir):
    # Supply-concentration screen: Herfindahl-Hirschman index of each
    # part's supplier mix (from lineitem volume), top-50 most
    # concentrated — the supply-chain-risk read ("which parts depend on
    # one supplier?").  Two combinable rollups keyed on (part, supplier)
    # then part; HHI is exact integer arithmetic (sum of squared counts
    # scaled by 1e9 DIV total^2); the top-k carries the full unique
    # (hhi, n_lines, partkey) tiebreak so LIMIT is deterministic.
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = ps.groupBy("p").agg(
        F.sum("n").alias("np"), F.count(F.lit(1)).alias("n_supp")
    )
    hhi = (
        ps.join(tot, "p")
        .groupBy("p")
        .agg(
            F.any_value("n_supp").alias("n_supp"),
            F.any_value("np").cast("bigint").alias("n_lines"),
            F.expr(
                "sum(n * n) * 1000000000"
                " DIV (any_value(np) * any_value(np))"
            ).alias("hhi_e9"),
        )
    )
    return (
        hhi.select(
            F.col("p").cast("bigint").alias("partkey"),
            F.col("n_supp").cast("bigint").alias("n_suppliers"),
            "n_lines",
            F.col("hhi_e9").cast("bigint").alias("hhi_e9"),
        )
        .orderBy(
            F.col("hhi_e9").desc(), F.col("n_lines").desc(), "partkey"
        )
        .limit(50)
    )


@register(
    "q_brand_return_rate",
    """
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (l.l_returnflag = 'R') AS BIGINT) AS n_returned,
       count(*) FILTER (l.l_returnflag = 'R') * 1000000000 // count(*)
           AS return_ppb,
       CAST(CAST(sum(CASE WHEN l.l_returnflag = 'R'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4)) END) AS DECIMAL(28,4))
            AS DOUBLE) AS returned_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def q_brand_return_rate(spark, sf_dir):
    # Return-rate league table per brand — merchandising's quality read
    # off the l_returnflag dimension the 22 canonical queries only use as
    # a grouping key: return share in exact ppb plus the decimal-pinned
    # revenue locked up in returns.  Fact-keyed part join (broadcast-
    # eligible dimension), one combinable rollup.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    )
    ret = F.col("l_returnflag") == "R"
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    return j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count_if(ret).cast("bigint").alias("n_returned"),
        F.expr(
            "count_if(l_returnflag = 'R') * 1000000000 DIV count(*)"
        ).alias("return_ppb"),
        F.sum(F.when(ret, rev))
        .cast("decimal(28,4)")
        .cast("double")
        .alias("returned_revenue"),
    )


@register(
    "q_trade_matrix",
    """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
GROUP BY ns.n_name, nc.n_name
""",
)
def q_trade_matrix(spark, sf_dir):
    # Full supplier-nation x customer-nation trade-flow matrix — the
    # generalization of TPC-H q7's two-nation slice to the whole
    # |nations|^2 grid (who ships value to whom).  Star shape: both
    # nation dimensions and supplier broadcast; customer joins
    # order-keyed then the fact rolls up map-side combinably into at most
    # 625 cells.  Revenue decimal-pinned.
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("ck"),
                              F.col("n_name").alias("cust_nation")))
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                              F.col("n_name").alias("supp_nation")))
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(nc, c.c_nationkey == F.col("ck"))
        .join(ns, s.s_nationkey == F.col("sk"))
    )
    return j.groupBy("supp_nation", "cust_nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(rev).cast("decimal(28,4)").cast("double").alias("revenue"),
    )


@register(
    "q_order_size_histogram",
    """
WITH per AS (
    SELECT l_orderkey, count(*) AS n_items FROM lineitem
    GROUP BY l_orderkey
)
SELECT CAST(n_items AS INT) AS n_items,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(n_items * count(*) AS BIGINT) AS n_lines
FROM per GROUP BY n_items
""",
)
def q_order_size_histogram(spark, sf_dir):
    # Basket-size histogram: lines per order and how many orders land at
    # each size — the operational companion to q_tpch_q13's
    # customer-order distribution (picking/packing capacity reads this
    # directly).  Two map-side-combinable integer groupBys.
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return per.groupBy("n_items").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.col("n_items") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_lines"),
    ).select(
        F.col("n_items").cast("int").alias("n_items"),
        "n_orders",
        "n_lines",
    )


@register(
    "q_arrival_dispersion",
    """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum(c * c) AS BIGINT) AS scc
    FROM hourly GROUP BY event_type HAVING count(*) >= 2
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours, sc AS n_events,
       printf('%.9e',
              ((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
                                      * sc / n) / (n - 1))
              / (CAST(sc AS DOUBLE) / n)) AS dispersion_index
FROM s
""",
)
def q_arrival_dispersion(spark, sf_dir):
    # Index of dispersion (variance/mean) of hourly arrival counts per
    # series — the Poisson test for event streams: ~1 = memoryless
    # arrivals, >>1 = bursty/clustered (sizing queues and autoscalers
    # needs this, and it is the time-bin twin of q_token_dispersion's
    # document-bin Fano).  One hourly rollup (map-side combinable), one
    # per-series fold on exact integer moments; the index is an
    # identical double chain under %.9e.  Only OBSERVED hours enter (an
    # all-zero hour contributes no row on either engine — documented
    # choice, shared exactly).
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    s = (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").cast("bigint").alias("sc"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
        )
        .filter(F.col("n") >= 2)
    )
    n = F.col("n")
    mean = F.col("sc").cast("double") / n
    var = (
        F.col("scc").cast("double") - F.col("sc").cast("double") * F.col("sc") / n
    ) / (n - 1)
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_hours"),
        F.col("sc").alias("n_events"),
        sci9(var / mean).alias("dispersion_index"),
    )


@register(
    "q_repurchase_cycle",
    """
WITH p AS (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
    FROM events WHERE event_type = 'purchase'
),
gaps AS (
    SELECT user_id, event_id,
           epoch_us(ts) - epoch_us(prev) AS gap_us
    FROM p WHERE prev IS NOT NULL
),
rk AS (
    SELECT gap_us,
           row_number() OVER (ORDER BY gap_us, user_id, event_id) AS r,
           count(*) OVER () AS n
    FROM gaps
)
SELECT CAST(any_value(n) AS BIGINT) AS n_gaps,
       CAST(max(CASE WHEN r = CAST(ceil(0.50 * n) AS BIGINT)
                     THEN gap_us END) AS BIGINT) AS p50_gap_us,
       CAST(max(CASE WHEN r = CAST(ceil(0.90 * n) AS BIGINT)
                     THEN gap_us END) AS BIGINT) AS p90_gap_us
FROM rk
""",
)
def q_repurchase_cycle(spark, sf_dir):
    # Repurchase cycle: the p50/p90 gap between a user's consecutive
    # purchases, in exact integer microseconds — the number that sets
    # replenishment-reminder timing and defines "churned" for commerce
    # (a user is late when their silence exceeds their own cycle).  Gaps
    # come from one user-partitioned lag window; the global ranks come
    # from the shared rank_select (ungrouped — the (gap, user, event)
    # tiebreak keeps the selection total), with the naive-window oracle
    # cross-validating the decomposition.  All-integer output.
    from opc2mongodb_spark.operators.histogram import rank_select

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    gaps = (
        ev.select(
            "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
        .select(
            "user_id",
            "event_id",
            (us("ts") - us("prev")).alias("gap_us"),
        )
    )
    sel = rank_select(
        gaps,
        "gap_us",
        [(lambda n, q=q: F.ceil(q * n)) for q in (0.50, 0.90)],
        tiebreak_cols=["user_id", "event_id"],
    )
    return sel.agg(
        F.any_value("n").cast("bigint").alias("n_gaps"),
        F.max(
            F.when(
                F.col("rank") == F.ceil(0.50 * F.col("n")), F.col("gap_us")
            )
        )
        .cast("bigint")
        .alias("p50_gap_us"),
        F.max(
            F.when(
                F.col("rank") == F.ceil(0.90 * F.col("n")), F.col("gap_us")
            )
        )
        .cast("bigint")
        .alias("p90_gap_us"),
    )


@register(
    "q_discount_qty_corr",
    """
WITH v AS (
    SELECT p.p_type AS ptype,
           CAST(l.l_discount AS DECIMAL(18,2)) AS x,
           CAST(l.l_quantity AS DECIMAL(18,2)) AS y
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
s AS (
    SELECT ptype, count(*) AS n,
           CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy,
           CAST(sum(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy
    FROM v GROUP BY ptype HAVING count(*) >= 3
)
SELECT ptype, CAST(n AS BIGINT) AS n_lines,
       printf('%.9e',
              (sxy - sx * sy / n)
              / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
           AS corr_disc_qty
FROM s
WHERE (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
""",
)
def q_discount_qty_corr(spark, sf_dir):
    # Discount-quantity correlation per part type — the price-elasticity
    # proxy merchandising reads before running discount experiments
    # (positive = discounts move volume for that category).  The
    # q_feature_corr discipline on the TPC-H side: decimal-pinned moment
    # sums per type (broadcast part dimension), one identical corr chain
    # under %.9e, degenerate-variance types filtered identically on both
    # engines.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    v = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_type").alias("ptype"),
        F.col("l_discount").cast("decimal(18,2)").alias("x"),
        F.col("l_quantity").cast("decimal(18,2)").alias("y"),
    )
    s = (
        v.groupBy("ptype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(28,4)"))
            .cast("double")
            .alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(28,4)"))
            .cast("double")
            .alias("syy"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(28,4)"))
            .cast("double")
            .alias("sxy"),
        )
        .filter(F.col("n") >= 3)
    )
    n = F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / F.sqrt(vx * vy)
    return (
        s.filter((vx > 0) & (vy > 0))
        .select(
            "ptype",
            n.cast("bigint").alias("n_lines"),
            sci9(corr).alias("corr_disc_qty"),
        )
    )


@register(
    "q_funnel_wilson",
    """
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
counts AS (
    SELECT 'view->click' AS edge,
           (SELECT count(*) FROM v) AS n, (SELECT count(*) FROM c) AS k
    UNION ALL
    SELECT 'click->purchase',
           (SELECT count(*) FROM c), (SELECT count(*) FROM p)
),
wils AS (
    SELECT edge, n, k,
           CAST(k AS DOUBLE) / n AS phat,
           1.959963985 * 1.959963985 / n AS z2n
    FROM counts WHERE n > 0
)
SELECT edge, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       printf('%.9e', phat) AS conv_rate,
       printf('%.9e',
              (phat + z2n / 2.0
               - 1.959963985 * sqrt(phat * (1.0 - phat) / n
                                    + z2n / (4.0 * n)))
              / (1.0 + z2n)) AS wilson_lo,
       printf('%.9e',
              (phat + z2n / 2.0
               + 1.959963985 * sqrt(phat * (1.0 - phat) / n
                                    + z2n / (4.0 * n)))
              / (1.0 + z2n)) AS wilson_hi
FROM wils
""",
)
def q_funnel_wilson(spark, sf_dir):
    # Wilson 95% score intervals on the funnel's step conversion rates —
    # the statistically honest way to read small-k conversions (a plain
    # k/n +- Wald interval breaks near 0/1; Wilson never leaves [0,1]).
    # Same step chain as q_funnel; each edge is a 1-row frame, the
    # interval is a sqrt-only chain on exact-integer k/n — identical
    # doubles under %.9e.  z = 1.959963985 is a shared literal.
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def edge(name, base, conv):
        nb = base.agg(F.count(F.lit(1)).alias("n"))
        nk = conv.agg(F.count(F.lit(1)).alias("k"))
        return (
            nb.crossJoin(F.broadcast(nk))
            .select(F.lit(name).alias("edge"), "n", "k")
        )

    counts = edge("view->click", v, c).unionAll(
        edge("click->purchase", c, p)
    ).filter(F.col("n") > 0)
    z = F.lit(1.959963985)
    phat = F.col("k").cast("double") / F.col("n")
    z2n = z * z / F.col("n")
    rad = z * F.sqrt(
        phat * (F.lit(1.0) - phat) / F.col("n") + z2n / (4.0 * F.col("n"))
    )
    lo = (phat + z2n / 2.0 - rad) / (F.lit(1.0) + z2n)
    hi = (phat + z2n / 2.0 + rad) / (F.lit(1.0) + z2n)
    return counts.select(
        "edge",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        sci9(phat).alias("conv_rate"),
        sci9(lo).alias("wilson_lo"),
        sci9(hi).alias("wilson_hi"),
    )


@register(
    "q_max_drawdown",
    """
WITH r AS (
    SELECT event_type, value, ts, event_id,
           max(value) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS peak
    FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       max(peak - value) AS max_drawdown,
       max(peak) AS peak_value
FROM r GROUP BY event_type
""",
)
def q_max_drawdown(spark, sf_dir):
    # Maximum drawdown per series — the worst peak-to-trough drop under
    # the running maximum (finance's risk headline, equally the right
    # "how far did this sensor fall from its high" read for telemetry).
    # One per-series ordered window (running max over the shared
    # event_type exchange) and a combinable rollup; peak - value
    # subtracts two carried raw doubles (stored values, not computed
    # sums) and max carries — no summation-order exposure anywhere, so
    # raw doubles hash exactly.
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = ev.select(
        "event_type",
        "value",
        F.max("value").over(w).alias("peak"),
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max(F.col("peak") - F.col("value")).alias("max_drawdown"),
        F.max("peak").alias("peak_value"),
    )


@register(
    "q_median_shift",
    """
WITH b AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
),
v AS (
    SELECT e.event_type,
           CASE WHEN epoch_us(e.ts) > b.mid THEN 1 ELSE 0 END AS half,
           e.value, e.event_id
    FROM events e CROSS JOIN b WHERE e.value IS NOT NULL
),
rk AS (
    SELECT event_type, half, value,
           row_number() OVER (PARTITION BY event_type, half
                              ORDER BY value, event_id) AS r,
           count(*) OVER (PARTITION BY event_type, half) AS n
    FROM v
),
med AS (
    SELECT event_type, half, any_value(n) AS n,
           max(CASE WHEN r = (n + 1) // 2 THEN value END) AS med
    FROM rk GROUP BY event_type, half
),
wide AS (
    SELECT event_type,
           max(CASE WHEN half = 0 THEN med END) AS med_first,
           max(CASE WHEN half = 1 THEN med END) AS med_second,
           CAST(max(CASE WHEN half = 0 THEN n END) AS BIGINT) AS n_first,
           CAST(max(CASE WHEN half = 1 THEN n END) AS BIGINT) AS n_second
    FROM med GROUP BY event_type
)
SELECT event_type, n_first, n_second, med_first, med_second,
       med_second - med_first AS median_shift
FROM wide WHERE med_first IS NOT NULL AND med_second IS NOT NULL
""",
)
def q_median_shift(spark, sf_dir):
    # Median shift between the two calendar halves per series — the
    # robust "did the level move?" companion to q_ks_drift (KS sees shape
    # change; this reads the location move in the metric's own units,
    # immune to outliers unlike a mean diff).  Discrete medians
    # (floor((n+1)/2), event_id-tiebroken) from the shared rank_select
    # grouped by (series, half); the naive-window oracle cross-validates;
    # the shift subtracts two CARRIED doubles — exact.
    from opc2mongodb_spark.operators.histogram import rank_select

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.agg(
        F.expr(
            "(min(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    v = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(us > F.col("mid"), 1).otherwise(0).alias("half"),
        "value",
        "event_id",
    )
    sel = rank_select(
        v,
        "value",
        [lambda n: F.floor((n + 1) / 2)],
        group_cols=["event_type", "half"],
        tiebreak_cols=["event_id"],
    )
    med = sel.groupBy("event_type", "half").agg(
        F.any_value("n").alias("n"),
        F.max(F.col("value")).alias("med"),
    )
    def pick(h, c):
        return F.max(F.when(F.col("half") == h, F.col(c)))
    wide = med.groupBy("event_type").agg(
        pick(0, "med").alias("med_first"),
        pick(1, "med").alias("med_second"),
        pick(0, "n").cast("bigint").alias("n_first"),
        pick(1, "n").cast("bigint").alias("n_second"),
    ).filter(
        F.col("med_first").isNotNull() & F.col("med_second").isNotNull()
    )
    return wide.select(
        "event_type",
        "n_first",
        "n_second",
        "med_first",
        "med_second",
        (F.col("med_second") - F.col("med_first")).alias("median_shift"),
    )


@register(
    "q_source_vocab_overlap",
    """
WITH st AS (
    SELECT DISTINCT source, unnest(string_split(text, ' ')) AS t
    FROM documents
),
sz AS (
    SELECT source, count(*) AS n FROM st GROUP BY source
),
inter_ AS (
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS c
    FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
    GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, CAST(i.c AS BIGINT) AS common_terms,
       CAST(na.n AS BIGINT) AS vocab_a, CAST(nb.n AS BIGINT) AS vocab_b,
       CAST(floor(CAST(i.c AS DOUBLE) * 1e9
                  / (na.n + nb.n - i.c)) AS BIGINT) AS jaccard_e9
FROM inter_ i
JOIN sz na ON na.source = i.src_a
JOIN sz nb ON nb.source = i.src_b
""",
)
def q_source_vocab_overlap(spark, sf_dir):
    # Pairwise vocabulary Jaccard between corpus sources — the
    # governance read before mixing sources ("how redundant are these
    # feeds lexically?"), the token-level sibling of q_corpus_diff's
    # document-level view.  Distinct (source, term) collapse first, a
    # term-keyed equi-join for intersections (fan-out per term = sources
    # holding it, <= |sources|), broadcast size table, floor(x*1e9)
    # exact.
    from opc2mongodb_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    st = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("t")
    ).distinct()
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = st.alias("a")
    bb = st.alias("b")
    inter = (
        a.join(
            bb,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = F.broadcast(sz.select(F.col("source").alias("src_a"),
                               F.col("n").alias("vocab_a")))
    nb = F.broadcast(sz.select(F.col("source").alias("src_b"),
                               F.col("n").alias("vocab_b")))
    jac = (
        F.col("c").cast("double")
        * 1e9
        / (F.col("vocab_a") + F.col("vocab_b") - F.col("c"))
    )
    return (
        inter.join(na, "src_a")
        .join(nb, "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("c").cast("bigint").alias("common_terms"),
            F.col("vocab_a").cast("bigint").alias("vocab_a"),
            F.col("vocab_b").cast("bigint").alias("vocab_b"),
            F.floor(jac).cast("bigint").alias("jaccard_e9"),
        )
    )


@register(
    "q_date_logic_audit",
    """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (l_shipdate < o_orderdate) AS BIGINT)
           AS ship_before_order,
       CAST(count(*) FILTER (date_diff('day', o_orderdate, l_shipdate)
                             > 365) AS BIGINT) AS ship_over_year,
       CAST(count(*) FILTER (l_quantity <= 0 OR l_extendedprice <= 0)
           AS BIGINT) AS nonpositive_amounts,
       CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1)
           AS BIGINT) AS discount_out_of_range,
       count(*) FILTER (l_shipdate < o_orderdate OR
                        date_diff('day', o_orderdate, l_shipdate) > 365 OR
                        l_quantity <= 0 OR l_extendedprice <= 0 OR
                        l_discount < 0 OR l_discount > 1)
           * 1000000000 // count(*) AS violation_ppb
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""",
)
def q_date_logic_audit(spark, sf_dir):
    # Fact-table sanity audit — the data-quality sweep q_ref_integrity
    # does for keys, done for TIME and VALUE DOMAINS: ships before the
    # order existed, implausibly slow ships (> 1 year), non-positive
    # amounts, discounts outside [0,1], and the combined violation rate.
    # One fact-keyed join, one 1-row filtered rollup, all integer (ppb
    # by exact DIV).
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    before = F.col("l_shipdate") < F.col("o_orderdate")
    slow = F.datediff("l_shipdate", "o_orderdate") > 365
    nonpos = (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") <= 0)
    disc = (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count_if(before).cast("bigint").alias("ship_before_order"),
        F.count_if(slow).cast("bigint").alias("ship_over_year"),
        F.count_if(nonpos).cast("bigint").alias("nonpositive_amounts"),
        F.count_if(disc).cast("bigint").alias("discount_out_of_range"),
        (
            F.count_if(before | slow | nonpos | disc)
            * F.lit(1000000000)
        ).cast("bigint").alias("_num"),
        F.count(F.lit(1)).alias("_den"),
    ).select(
        "n_lines",
        "ship_before_order",
        "ship_over_year",
        "nonpositive_amounts",
        "discount_out_of_range",
        F.expr("_num DIV _den").alias("violation_ppb"),
    )


@register(
    "q_sentence_stats",
    """
WITH s AS (
    SELECT doc_id,
           len(string_split(text, '.')) AS n_seg,
           length(text) AS n_chars
    FROM documents
)
SELECT doc_id,
       CAST(n_seg AS BIGINT) AS n_segments,
       CAST(n_chars AS BIGINT) AS n_chars,
       n_chars * 1000 // n_seg AS chars_per_segment_e3
FROM s WHERE n_seg > 0
""",
)
def q_sentence_stats(spark, sf_dir):
    # Sentence-granularity length profile per document — the segment
    # counts a chunking/packing pipeline reads before splitting text for
    # a context window (q_pack_sequences consumes token lengths; this is
    # the sentence-boundary view).  Period-split segments, exact integer
    # chars-per-segment at e3 — one map-only projection, no shuffle at
    # all.
    d = _t(spark, sf_dir, "documents")
    n_seg = F.size(F.split(F.col("text"), "\\.", -1))
    return d.select(
        "doc_id",
        n_seg.cast("bigint").alias("n_segments"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.expr(
            "length(text) * 1000 DIV size(split(text, '\\\\.', -1))"
        ).alias("chars_per_segment_e3"),
    ).filter(F.col("n_segments") > 0)


@register(
    "q_peer_zscore",
    """
WITH per AS (
    SELECT user_id,
           CAST(floor(ln(count(*)) / ln(2.0)) AS INT) AS band,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE)
               AS revenue
    FROM events GROUP BY user_id
),
peer AS (
    SELECT band, count(*) AS n,
           CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(revenue * revenue AS DECIMAL(28,4))) AS DOUBLE)
               AS sxx
    FROM per GROUP BY band HAVING count(*) >= 2
)
SELECT p.user_id, p.band, p.revenue,
       CAST(pr.n AS BIGINT) AS peer_n,
       printf('%.9e',
              (p.revenue - pr.sx / pr.n)
              / sqrt((pr.sxx - pr.sx * pr.sx / pr.n) / (pr.n - 1)))
           AS peer_z
FROM per p JOIN peer pr USING (band)
WHERE (pr.sxx - pr.sx * pr.sx / pr.n) > 0
""",
)
def q_peer_zscore(spark, sf_dir):
    # Peer-relative revenue z-score: each user scored against users of
    # the SAME activity band, not the global mean — the benchmarking
    # view that separates "spends little because they visit little" from
    # "visits a lot, spends anomalously little" (upsell/fraud triage).
    # |bands|-row peer stats broadcast back; decimal-pinned moments,
    # sqrt-only %.9e chain, degenerate-variance bands filtered
    # identically on both engines.
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.floor(
            F.log(F.count(F.lit(1)).cast("double")) / F.log(F.lit(2.0))
        )
        .cast("int")
        .alias("band"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", dec(F.col("value"))
                )
            ),
            F.lit(0).cast("decimal(28,2)"),
        )
        .cast("double")
        .alias("revenue"),
    )
    peer = (
        per.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("revenue"))).cast("double").alias("sx"),
            F.sum(
                (F.col("revenue") * F.col("revenue")).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("sxx"),
        )
        .filter(F.col("n") >= 2)
    )
    n = F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    z = (F.col("revenue") - F.col("sx") / n) / F.sqrt(var)
    return (
        per.join(F.broadcast(peer), "band")
        .filter(var > 0)
        .select(
            "user_id",
            "band",
            "revenue",
            n.cast("bigint").alias("peer_n"),
            sci9(z).alias("peer_z"),
        )
    )


@register(
    "q_activation_validation",
    """
WITH b AS (
    SELECT min(epoch_us(ts)) + 604800000000 AS wk1_end FROM events
),
per AS (
    SELECT e.user_id,
           CAST(count(*) FILTER (epoch_us(e.ts) <= b.wk1_end) AS DOUBLE)
               AS x,
           CAST(coalesce(sum(CASE WHEN epoch_us(e.ts) > b.wk1_end
                                   AND e.event_type = 'purchase'
                 THEN CAST(e.value AS DECIMAL(18,2)) END), 0) AS DOUBLE)
               AS y
    FROM events e CROSS JOIN b
    GROUP BY e.user_id
),
s AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy,
           CAST(sum(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy
    FROM per
)
SELECT CAST(n AS BIGINT) AS n_users,
       printf('%.9e',
              (sxy - sx * sy / n)
              / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
           AS corr_wk1_future_rev
FROM s
WHERE n >= 2 AND (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
""",
)
def q_activation_validation(spark, sf_dir):
    # Activation-metric validation: does week-1 activity PREDICT future
    # revenue?  The correlation between each user's first-calendar-week
    # event count and their post-week-1 purchase revenue — the check a
    # growth team runs before adopting "N events in week 1" as its
    # activation north star.  One user rollup off a broadcast week-1
    # boundary (min(ts) + 7 days in integer µs), one pinned-moment fold,
    # the corr chain under %.9e.
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(
        F.expr(
            "min(unix_micros(CAST(ts AS TIMESTAMP))) + 604800000000"
        ).alias("wk1_end")
    )
    per = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.count_if(us <= F.col("wk1_end")).cast("double").alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        (us > F.col("wk1_end"))
                        & (F.col("event_type") == "purchase"),
                        dec(F.col("value")),
                    )
                ),
                F.lit(0).cast("decimal(28,2)"),
            )
            .cast("double")
            .alias("y"),
        )
    )
    s = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(28,4)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / F.sqrt(vx * vy)
    return (
        s.filter((n >= 2) & (vx > 0) & (vy > 0))
        .select(
            n.cast("bigint").alias("n_users"),
            sci9(corr).alias("corr_wk1_future_rev"),
        )
    )


@register(
    "q_velocity_burst",
    """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS us
    FROM events
),
w AS (
    SELECT user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY us
                          RANGE BETWEEN 60000000 PRECEDING
                                    AND CURRENT ROW) AS burst
    FROM v
)
SELECT user_id,
       CAST(max(burst) AS BIGINT) AS max_burst_60s,
       max(burst) >= 10 AS velocity_flag
FROM w GROUP BY user_id
""",
)
def q_velocity_burst(spark, sf_dir):
    # Velocity check: each user's maximum event count within ANY trailing
    # 60-second window — the classic fraud/abuse rate signal (card
    # testing, scraping, credential stuffing all spike it; flag at >= 10
    # per minute).  The sliding count is a RANGE frame over integer
    # microseconds (event-time, not row-count — F3's range-frame
    # machinery doing real work), one exchange shared with the per-user
    # max.  All integers.
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-60000000, Window.currentRow)
    )
    b = ev.select("user_id", us.alias("us")).select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst")
    )
    return b.groupBy("user_id").agg(
        F.max("burst").cast("bigint").alias("max_burst_60s"),
        (F.max("burst") >= 10).alias("velocity_flag"),
    )


@register(
    "q_price_consistency",
    """
WITH u AS (
    SELECT l_partkey,
           l_extendedprice / l_quantity AS unit_price
    FROM lineitem WHERE l_quantity > 0
),
s AS (
    SELECT l_partkey, count(*) AS n,
           min(unit_price) AS lo, max(unit_price) AS hi
    FROM u GROUP BY l_partkey HAVING count(*) >= 2
)
SELECT CAST(l_partkey AS BIGINT) AS partkey,
       CAST(n AS BIGINT) AS n_lines,
       lo AS min_unit_price, hi AS max_unit_price,
       CAST(floor(hi * 1e9 / lo) AS BIGINT) AS spread_ratio_e9
FROM s
WHERE floor(hi * 1e9 / lo) > 1000000000
ORDER BY spread_ratio_e9 DESC, partkey
LIMIT 100
""",
)
def q_price_consistency(spark, sf_dir):
    # Unit-price consistency screen per part: the max/min unit-price
    # ratio across a part's line items, top-100 widest spreads — the
    # master-data-quality read that catches unit mixups and broken feeds
    # (legitimate TPC-H discount structure gives modest spreads; a 10x
    # ratio is a data bug).  unit_price is the SAME division on every
    # row on both engines, min/max carry those identical doubles, the
    # ratio is floor(x*1e9), and the top-k has a unique (ratio, partkey)
    # tiebreak.
    li = _t(spark, sf_dir, "lineitem")
    u = li.filter(F.col("l_quantity") > 0).select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    s = (
        u.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("unit_price").alias("lo"),
            F.max("unit_price").alias("hi"),
        )
        .filter(F.col("n") >= 2)
    )
    ratio = F.floor(F.col("hi") * 1e9 / F.col("lo")).cast("bigint")
    return (
        s.select(
            F.col("l_partkey").cast("bigint").alias("partkey"),
            F.col("n").cast("bigint").alias("n_lines"),
            F.col("lo").alias("min_unit_price"),
            F.col("hi").alias("max_unit_price"),
            ratio.alias("spread_ratio_e9"),
        )
        .filter(F.col("spread_ratio_e9") > 1000000000)
        .orderBy(F.col("spread_ratio_e9").desc(), "partkey")
        .limit(100)
    )


@register(
    "q_adstock_pressure",
    """
WITH mx AS (
    SELECT max(ts) AS anchor FROM events
),
conv AS (
    SELECT DISTINCT user_id, 1 AS converted
    FROM events WHERE event_type = 'purchase'
),
w AS (
    SELECT e.user_id,
           CAST(1.0 / (CAST(1 AS BIGINT) <<
                least(date_diff('day', CAST(e.ts AS DATE),
                                CAST(m.anchor AS DATE)), 20))
                AS DECIMAL(18,12)) AS wt
    FROM events e CROSS JOIN mx m
    WHERE e.event_type <> 'purchase'
),
per AS (
    SELECT w.user_id,
           CAST(coalesce(c.converted, 0) AS INT) AS converted,
           sum(w.wt) AS adstock
    FROM w LEFT JOIN conv c USING (user_id)
    GROUP BY w.user_id, c.converted
)
SELECT converted,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(CAST(sum(adstock) / count(*) AS DECIMAL(18,8)) AS DOUBLE)
           AS mean_adstock
FROM per GROUP BY converted
""",
)
def q_adstock_pressure(spark, sf_dir):
    # Adstock (geometrically decayed touch pressure, half-life 1 day,
    # anchored at the corpus's latest timestamp) compared between
    # converters and non-converters — the marketing-mix read "does
    # accumulated recent pressure coincide with conversion?".  Weights
    # are the q_decay_attribution exact power-of-two trick (1/(1<<age),
    # never libm pow) decimal-pinned before all sums; the per-arm mean
    # division is pinned to DECIMAL(18,8) before the final double cast
    # (the q_cohort_revenue_ltv discipline).
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("anchor"))
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    age = F.least(
        F.datediff(F.col("anchor").cast("date"), F.col("ts").cast("date")),
        F.lit(20),
    )
    w = (
        ev.filter(F.col("event_type") != "purchase")
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            (F.lit(1.0) / F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " least(datediff(CAST(anchor AS DATE), CAST(ts AS DATE)),"
                " 20))"
            ))
            .cast("decimal(18,12)")
            .alias("wt"),
        )
    )
    per = (
        w.join(F.broadcast(conv), "user_id", "left")
        .groupBy(
            "user_id",
            F.coalesce(F.col("converted"), F.lit(0)).cast("int").alias(
                "converted"
            ),
        )
        .agg(F.sum("wt").alias("adstock"))
    )
    return per.groupBy("converted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.sum("adstock") / F.count(F.lit(1)))
        .cast("decimal(18,8)")
        .cast("double")
        .alias("mean_adstock"),
    )


@register(
    "q_value_hour_heatmap",
    """
SELECT CAST(extract(hour FROM ts) AS INT) AS h,
       CAST(floor(value / 100) AS BIGINT) AS value_band,
       CAST(count(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL AND value >= 0
GROUP BY 1, 2
""",
)
def q_value_hour_heatmap(spark, sf_dir):
    # The hour x value-band density grid behind an ops heatmap ("when do
    # big values happen?") — 24 x bands integer cells from ONE map-side-
    # combinable groupBy; floor(value/100) banding is the explicit-floor
    # discipline (never a bare double->int cast, which rounds differently
    # across engines — the q_round_number_bias finding).
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    return ev.groupBy(
        F.hour("ts").cast("int").alias("h"),
        F.floor(F.col("value") / 100).cast("bigint").alias("value_band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


@register(
    "q_brand_share_trend",
    """
WITH q AS (
    SELECT p.p_brand AS brand,
           CAST(date_trunc('quarter', o.o_orderdate) AS DATE) AS qtr,
           sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4))) AS rev
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
tot AS (
    SELECT qtr, sum(rev) AS trev FROM q GROUP BY qtr
),
share AS (
    SELECT q.brand, q.qtr,
           CAST(floor(CAST(q.rev AS DOUBLE) * 1e9
                      / CAST(t.trev AS DOUBLE)) AS BIGINT) AS share_e9
    FROM q JOIN tot t USING (qtr)
),
edge AS (
    SELECT brand,
           max(CASE WHEN qtr = (SELECT min(qtr) FROM share)
                    THEN share_e9 END) AS first_share,
           max(CASE WHEN qtr = (SELECT max(qtr) FROM share)
                    THEN share_e9 END) AS last_share
    FROM share GROUP BY brand
)
SELECT brand, CAST(first_share AS BIGINT) AS first_share_e9,
       CAST(last_share AS BIGINT) AS last_share_e9,
       CAST(last_share - first_share AS BIGINT) AS share_delta_e9
FROM edge
WHERE first_share IS NOT NULL AND last_share IS NOT NULL
ORDER BY share_delta_e9 DESC, brand
LIMIT 20
""",
)
def q_brand_share_trend(spark, sf_dir):
    # Brand market-share movement: revenue share per quarter, then the
    # top-20 share gainers between the first and last observed quarters
    # — the BI trend read behind "who is winning the category".  The
    # share table is |brands| x |quarters| (aggregate-sized before any
    # division); quarter bounds come from two 1-row broadcast anchors;
    # shares are floor(x*1e9) on exact-decimal casts, the delta is
    # integer, and the top-k carries a unique (delta, brand) tiebreak.
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("quarter", F.col("o_orderdate"))
            .cast("date")
            .alias("qtr"),
        )
        .agg(F.sum(rev).alias("rev"))
    )
    tot = q.groupBy("qtr").agg(F.sum("rev").alias("trev"))
    share = q.join(F.broadcast(tot), "qtr").select(
        "brand",
        "qtr",
        F.floor(
            F.col("rev").cast("double") * 1e9 / F.col("trev").cast("double")
        )
        .cast("bigint")
        .alias("share_e9"),
    )
    bounds = share.agg(
        F.min("qtr").alias("q0"), F.max("qtr").alias("q1")
    )
    edge = (
        share.crossJoin(F.broadcast(bounds))
        .groupBy("brand")
        .agg(
            F.max(
                F.when(F.col("qtr") == F.col("q0"), F.col("share_e9"))
            ).alias("first_share"),
            F.max(
                F.when(F.col("qtr") == F.col("q1"), F.col("share_e9"))
            ).alias("last_share"),
        )
        .filter(
            F.col("first_share").isNotNull()
            & F.col("last_share").isNotNull()
        )
    )
    return (
        edge.select(
            "brand",
            F.col("first_share").cast("bigint").alias("first_share_e9"),
            F.col("last_share").cast("bigint").alias("last_share_e9"),
            (F.col("last_share") - F.col("first_share"))
            .cast("bigint")
            .alias("share_delta_e9"),
        )
        .orderBy(F.col("share_delta_e9").desc(), "brand")
        .limit(20)
    )


@register(
    "q_overdue_users",
    """
WITH mx AS (
    SELECT max(epoch_us(ts)) AS anchor FROM events
),
p AS (
    SELECT user_id, epoch_us(ts) AS us
    FROM events WHERE event_type = 'purchase'
),
per AS (
    SELECT p.user_id,
           count(*) AS n_purchases,
           (max(p.us) - min(p.us)) // (count(*) - 1) AS avg_gap_us,
           any_value(m.anchor) - max(p.us) AS silence_us
    FROM p CROSS JOIN mx m
    GROUP BY p.user_id HAVING count(*) >= 3
)
SELECT user_id, CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(avg_gap_us AS BIGINT) AS avg_gap_us,
       CAST(silence_us AS BIGINT) AS silence_us,
       silence_us > 2 * avg_gap_us AS overdue
FROM per
""",
)
def q_overdue_users(spark, sf_dir):
    # Churn-risk watchlist: users whose CURRENT silence exceeds twice
    # their OWN average purchase cadence — the per-user version of
    # q_repurchase_cycle's population quantiles (a weekly buyer is
    # overdue after two weeks; a quarterly buyer is not).  avg gap =
    # (last - first)/(n-1) is the telescoped exact form (no per-gap
    # materialization); everything is integer microseconds with an
    # integer cross-multiplied verdict — no float anywhere.  One
    # combinable rollup + a broadcast anchor.
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    mx = ev.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("anchor")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("us")
    )
    per = (
        p.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.expr("(max(us) - min(us)) DIV (count(*) - 1)").alias(
                "avg_gap_us"
            ),
            (F.any_value("anchor") - F.max("us")).alias("silence_us"),
        )
        .filter(F.col("n_purchases") >= 3)
    )
    return per.select(
        "user_id",
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
        F.col("avg_gap_us").cast("bigint").alias("avg_gap_us"),
        F.col("silence_us").cast("bigint").alias("silence_us"),
        (F.col("silence_us") > 2 * F.col("avg_gap_us")).alias("overdue"),
    )


@register(
    "q_sax_motifs",
    """
WITH w64 AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events QUALIFY rk <= 64
),
stats AS (
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 64 AS mu,
           sqrt((CAST(sum(CAST(value * value AS DECIMAL(28,4)))
                      AS DOUBLE)
                 - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / 64) / 63) AS sd,
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
),
words AS (
    SELECT event_type, string_agg(ch, '' ORDER BY seg) AS sax
    FROM sym GROUP BY event_type
),
grams AS (
    SELECT DISTINCT event_type, substring(sax, i, 4) AS motif
    FROM words, unnest(range(1, 6)) AS r(i)
)
SELECT motif,
       CAST(count(*) AS BIGINT) AS n_series,
       string_agg(event_type, ',' ORDER BY event_type) AS series_list
FROM grams GROUP BY motif HAVING count(*) >= 2
""",
)
def q_sax_motifs(spark, sf_dir):
    # Cross-series SAX motif discovery: 4-symbol subwords shared by two
    # or more series' SAX signatures — "which series share a local shape
    # pattern" (the motif step SAX exists FOR, Lin/Keogh 2003).  Builds
    # on q_sax_symbols' exact pipeline (decimal window sums,
    # power-of-two divisions, bitwise-identical band compares), then a
    # distinct gram explode over the 8-char words and one count rollup;
    # the member list aggregates with an explicit ORDER so the string is
    # deterministic.  All computation after the signatures is on
    # |series|-sized frames.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w64 = (
        ev.select(
            "event_type", "value", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= 64)
    )
    sx = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    sxx = F.sum(
        (F.col("value") * F.col("value")).cast("decimal(28,4)")
    ).cast("double")
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
    words = sym.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "ch"))),
                lambda s: s.getField("ch"),
            ),
            "",
        ).alias("sax")
    )
    # substring with a column start needs the SQL form
    grams = words.select(
        "event_type",
        F.explode(
            F.expr(
                "transform(sequence(1, 5), i -> substring(sax, i, 4))"
            )
        ).alias("motif"),
    ).distinct()
    return (
        grams.groupBy("motif")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_series"),
            F.array_join(
                F.array_sort(F.collect_list("event_type")), ","
            ).alias("series_list"),
        )
        .filter(F.col("n_series") >= 2)
    )


@register(
    "q_cohort_quality_trend",
    """
WITH first_w AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
size_ AS (
    SELECT cohort_week, count(*) AS cohort_users FROM first_w
    GROUP BY cohort_week
),
active2 AS (
    SELECT DISTINCT f.cohort_week, e.user_id
    FROM events e JOIN first_w f ON e.user_id = f.user_id
    WHERE CAST(date_diff('day', f.cohort_week,
                         CAST(date_trunc('week', e.ts) AS DATE)) / 7
               AS INT) = 2
),
ret AS (
    SELECT s.cohort_week,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(coalesce(a.k, 0) AS BIGINT) AS retained_w2,
           coalesce(a.k, 0) * 1000000000 // s.cohort_users AS ret_e9,
           row_number() OVER (ORDER BY s.cohort_week) AS xi
    FROM size_ s
    LEFT JOIN (SELECT cohort_week, count(*) AS k FROM active2
               GROUP BY cohort_week) a USING (cohort_week)
),
fit AS (
    SELECT count(*) AS n,
           CAST(sum(xi) AS DOUBLE) AS sx,
           CAST(sum(ret_e9) AS DOUBLE) AS sy,
           CAST(sum(xi * xi) AS DOUBLE) AS sxx,
           CAST(sum(xi * ret_e9) AS DOUBLE) AS sxy
    FROM ret
)
SELECT CAST(n AS BIGINT) AS n_cohorts,
       printf('%.9e', (sxy - sx * sy / n) / (sxx - sx * sx / n))
           AS ret_trend_e9_per_cohort
FROM fit WHERE n >= 2 AND (sxx - sx * sx / n) > 0
""",
)
def q_cohort_quality_trend(spark, sf_dir):
    # Cohort-quality trend: is week-2 retention IMPROVING for newer
    # cohorts?  The slope of week-2 retention (ppb) against cohort index
    # — the single number a growth review asks after the q_cohort_
    # retention triangle ("are the cohorts we acquire now stickier than
    # last quarter's?").  Everything is aggregate-sized: the per-cohort
    # retention table is |cohorts| rows, its index window is a bounded
    # spine, and the OLS fold is 1-row over exact integers — the slope
    # is one identical double chain under %.9e.
    ev = _t(spark, sf_dir, "events")
    first_w = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    size = first_w.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    wk = (
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"),
            F.col("cohort_week"),
        )
        / 7
    ).cast("int")
    active2 = (
        ev.join(first_w, "user_id")
        .filter(wk == 2)
        .select("cohort_week", "user_id")
        .distinct()
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # index the |cohorts| spine BEFORE the join so the window's
    # SinglePartition exchange sits directly on the aggregate (the
    # q_lorenz_deciles reorder)
    size = size.withColumn(
        "xi", F.row_number().over(Window.orderBy("cohort_week"))
    )
    ret = size.join(active2, "cohort_week", "left").select(
        "cohort_week",
        "xi",
        F.col("cohort_users").cast("bigint").alias("cohort_users"),
        F.coalesce(F.col("k"), F.lit(0)).cast("bigint").alias("retained_w2"),
        F.expr("coalesce(k, 0) * 1000000000 DIV cohort_users").alias(
            "ret_e9"
        ),
    )
    fit = ret.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").cast("double").alias("sx"),
        F.sum("ret_e9").cast("double").alias("sy"),
        F.sum(F.col("xi") * F.col("xi")).cast("double").alias("sxx"),
        F.sum(F.col("xi") * F.col("ret_e9")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / vx
    return (
        fit.filter((n >= 2) & (vx > 0))
        .select(
            n.cast("bigint").alias("n_cohorts"),
            sci9(slope).alias(
                "ret_trend_e9_per_cohort"
            ),
        )
    )

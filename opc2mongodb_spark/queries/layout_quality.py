"""Query registrations: r5 batch 2: z-order layout, LM-quality scoring, weighted sampling, incremental ingest, winnowing, set-similarity joins, shard manifests.

Mechanically split from the original single-module registry (r9);
registration order and bodies unchanged. Determinism rulebook:
the package docstring (queries/__init__.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opc2mongodb_spark.queries._core import _t, register, sci9
from opc2mongodb_spark.queries.relational import _CAND_CTES, _COS, _SIGS_SQL, _TOK_CTE

_MORTON_SQL = " + ".join(
    f"(((cx >> {i}) & 1) << {2 * i + 1}) + (((cy >> {i}) & 1) << {2 * i})"
    for i in range(8)
)


@register(
    "q_zorder_stats",
    f"""
WITH base AS (
    SELECT CAST(o_custkey AS BIGINT) AS ck,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
    FROM orders
),
ext AS (
    SELECT min(ck) AS xmin, max(ck) AS xmax,
           min(pc) AS ymin, max(pc) AS ymax
    FROM base
),
coded AS (
    SELECT ck, pc,
           (ck - xmin) * 256 // (xmax - xmin + 1) AS cx,
           (pc - ymin) * 256 // (ymax - ymin + 1) AS cy
    FROM base, ext
),
z AS (
    SELECT ck, pc, {_MORTON_SQL} AS zval FROM coded
)
SELECT CAST(least(zval // 1024, 63) AS INTEGER) AS bucket,
       count(*) AS n_rows,
       min(ck) AS x_min, max(ck) AS x_max,
       min(pc) AS y_min, max(pc) AS y_max
FROM z
GROUP BY 1
ORDER BY bucket
""",
)
def q_zorder_stats(spark, sf_dir):
    # Z-order (Morton) re-layout of orders over (custkey, price-cents) and
    # the per-bucket min/max envelope a reader's file pruner would consult —
    # the Delta/Iceberg OPTIMIZE ZORDER strategy as declarative Spark
    # (operators/layout.py). Equi-width integer cells from a broadcast 1-row
    # extent — no ntile global-sort window — and all-long arithmetic, so the
    # oracle replays it bit-exactly. Tight envelopes on BOTH dims are the
    # point: the companion plan test asserts the skipping ratio.
    from opc2mongodb_spark.operators.layout import (
        layout_skipping_stats,
        zorder_layout,
    )

    base = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("ck"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("pc"),
    )
    laid = zorder_layout(base, "ck", "pc", bits=8, n_buckets=64)
    return layout_skipping_stats(laid, "ck", "pc").orderBy("bucket")


@register(
    "q_unigram_nll",
    """
WITH tokall AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
    SELECT tok, count(*) AS c FROM tokall GROUP BY tok
),
tot AS (
    SELECT count(*) AS t FROM tokall
),
lnp AS (
    SELECT tok,
           CAST(ln(CAST(c AS DOUBLE) / t) AS DECIMAL(18,12)) AS lnp
    FROM vocab, tot
),
per_doc AS (
    SELECT doc_id, count(*) AS n, sum(lnp) AS s
    FROM tokall JOIN lnp USING (tok)
    GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       printf('%.9e', -CAST(s AS DOUBLE) / n) AS nll
FROM per_doc
""",
)
def q_unigram_nll(spark, sf_dir):
    # CCNet-style LM quality filter: score every document by its average
    # negative log-likelihood under the corpus's own unigram model — high
    # NLL = rare-token-heavy (possibly noise), low NLL = stopword soup.
    # Scale shape: one token explode, one vocab groupBy (map-side
    # combinable), model joined back token-keyed (at 100 TB the vocab is
    # Zipf-bounded and the join is a plain hash join; no per-doc state).
    # Determinism: each ln(p) is decimal-pinned BEFORE the per-doc sum so
    # summation order can't drift, then one double division, rendered %.9e
    # per the transcendental rule.
    from opc2mongodb_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    tokall = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = tokall.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tokall.agg(F.count(F.lit(1)).alias("t"))
    lnp = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.log(F.col("c").cast("double") / F.col("t"))
        .cast("decimal(18,12)")
        .alias("lnp"),
    )
    per_doc = tokall.join(lnp, "tok").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lnp").alias("s")
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        sci9(-F.col("s").cast("double") / F.col("n")).alias("nll"),
    )


@register(
    "q_weighted_sample",
    """
WITH keyed AS (
    SELECT doc_id,
           CAST(CAST(
               -ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|ws'),
                                           1, 13) AS BIGINT) + 1)
                   / 4503599627370496.0)
               / greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1)
           AS DECIMAL(18,12)) AS DOUBLE) AS es_key
    FROM documents
)
SELECT doc_id, es_key
FROM keyed
ORDER BY es_key, doc_id
LIMIT 100
""",
)
def q_weighted_sample(spark, sf_dir):
    # Weighted sampling without replacement (Efraimidis-Spirakis A-ES): draw
    # 100 docs with probability proportional to length by taking the k
    # SMALLEST exponential keys -ln(u)/w. u is hash-derived from the stable
    # doc id (52-bit md5 prefix), so the "random" draw is deterministic and
    # oracle-replayable — the rand() trap q_stratified_sample documents.
    # Scale shape: pure map expression + TakeOrdered top-k; no full sort, no
    # shuffle beyond the k-row reduction. The key is decimal-pinned before
    # ordering so cross-engine ulp drift in ln() can't flip ranks; doc_id
    # breaks pin-induced ties per the ORDER BY convention.
    from opc2mongodb_spark.functions.sampling import weighted_sample_key
    from opc2mongodb_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    key = weighted_sample_key(F.col("doc_id"), token_count(F.col("text")))
    return (
        d.select("doc_id", key.alias("es_key"))
        .orderBy("es_key", "doc_id")
        .limit(100)
    )


@register(
    "q_incr_agg_merge",
    """
SELECT o_custkey,
       count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            / count(*) AS DOUBLE) AS avg_v,
       min(o_totalprice) AS min_v,
       max(o_totalprice) AS max_v
FROM orders
GROUP BY o_custkey
""",
)
def q_incr_agg_merge(spark, sf_dir):
    # Materialized-view maintenance (operators/incremental.py): the grouped
    # aggregate is kept as mergeable partial state and each new batch folds
    # in at |keys| + |batch| cost — history is never re-scanned. Here the
    # orders table is split at 1997-01-01 into "history state" and "delta",
    # merged, and finished; the oracle recomputes from scratch, so the hash
    # match IS the proof that merge == recompute (associativity of the
    # decimal-pinned state). At 100 TB this replaces a daily full-table
    # re-aggregation with a delta-sized one.
    from opc2mongodb_spark.operators.incremental import (
        finish_view,
        merge_agg_state,
        partial_agg_state,
    )

    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    hist = partial_agg_state(
        o.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], "o_totalprice"
    )
    delta = partial_agg_state(
        o.filter(F.col("o_orderdate") >= cutoff), ["o_custkey"], "o_totalprice"
    )
    return finish_view(merge_agg_state(hist, delta))


@register(
    "q_lang_entropy",
    """
WITH c AS (
    SELECT lang, count(*) AS c FROM documents GROUP BY lang
),
t AS (
    SELECT sum(c) AS t FROM c
)
SELECT CAST(count(*) AS BIGINT) AS n_langs,
       printf('%.9e',
              -CAST(sum(CAST((CAST(c AS DOUBLE) / t)
                             * ln(CAST(c AS DOUBLE) / t)
                        AS DECIMAL(18,12))) AS DOUBLE)) AS entropy_nats
FROM c, t
""",
)
def q_lang_entropy(spark, sf_dir):
    # Corpus-balance diagnostic: Shannon entropy (nats) of the language
    # distribution — the one-number answer to "how skewed is my training
    # mix" (max ln(n_langs) = perfectly balanced). Pairs with q_source_mix /
    # q_mix_rebalance: entropy is the monitoring metric, rebalance the
    # corrective action. Tiny aggregate (|langs| rows) off a map-side
    # combinable count; each p*ln(p) term is decimal-pinned before the sum,
    # final render %.9e per the transcendental rule.
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    t = c.agg(F.sum("c").alias("t"))
    p = F.col("c").cast("double") / F.col("t")
    term = (p * F.log(p)).cast("decimal(18,12)")
    return (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            sci9(-F.sum(term).cast("double")).alias("entropy_nats"),
        )
    )


@register(
    "q_corpus_diff",
    r"""
WITH old AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id % 10 <> 3
),
new AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(
               CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END
           ), '\s+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id % 10 <> 7
)
SELECT doc_id,
       CASE WHEN old.fp IS NULL THEN 'added'
            WHEN new.fp IS NULL THEN 'removed'
            WHEN old.fp <> new.fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL JOIN new USING (doc_id)
""",
)
def q_corpus_diff(spark, sf_dir):
    # Corpus version diff — the data-versioning audit run between two corpus
    # snapshots before a training run: added / removed / changed / unchanged
    # per document, where "changed" means the normalized-content fingerprint
    # moved (metadata-only edits don't count). Two simulated versions are
    # carved deterministically from the one documents table (v1 lacks the
    # %10==3 ids, v2 lacks %10==7 and revises every %5==0 text). Scale
    # shape: both sides reduce to (id, md5) BEFORE the full-outer join, so
    # the shuffle moves 48-byte rows, never text; fingerprints are uniform
    # keys (no skew). At 100 TB this is how you diff two snapshot manifests
    # without reading either corpus's payload twice.
    from opc2mongodb_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 != 3).select(
        "doc_id", fingerprint(F.col("text")).alias("fp_old")
    )
    new_text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    new = d.filter(F.col("doc_id") % 10 != 7).select(
        "doc_id", fingerprint(new_text).alias("fp_new")
    )
    joined = old.join(new, "doc_id", "full_outer")
    return joined.select(
        "doc_id",
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


@register(
    "q_bigram_nll",
    """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i])) AS w1,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i + 1])) AS w2
    FROM toks
),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
v AS (
    SELECT count(DISTINCT tok) AS v
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
),
lnp AS (
    SELECT w1, w2,
           CAST(ln((c2 + 0.5) / (c1 + 0.5 * v)) AS DECIMAL(18,12)) AS lnp
    FROM c2 JOIN c1 USING (w1), v
),
per_doc AS (
    SELECT doc_id, count(*) AS n, sum(lnp) AS s
    FROM bg JOIN lnp USING (w1, w2)
    GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bigrams,
       printf('%.9e', -CAST(s AS DOUBLE) / n) AS nll2
FROM per_doc
""",
)
def q_bigram_nll(spark, sf_dir):
    # Second-order LM quality filter: per-document average NLL under an
    # add-k-smoothed bigram model of the corpus itself (k=0.5) — catches
    # scrambled/concatenated text that unigram NLL scores as normal, since
    # local word ORDER is what a bigram model prices. Conditional
    # denominator is the left-context count c(w1,*); vocabulary size enters
    # through the smoothing mass. Scale shape: one bigram explode (spread
    # pre-explode like q_bigrams), two map-side-combinable counts, the
    # model joined back (w1,w2)-keyed at |positions| cost — no per-doc
    # state, no UDFs. Determinism: smoothing arithmetic is exact-integer +
    # one IEEE division, ln decimal-pinned before the per-doc sum, final
    # render %.9e. Docs with <2 tokens have no bigram positions and drop
    # out identically on both engines.
    from opc2mongodb_spark.functions.text import tokens
    from opc2mongodb_spark.plans.spread import spread

    d = spread(_t(spark, sf_dir, "documents"), "doc_id")
    t = F.split(F.col("text"), " ")
    # zip_with over shifted slices: the transform(sequence, i ->
    # element_at(t, i)...) form re-evaluates t per exploded pair (the
    # ngram_concat hazard, struct flavor — lambdas here read only their
    # own arguments)
    m = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(t, 1, m),
        F.slice(t, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    v = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .agg(F.count_distinct(F.col("tok")).alias("v"))
    )
    lnp = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c2") + F.lit(0.5)) / (F.col("c1") + F.lit(0.5) * F.col("v"))
            )
            .cast("decimal(18,12)")
            .alias("lnp"),
        )
    )
    per_doc = bg.join(lnp, ["w1", "w2"]).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lnp").alias("s")
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_bigrams"),
        sci9(-F.col("s").cast("double") / F.col("n")).alias(
            "nll2"
        ),
    )


# Per-user sequence bound for q_event_pattern: patterns are matched over
# each user's LATEST this-many events. Interpolated into the SQL twin so
# the two sides cannot desync (the gate SFs max out at 86 events/user and
# would never catch a drift).
EVENT_PATTERN_CAP = 1000


@register(
    "q_event_pattern",
    f"""
WITH ranked AS (
    SELECT user_id, ts, event_id, substring(event_type, 1, 1) AS ch,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
),
seq AS (
    SELECT user_id,
           count(*) AS n_events,
           string_agg(ch, '' ORDER BY ts, event_id) AS s
    FROM ranked
    WHERE rn <= {EVENT_PATTERN_CAP}
    GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, 'ee+')) AS INTEGER) AS n_error_bursts,
       CAST(len(regexp_extract_all(s, 'ee+p')) AS INTEGER)
           AS n_error_then_buy
FROM seq
""",
)
def q_event_pattern(spark, sf_dir):
    # CEP-lite sequence-pattern detection (the MATCH_RECOGNIZE use case
    # without the syntax): each user's event stream collapses to a
    # character string in exact (ts, event_id) order — event types map to
    # their UNIQUE first letters (injectivity asserted by
    # test_event_pattern_letter_alphabet_is_injective) — and behavioral
    # patterns become plain regexes over it: 'ee+' = repeated-error burst,
    # 'ee+p' = error burst immediately followed by a purchase (rage-buy
    # signal). Greedy non-overlapping match counts agree between Java
    # regex and RE2 for this common subset (the q_pii_scrub discipline).
    # BOUNDED (r6): the sequence covers each user's LATEST
    # EVENT_PATTERN_CAP events — without the cap a bot user's collect_list
    # buffers its whole history in one aggregation task (the 100 TB
    # straggler). The cap is a row_number window (spillable sort, never an
    # unbounded in-memory array) on both engines; n_events counts the
    # CONSIDERED (capped) events so the metric stays internally
    # consistent. Human users fall far below the cap (max/user is 86 at
    # the gate SFs), so results are unchanged there. Scale shape:
    # one user_id shuffle — the groupBy reuses the window's partitioning;
    # per-group state is <= cap rows. For unbounded machine streams
    # sessionize first (q_sessionize) and pattern-match per session.
    ev = _t(spark, sf_dir, "events")
    ch = F.substring("event_type", 1, 1)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    capped = (
        ev.select("user_id", "ts", "event_id", ch.alias("ch"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVENT_PATTERN_CAP)
    )
    seq = capped.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
        ).alias("s"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.regexp_count(F.col("s"), F.lit("ee+")).cast("int").alias(
            "n_error_bursts"
        ),
        F.regexp_count(F.col("s"), F.lit("ee+p")).cast("int").alias(
            "n_error_then_buy"
        ),
    )


@register(
    "q_skyline2d",
    """
WITH pts AS (
    SELECT DISTINCT o_totalprice AS x, o_orderdate AS y FROM orders
),
s AS (
    SELECT x, y,
           max(y) OVER (ORDER BY x DESC, y DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS my
    FROM pts
)
SELECT x AS price, y AS odate
FROM s
WHERE my IS NULL OR y > my
""",
)
def q_skyline2d(spark, sf_dir):
    # 2-D skyline (Pareto frontier): the orders no other order beats on
    # BOTH total price and recency — the classic multi-criteria shortlist
    # operator (Borzsony/Kossmann/Stocker ICDE'01). The 2-D form needs no
    # quadratic dominance join: sort by x desc and a point survives iff its
    # y strictly exceeds the running max of every higher-x point (one
    # window). Scale shape: the skyline DISTRIBUTES — skyline(union of
    # partial skylines) == skyline(all) — so phase 1 computes per-bucket
    # partial skylines under a partitioned window (32-way, no global sort
    # of the data), and only the surviving candidates (frontier-sized)
    # enter the final global window. The oracle computes the single-window
    # form directly; bucketing-invariance makes the results identical by
    # construction. Exact value compares only (doubles/timestamps carried,
    # never derived), distinct (x, y) first so duplicate points can't
    # self-dominate.
    o = _t(spark, sf_dir, "orders")
    pts = o.select(
        F.col("o_totalprice").alias("x"), F.col("o_orderdate").alias("y")
    ).distinct()
    bucketed = pts.withColumn("b", F.pmod(F.abs(F.hash("x")), F.lit(32)))
    w1 = (
        Window.partitionBy("b")
        .orderBy(F.col("x").desc(), F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = bucketed.withColumn("my", F.max("y").over(w1)).filter(
        F.col("my").isNull() | (F.col("y") > F.col("my"))
    )
    w2 = (
        Window.orderBy(F.col("x").desc(), F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        cand.select("x", "y")
        .withColumn("my", F.max("y").over(w2))
        .filter(F.col("my").isNull() | (F.col("y") > F.col("my")))
        .select(F.col("x").alias("price"), F.col("y").alias("odate"))
    )


@register(
    "q_kmv_set_ops",
    """
WITH ua AS (
    SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS hv
    FROM events WHERE event_type = 'purchase'
),
ub AS (
    SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS hv
    FROM events WHERE event_type = 'error'
),
un AS (
    SELECT hv, max(a) AS a, max(b) AS b
    FROM (
        SELECT hv, 1 AS a, 0 AS b FROM ua
        UNION ALL
        SELECT hv, 0 AS a, 1 AS b FROM ub
    )
    GROUP BY hv
),
tot AS (
    SELECT count(*) AS n, sum(a * b) AS exact_inter FROM un
),
rk AS (
    SELECT hv, a, b, row_number() OVER (ORDER BY hv) AS rk FROM un
),
topk AS (
    SELECT rk.*, tot.n, tot.exact_inter
    FROM rk, tot WHERE rk <= least(16, n)
),
agg AS (
    SELECT max(n) AS n,
           max(exact_inter) AS exact_inter,
           sum(a * b) AS k_inter,
           max(CASE WHEN rk = least(16, n) THEN hv END) AS kth_hv
    FROM topk
),
est AS (
    SELECT n, exact_inter, k_inter,
           CASE WHEN n <= 16 THEN n
                ELSE CAST(round(
                    15 / (CAST(CAST(('0x' || substring(kth_hv, 1, 15)) AS BIGINT)
                               AS DOUBLE)
                          / CAST(CAST('0xfffffffffffffff' AS BIGINT) AS DOUBLE))
                ) AS BIGINT) END AS union_est
    FROM agg
)
SELECT CAST(n AS BIGINT) AS exact_union,
       CAST(exact_inter AS BIGINT) AS exact_inter,
       CAST(least(16, n) AS BIGINT) AS k_used,
       CAST(k_inter AS BIGINT) AS k_inter,
       CAST(union_est AS BIGINT) AS union_est,
       CAST(CASE WHEN n <= 16 THEN exact_inter
            ELSE CAST(round(CAST(k_inter AS DOUBLE) / least(16, n)
                            * union_est) AS BIGINT) END AS BIGINT)
           AS inter_est
FROM est
""",
)
def q_kmv_set_ops(spark, sf_dir):
    # KMV sketch ALGEBRA (the reason mergeable sketches exist): estimate
    # |A ∪ B| and |A ∩ B| for two user cohorts (purchasers vs error-hitters)
    # from their k-minimum-values sketches alone. Union sketch = k smallest
    # hashes of the hash-union; intersection via the Jaccard-over-sketch
    # trick — the fraction of the union sketch's k hashes belonging to both
    # cohorts, times the union estimate (Bar-Yossef et al. 2002 / theta-
    # sketch a-not-b family). Exact counts ride along as the audit. Scale
    # shape: the global k-smallest uses the two-phase top-k discipline
    # (per-bucket k-minima under a partitioned window, then the global
    # window over <=32*16 candidates — never a full global sort); the
    # oracle computes the single-window form, identical by the top-k
    # distributivity. md5 hash space is engine-neutral; estimates are
    # fixed IEEE division chains off exact integers.
    ev = _t(spark, sf_dir, "events")
    hv = F.md5(F.col("user_id").cast("string")).alias("hv")
    ua = ev.filter(F.col("event_type") == "purchase").select(hv).distinct()
    ub = ev.filter(F.col("event_type") == "error").select(hv).distinct()
    un = (
        ua.select("hv", F.lit(1).alias("a"), F.lit(0).alias("b"))
        .unionAll(ub.select("hv", F.lit(0).alias("a"), F.lit(1).alias("b")))
        .groupBy("hv")
        .agg(F.max("a").alias("a"), F.max("b").alias("b"))
    )
    tot = un.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("a") * F.col("b")).alias("exact_inter")
    )
    k = 16
    bucketed = un.withColumn("bk", F.pmod(F.abs(F.hash("hv")), F.lit(32)))
    w1 = Window.partitionBy("bk").orderBy(F.col("hv").asc())
    cand = bucketed.withColumn("rk1", F.row_number().over(w1)).filter(
        F.col("rk1") <= k
    )
    w2 = Window.orderBy(F.col("hv").asc())
    topk = (
        cand.withColumn("rk", F.row_number().over(w2))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("rk") <= F.least(F.lit(k), F.col("n")))
    )
    frac = F.conv(F.substring("kth_hv", 1, 15), 16, 10).cast("double") / F.conv(
        F.lit("f" * 15), 16, 10
    ).cast("double")
    agg = topk.agg(
        F.max("n").alias("n"),
        F.max("exact_inter").alias("exact_inter"),
        F.sum(F.col("a") * F.col("b")).alias("k_inter"),
        F.max(
            F.when(F.col("rk") == F.least(F.lit(k), F.col("n")), F.col("hv"))
        ).alias("kth_hv"),
    )
    est = agg.select(
        "n",
        "exact_inter",
        "k_inter",
        F.when(F.col("n") <= k, F.col("n"))
        .otherwise(F.round(F.lit(k - 1) / frac).cast("long"))
        .cast("long")
        .alias("union_est"),
    )
    return est.select(
        F.col("n").cast("long").alias("exact_union"),
        F.col("exact_inter").cast("long").alias("exact_inter"),
        F.least(F.lit(k), F.col("n")).cast("long").alias("k_used"),
        F.col("k_inter").cast("long").alias("k_inter"),
        F.col("union_est").cast("long").alias("union_est"),
        F.when(F.col("n") <= k, F.col("exact_inter"))
        .otherwise(
            F.round(
                F.col("k_inter").cast("double")
                / F.least(F.lit(k), F.col("n"))
                * F.col("union_est")
            ).cast("long")
        )
        .cast("long")
        .alias("inter_est"),
    )


@register(
    "q_abtest_lift",
    """
WITH conv AS (
    SELECT user_id,
           CAST(user_id % 2 AS INTEGER) AS grp,
           max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1
                    ELSE 0 END) AS c
    FROM events
    GROUP BY user_id
),
g AS (
    SELECT grp, count(*) AS n, sum(c) AS conv FROM conv GROUP BY grp
),
w AS (
    SELECT max(CASE WHEN grp = 0 THEN n END) AS n_a,
           max(CASE WHEN grp = 0 THEN conv END) AS c_a,
           max(CASE WHEN grp = 1 THEN n END) AS n_b,
           max(CASE WHEN grp = 1 THEN conv END) AS c_b
    FROM g
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
       CAST(c_a AS DOUBLE) / n_a AS p_a,
       CAST(c_b AS DOUBLE) / n_b AS p_b,
       CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a AS lift,
       CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
            ELSE (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
            END AS z_score
FROM w
""",
)
def q_abtest_lift(spark, sf_dir):
    # Experimentation analytics: two-proportion z-test for HIGH-VALUE
    # purchase conversion (value > 180 — strict enough that conversion is
    # partial at every SF, so the gate exercises the real z branch, not
    # the degenerate NULL guard) between deterministic id-hash cohorts (the A/B assignment
    # every large platform computes downstream of a curation pipeline).
    # Per-user conversion is one groupBy; group totals a |users|-row
    # rollup; the final stats are a fixed IEEE chain off exact integers —
    # division and sqrt are correctly-rounded IEEE ops, so raw doubles
    # hash-match cross-engine with no %.9e render needed (the same class
    # as q_embedding_norms' dot fold). Scale: two map-side-combinable
    # aggregations, 1-row output.
    ev = _t(spark, sf_dir, "events")
    conv = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 180),
                    1,
                ).otherwise(0)
            ).alias("c")
        )
        .select((F.col("user_id") % 2).cast("int").alias("grp"), "c")
    )
    g = conv.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("conv")
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("c_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    # degenerate experiments (zero or universal conversion) have no pooled
    # variance — the z statistic is undefined; emit NULL on both engines
    # instead of tripping ANSI division-by-zero.
    degenerate = (F.col("c_a") + F.col("c_b") == 0) | (
        F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")
    )
    z = F.when(degenerate, F.lit(None).cast("double")).otherwise(
        (p_b - p_a)
        / F.sqrt(
            pool
            * (F.lit(1) - pool)
            * (
                F.lit(1).cast("double") / F.col("n_a")
                + F.lit(1).cast("double") / F.col("n_b")
            )
        )
    )
    return w.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("conv_b"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (p_b - p_a).alias("lift"),
        z.alias("z_score"),
    )


@register(
    "q_rendezvous_shard",
    """
WITH scored AS (
    SELECT doc_id, s, md5(CAST(doc_id AS VARCHAR) || '|' || s) AS h
    FROM documents, (SELECT unnest(generate_series(0, 8)) AS s)
),
pick9 AS (
    SELECT doc_id, arg_max(s, h) AS shard9
    FROM scored GROUP BY doc_id
),
pick8 AS (
    SELECT doc_id, arg_max(s, h) AS shard8
    FROM scored WHERE s < 8 GROUP BY doc_id
)
SELECT CAST(shard9 AS INTEGER) AS shard9,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved,
       CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS move_frac
FROM pick9 JOIN pick8 USING (doc_id)
GROUP BY shard9
ORDER BY shard9
""",
)
def q_rendezvous_shard(spark, sf_dir):
    # Rendezvous (highest-random-weight) sharding — the consistent-hashing
    # family member with an exact md5 replay: each doc goes to the shard
    # whose (doc, shard) hash is highest, so growing 8 -> 9 shards moves
    # only the docs whose NEW shard wins (~1/9 of the corpus) instead of
    # the ~8/9 a mod-N reshard moves. The audit reports, per new shard,
    # how many residents arrived by movement. Scale shape: the Spark side
    # is a PURE MAP expression — greatest() over 9 (hash, shard) structs
    # per row, no explode, no join; the only shuffle is the |shards|-row
    # report rollup. The oracle replays via cross-join + arg_max (same
    # result, engine-idiomatic plan). md5 ties are impossible (distinct
    # inputs), so the argmax is total on both engines.
    d = _t(spark, sf_dir, "documents")

    def pick(n: int) -> F.Column:
        return F.greatest(
            *[
                F.struct(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(f"|{s}")
                        )
                    ).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n)
            ]
        )["s"]

    assigned = d.select(
        "doc_id",
        pick(8).alias("shard8"),
        pick(9).alias("shard9"),
    )
    return (
        assigned.groupBy(F.col("shard9").cast("int").alias("shard9"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
        .select(
            "shard9",
            "n_docs",
            "n_moved",
            (
                F.col("n_moved").cast("double") / F.col("n_docs").cast("double")
            ).alias("move_frac"),
        )
        .orderBy("shard9")
    )


@register(
    "q_shard_manifest",
    r"""
WITH fp AS (
    SELECT doc_id,
           CAST(doc_id % 8 AS INTEGER) AS shard,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
    FROM documents
)
SELECT shard,
       count(*) AS n_docs,
       CAST(bit_xor(CAST(('0x' || substring(f, 1, 15)) AS BIGINT)) AS BIGINT)
           AS fp_xor_hi,
       CAST(bit_xor(CAST(('0x' || substring(f, 17, 15)) AS BIGINT)) AS BIGINT)
           AS fp_xor_lo
FROM fp
GROUP BY shard
ORDER BY shard
""",
)
def q_shard_manifest(spark, sf_dir):
    # Dataset reproducibility manifest: per training shard, a CONTENT hash
    # of the member set — publish it with a training run and any later
    # rebuild can prove byte-equivalence shard by shard. The set hash is an
    # XOR fold of each member's normalized-content fingerprint (split into
    # two 60-bit lanes): order-insensitive and MERGEABLE, so it map-side
    # combines like a sum — no sorted collect_list concat, whose per-group
    # state is the whole shard (the scale trap for a set digest). XOR set
    # hashing trades Merkle-tree tamper evidence for O(1) mergeable state;
    # for corpus-equality auditing that is the right trade. All-integer
    # output, exact cross-engine.
    from opc2mongodb_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    f = fingerprint(F.col("text"))
    lane = lambda start: F.conv(F.substring(f, start, 15), 16, 10).cast("bigint")
    return (
        d.select(
            (F.col("doc_id") % 8).cast("int").alias("shard"),
            lane(1).alias("_hi"),
            lane(17).alias("_lo"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.bit_xor("_hi").cast("long").alias("fp_xor_hi"),
            F.bit_xor("_lo").cast("long").alias("fp_xor_lo"),
        )
        .orderBy("shard")
    )


@register(
    "q_split_leakage",
    f"""
WITH {_TOK_CTE}, {_SIGS_SQL},
{_CAND_CTES},
sp AS (
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 < 96 THEN 'train'
                WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 < 98 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       count(*) AS n_pairs
FROM cand c
JOIN sp sa ON sa.doc_id = c.a_id
JOIN sp sb ON sb.doc_id = c.b_id
GROUP BY 1, 2
ORDER BY split_lo, split_hi
""",
)
def q_split_leakage(spark, sf_dir):
    # Train/test LEAKAGE audit — the contamination check every eval
    # pipeline needs: how many near-duplicate pairs (MinHash-LSH
    # candidates with signature agreement >= 0.5, the q_dedup_minhash
    # chain) STRADDLE the train/val/test boundary? A (train, test) pair
    # means the held-out doc has a near-copy in training data and its eval
    # signal is contaminated; the within-split diagonal is the baseline
    # density. Split membership is the same pure-id md5 formula as
    # q_split_assign, so the audit is stable under re-runs and corpus
    # growth. Scale shape: the pair generator is the capped LSH chain
    # (never all-pairs); splits attach by two id-keyed joins at |pairs|;
    # the matrix is a <=6-row rollup. Unordered pair cells are canonical-
    # ized with least/greatest so (train, test) and (test, train) count as
    # one cell on both engines.
    from opc2mongodb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, "doc_id", "text")
    pairs = lsh_candidate_pairs(sigs, "doc_id").filter(
        F.col("est_jaccard") >= 0.5
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    sp = d.select(
        "doc_id",
        F.when(bucket < 96, F.lit("train"))
        .when(bucket < 98, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sa = sp.select(F.col("doc_id").alias("a_id"), F.col("split").alias("_sa"))
    sb = sp.select(F.col("doc_id").alias("b_id"), F.col("split").alias("_sb"))
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .groupBy(
            F.least(F.col("_sa"), F.col("_sb")).alias("split_lo"),
            F.greatest(F.col("_sa"), F.col("_sb")).alias("split_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("split_lo", "split_hi")
    )


@register(
    "q_seasonal_residual",
    """
WITH m AS (
    SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS hod_mean
    FROM events
    GROUP BY 1, 2
)
SELECT e.event_id, e.event_type,
       CAST(hour(e.ts) AS INTEGER) AS hod,
       e.value, m.hod_mean,
       e.value - m.hod_mean AS residual
FROM events e
JOIN m ON m.event_type = e.event_type AND m.hod = CAST(hour(e.ts) AS INTEGER)
ORDER BY abs(e.value - m.hod_mean) DESC, e.event_id
LIMIT 50
""",
)
def q_seasonal_residual(spark, sf_dir):
    # Seasonal-baseline anomaly scoring: the hour-of-day mean per event
    # type is the seasonal-naive forecast, and the largest |value -
    # hod_mean| residuals are the observations the DAILY CYCLE cannot
    # explain — complementing q_anomaly_zscore, whose global moments flag
    # nighttime lows as anomalies even when they happen every night. Scale
    # shape: the baseline is a map-side-combinable rollup into <=|types|*24
    # rows that BROADCASTS back onto the fact scan (plan-asserted); top-50
    # is TakeOrdered, no full sort. Determinism: decimal-pinned mean sum,
    # one double division, residual arithmetic on exact operands; the
    # ORDER BY carries event_id as the unique tiebreaker.
    ev = _t(spark, sf_dir, "events")
    hod = F.hour("ts").cast("int")
    m = (
        ev.groupBy(F.col("event_type"), hod.alias("hod"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("hod_mean")
        )
    )
    joined = ev.select(
        "event_id", "event_type", hod.alias("hod"), "value"
    ).join(F.broadcast(m), ["event_type", "hod"])
    return (
        joined.select(
            "event_id",
            "event_type",
            "hod",
            "value",
            "hod_mean",
            (F.col("value") - F.col("hod_mean")).alias("residual"),
        )
        .orderBy(F.abs(F.col("residual")).desc(), F.col("event_id"))
        .limit(50)
    )


@register(
    "q_iqr_outliers",
    """
WITH t AS (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n
    FROM documents
),
b AS (
    SELECT lang,
           quantile_cont(n, 0.25) AS q25,
           quantile_cont(n, 0.75) AS q75
    FROM t GROUP BY lang
)
SELECT t.lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN t.n < b.q25 - 1.5 * (b.q75 - b.q25)
                       OR t.n > b.q75 + 1.5 * (b.q75 - b.q25)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       max(b.q25 - 1.5 * (b.q75 - b.q25)) AS lo_bound,
       max(b.q75 + 1.5 * (b.q75 - b.q25)) AS hi_bound
FROM t JOIN b USING (lang)
GROUP BY t.lang
ORDER BY t.lang
""",
)
def q_iqr_outliers(spark, sf_dir):
    # Robust (Tukey-fence) length outlier gate per language: docs outside
    # [q25 - 1.5*IQR, q75 + 1.5*IQR] of their language's token-count
    # distribution — the quartile-based complement of q_anomaly_zscore,
    # immune to the outliers it hunts (moments are not). Determinism: the
    # quantiles interpolate an INTEGER column at quarter positions, so
    # every bound is an exact binary fraction (quarters x 1.5 = eighths)
    # and the fence comparisons are exact on both engines — the
    # q_exact_quantiles argument. Scale shape: per-lang quartiles buffer
    # bounded groups (|langs| of them); the <=|langs|-row bounds table
    # broadcasts back onto the scan; output is a |langs|-row audit.
    from opc2mongodb_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", token_count(F.col("text")).alias("n"))
    b = t.groupBy("lang").agg(
        F.percentile("n", 0.25).alias("q25"),
        F.percentile("n", 0.75).alias("q75"),
    )
    iqr = F.col("q75") - F.col("q25")
    lo = F.col("q25") - 1.5 * iqr
    hi = F.col("q75") + 1.5 * iqr
    return (
        t.join(F.broadcast(b), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when((F.col("n") < lo) | (F.col("n") > hi), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.max(lo).alias("lo_bound"),
            F.max(hi).alias("hi_bound"),
        )
        .orderBy("lang")
    )


@register(
    "q_zipf_fit",
    """
WITH v AS (
    SELECT tok, count(*) AS f
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
),
r AS (
    SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rk FROM v
),
c AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
                         AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(ln(CAST(f AS DOUBLE)) * ln(CAST(f AS DOUBLE))
                         AS DECIMAL(28,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(f AS DOUBLE))
                         AS DECIMAL(28,12))) AS DOUBLE) AS sxy
    FROM r
)
SELECT CAST(n AS BIGINT) AS vocab_size,
       printf('%.9e', (n * sxy - sx * sy) / (n * sxx - sx * sx)) AS zipf_slope,
       CASE WHEN n * syy - sy * sy = 0 THEN NULL
            ELSE printf('%.9e', (n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))) END AS r2
FROM c
""",
)
def q_zipf_fit(spark, sf_dir):
    # Corpus-law diagnostic: least-squares slope of the log-log
    # rank-frequency curve — natural text sits near the Zipf slope of -1,
    # and large deviations flag synthetic/templated/boilerplate-heavy
    # corpora before they poison a training mix. Determinism: each ln term
    # (and each ln product) is decimal-pinned BEFORE the component sums
    # (the q_corr_manual discipline), the closed-form slope/r2 is a fixed
    # double expression, rendered %.9e; zero-variance frequency columns
    # yield NULL r2 on both engines. Scale shape: the ranking window runs
    # over the VOCABULARY (Zipf-bounded), never the corpus; everything
    # else is map-side-combinable sums into one row.
    from opc2mongodb_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    v = d.select(F.explode(tokens(F.col("text"))).alias("tok")).groupBy(
        "tok"
    ).agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("tok"))
    r = v.select("f", F.row_number().over(w).alias("rk"))
    lx = F.log(F.col("rk").cast("double"))
    ly = F.log(F.col("f").cast("double"))
    c = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(lx.cast("decimal(18,12)")).cast("double").alias("sx"),
        F.sum(ly.cast("decimal(18,12)")).cast("double").alias("sy"),
        F.sum((lx * lx).cast("decimal(28,12)")).cast("double").alias("sxx"),
        F.sum((ly * ly).cast("decimal(28,12)")).cast("double").alias("syy"),
        F.sum((lx * ly).cast("decimal(28,12)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return c.select(
        n.cast("long").alias("vocab_size"),
        sci9(cov / varx).alias("zipf_slope"),
        F.when(vary == 0, F.lit(None).cast("string"))
        .otherwise(sci9(cov * cov / (varx * vary)))
        .alias("r2"),
    )


@register(
    "q_embedding_drift",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (
    SELECT CAST(vec_id % 2 AS INTEGER) AS epoch, t.d AS dim,
           CAST(sum(CAST(v[t.d] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m,
           count(*) AS cnt
    FROM e, range(1, 65) t(d)
    GROUP BY 1, 2
),
mv AS (
    SELECT epoch, max(cnt) AS n_vecs, list(m ORDER BY dim) AS mvec
    FROM comp GROUP BY epoch
)
SELECT CAST(a.n_vecs AS BIGINT) AS n_epoch0,
       CAST(b.n_vecs AS BIGINT) AS n_epoch1,
       printf('%.9e', list_dot_product(a.mvec, b.mvec)
              / (sqrt(list_dot_product(a.mvec, a.mvec))
                 * sqrt(list_dot_product(b.mvec, b.mvec)))) AS mean_cosine
FROM mv a, mv b
WHERE a.epoch = 0 AND b.epoch = 1
""",
)
def q_embedding_drift(spark, sf_dir):
    # Embedding-distribution drift audit — the MLOps check between ingest
    # epochs or embedder versions: cosine between the two epochs' MEAN
    # vectors (near 1.0 = stable distribution; a drop flags an embedder
    # change or a content shift that silently breaks ANN indexes and
    # semantic-dedup thresholds downstream). Epochs are carved by vec_id
    # parity. Scale shape: the mean vector uses the kmeans two-phase
    # decimal-pinned posexplode sum (per-task state bounded by 2 x D,
    # never by epoch size); the final cosine folds two broadcast D-length
    # arrays in index order (bit-identical to DuckDB's list_dot_product,
    # the q_embedding_norms result), rendered %.9e.
    from opc2mongodb_spark.functions.vectors import dot

    e = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2).cast("int").alias("epoch"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    comp = (
        e.select("epoch", F.posexplode("v").alias("pos", "val"))
        .groupBy("epoch", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    mv = comp.groupBy("epoch").agg(
        F.max("cnt").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
        ).alias("mvec"),
    )
    a = mv.filter(F.col("epoch") == 0).select(
        F.col("n_vecs").alias("n_epoch0"), F.col("mvec").alias("va")
    )
    b = mv.filter(F.col("epoch") == 1).select(
        F.col("n_vecs").alias("n_epoch1"), F.col("mvec").alias("vb")
    )
    va, vb = F.col("va"), F.col("vb")
    cos = dot(va, vb) / (F.sqrt(dot(va, va)) * F.sqrt(dot(vb, vb)))
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n_epoch0").cast("long").alias("n_epoch0"),
        F.col("n_epoch1").cast("long").alias("n_epoch1"),
        sci9(cos).alias("mean_cosine"),
    )


@register(
    "q_dedup_savings",
    r"""
WITH f AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS bytes,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
),
g AS (
    SELECT fp, min(doc_id) AS keep_id, count(*) AS n,
           sum(bytes) AS total_bytes
    FROM f GROUP BY fp
),
k AS (
    SELECT g.n, g.total_bytes, f.bytes AS kept_bytes
    FROM g JOIN f ON f.doc_id = g.keep_id
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(total_bytes) AS BIGINT) AS bytes_total,
       CAST(sum(total_bytes - kept_bytes) AS BIGINT) AS bytes_saved,
       CAST(sum(total_bytes - kept_bytes) AS DOUBLE) / sum(total_bytes)
           AS savings_frac
FROM k
""",
)
def q_dedup_savings(spark, sf_dir):
    # The dedup business case in one row: bytes reclaimed by keep-first
    # exact dedup — the number that justifies the pipeline to whoever pays
    # for storage and training compute. Composes exact_dedup_groups'
    # fingerprint grouping with a keep-id join back for the survivor's
    # size. Scale shape: texts reduce to (id, length, md5) before any
    # shuffle; the group table joins back on the unique keep_id; output is
    # one row of exact integers plus one division.
    from opc2mongodb_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        F.length("text").cast("long").alias("bytes"),
        fingerprint(F.col("text")).alias("fp"),
    )
    g = f.groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n"),
        F.sum("bytes").alias("total_bytes"),
    )
    k = g.join(
        f.select(F.col("doc_id").alias("keep_id"), F.col("bytes").alias("kept_bytes")),
        "keep_id",
    )
    saved = F.sum(F.col("total_bytes") - F.col("kept_bytes"))
    return k.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("total_bytes").cast("long").alias("bytes_total"),
        saved.cast("long").alias("bytes_saved"),
        (saved.cast("double") / F.sum("total_bytes")).alias("savings_frac"),
    )


@register(
    "q_ann_ivf_recall",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN (5, 6, 7, 8)),
assign AS (
    SELECT e.vec_id,
           (min({{'d': list_dot_product(e.v, e.v)
                       - 2 * list_dot_product(e.v, c.cv)
                       + list_dot_product(c.cv, c.cv), 'c': c.cid}})).c AS cell
    FROM e, cent c GROUP BY e.vec_id
),
qs AS (
    SELECT e.vec_id AS qid, e.v AS qv, a.cell AS qc
    FROM e JOIN assign a ON a.vec_id = e.vec_id
    WHERE e.vec_id IN (0, 10, 20, 30)
),
exact AS (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {_COS.format(a="e.v", b="q.qv")} DESC,
                                       e.vec_id ASC) AS rk
    FROM e, qs q WHERE e.vec_id <> q.qid
),
ex AS (SELECT qid, vec_id FROM exact WHERE rk <= 10),
ivf AS (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {_COS.format(a="e.v", b="q.qv")} DESC,
                                       e.vec_id ASC) AS rk
    FROM e
    JOIN assign a ON e.vec_id = a.vec_id
    JOIN qs q ON a.cell = q.qc
    WHERE e.vec_id <> q.qid
),
iv AS (SELECT qid, vec_id FROM ivf WHERE rk <= 10),
hit AS (
    SELECT x.qid, count(*) AS nh
    FROM ex x JOIN iv i ON x.qid = i.qid AND x.vec_id = i.vec_id
    GROUP BY x.qid
)
SELECT q.qid AS query_id,
       CAST(coalesce(h.nh, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.nh, 0) AS DOUBLE) / 10.0 AS recall_at_k
FROM qs q LEFT JOIN hit h ON h.qid = q.qid
""",
)
def q_ann_ivf_recall(spark, sf_dir):
    # IVF index-quality audit: recall@10 of the nearest-centroid nprobe=1
    # index vs exact brute force per sampled query — the IVF twin of
    # q_ann_recall, so BOTH registered ANN paths carry the same
    # instrumentation (low recall => raise nprobe or refine the coarse
    # quantizer). Sampled-audit cost contract; tie-broken rankings and the
    # bit-identical cosine fold make the integer hit counts exact
    # cross-engine (operators/similarity.py::ivf_recall_audit).
    from opc2mongodb_spark.operators.similarity import ivf_recall_audit

    return ivf_recall_audit(
        _t(spark, sf_dir, "embeddings"),
        query_ids=[0, 10, 20, 30],
        centroid_ids=[5, 6, 7, 8],
        k=10,
    )


@register(
    "q_rfm_segments",
    """
WITH p AS (
    SELECT user_id,
           max(ts) AS last_ts,
           count(*) AS freq,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
),
mx AS (SELECT max(last_ts) AS m FROM p),
s AS (
    SELECT user_id, freq, monetary,
           date_diff('day', CAST(last_ts AS DATE), CAST(mx.m AS DATE))
               AS rec_days
    FROM p, mx
),
sc AS (
    SELECT user_id, monetary,
           CAST(ntile(5) OVER (ORDER BY rec_days ASC, user_id) AS INTEGER)
               AS r_score,
           CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS INTEGER)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
               AS m_score
    FROM s
)
SELECT r_score, f_score, m_score,
       count(*) AS n_users,
       CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS total_monetary
FROM sc
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
""",
)
def q_rfm_segments(spark, sf_dir):
    # RFM (recency/frequency/monetary) segmentation — the classic
    # behavioral-value rollup: per purchasing user, days since last
    # purchase (anchored to the corpus max so the query is reproducible),
    # purchase count, and decimal-exact spend; each dimension quintiled
    # with NTILE over a TOTAL order (metric + user_id tiebreak, the repo
    # convention — bare ntile on ties diverges cross-engine), then rolled
    # up per (R, F, M) cell. Scale shape: the per-user rollup is map-side
    # combinable; the quintile windows run over the |purchasing users|
    # frame (user-bounded, the q_vocab_coverage argument), and the output
    # is <=125 cells. Date arithmetic on DATE-cast values matches
    # date_diff('day') exactly.
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    mx = p.agg(F.max("last_ts").alias("m"))
    s = p.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "freq",
        "monetary",
        F.datediff(F.col("m").cast("date"), F.col("last_ts").cast("date")).alias(
            "rec_days"
        ),
    )
    sc = s.select(
        "user_id",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.col("rec_days").asc(), F.col("user_id")))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("freq").desc(), F.col("user_id")))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("user_id")))
        .cast("int")
        .alias("m_score"),
    )
    return (
        sc.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )

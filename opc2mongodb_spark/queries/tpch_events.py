"""Query registrations: TPC-H completion, OPC HDA time-weighted aggregates, PII scrub / source-mix curation, funnel / retention / SCD2 event analytics.

Mechanically split from the original single-module registry (r9);
registration order and bodies unchanged. Determinism rulebook:
the package docstring (queries/__init__.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opc2mongodb_spark.opcmodel import OPC_VALUES_SQL_CTE, events_as_opc_values
from opc2mongodb_spark.queries._core import _t, dec, register
from opc2mongodb_spark.queries.relational import _CAND_CTES, _COS, _SIGS_SQL, _TOK_CTE

@register(
    "q_tpch_q7",
    """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7(spark, sf_dir):
    # TPC-H Q7 (volume shipping): bilateral trade between two nations by
    # year. Scale shape: both nation joins BROADCAST (25 rows), and the
    # disjunctive nation-pair predicate runs as a residual on the joined
    # row — no extra shuffle; the big-big joins are lineitem x orders and
    # x customer/supplier on their natural keys, with the shipdate range
    # pushed to the lineitem scan. year() is cast INT on both sides per
    # the int-width rule; group keys make the ORDER BY unique.
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("_sk"))
        .join(n2, F.col("c_nationkey") == F.col("_ck"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch_q8",
    """
WITH vol AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
           n1.n_name AS supp_nation
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r ON n2.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
""",
)
def q_tpch_q8(spark, sf_dir):
    # TPC-H Q8 (national market share): NATION_2's share of PROMO-part
    # revenue sold into ASIA-region customers, by order year. Adapted:
    # the synthetic part table has no p_mfgr, and the standard's specific
    # type string maps to p_type='PROMO'. Scale shape: part, supplier,
    # nation x2 and region all broadcast (dims); the two fact shuffles are
    # lineitem x orders and x customer. The share is a conditional-
    # aggregate ratio — both sums decimal-pinned, divided once as doubles
    # (the q14 discipline).
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    n2 = F.broadcast(
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
            F.col("n_nationkey").alias("_ck")
        )
    )
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    vol = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    nat = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("_ck"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("_sk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(nat).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@register(
    "q_tpch_q9",
    """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
ORDER BY nation ASC, o_year DESC
""",
)
def q_tpch_q9(spark, sf_dir):
    # TPC-H Q9 (product type profit): profit by supplier nation and year
    # for parts whose name contains a color token. Adapted: the synthetic
    # schema has no partsupp, so profit omits the ps_supplycost * quantity
    # term and is pure discounted revenue. Scale shape: the LIKE filter
    # prunes part BEFORE broadcast; supplier+nation broadcast; orders is
    # joined only for the year — at 100 TB that join is the second fact
    # shuffle and is unavoidable (year lives on orders). Group keys make
    # the ORDER BY unique.
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .cast("double")
            .alias("profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q_tpch_q13",
    """
WITH c_orders AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_tpch_q13(spark, sf_dir):
    # TPC-H Q13 (customer order-count distribution): the outer-join-then-
    # double-aggregate shape — customers with ZERO qualifying orders must
    # appear in the c_count=0 bucket, which an inner join would lose.
    # Adapted: the synthetic orders table has no o_comment, so the
    # NOT-LIKE comment filter becomes an o_orderpriority exclusion (same
    # plan shape: the predicate rides the join condition, not a WHERE —
    # on a LEFT join those are different results). Scale shape: one
    # shuffle on c_custkey for join+count (the groupBy reuses the join's
    # partitioning), then a tiny histogram rollup. count(col) skips NULLs
    # identically in both engines.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch_q15",
    """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q_tpch_q15(spark, sf_dir):
    # TPC-H Q15 (top supplier): the scalar-subquery-on-an-aggregate shape
    # — suppliers whose quarterly revenue equals the global max. Scale
    # shape: ONE pass computes per-supplier revenue (map-side-combinable
    # groupBy over two pruned columns); the max is a 1-row broadcast
    # crossJoin back onto that same frame (no second lineitem scan, no
    # window over all suppliers); the supplier join broadcasts the
    # handful of matching rows. The equality compare is safe cross-engine
    # because total_revenue is derived identically on both sides
    # (decimal-pinned sum -> double).
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .cast("double")
        .alias("total_revenue")
    )
    mx = F.broadcast(rev.agg(F.max("total_revenue").alias("_mx")))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(mx, rev.total_revenue == F.col("_mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q16",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q_tpch_q16(spark, sf_dir):
    # TPC-H Q16 (parts/supplier relationship): how many distinct suppliers
    # ship each surviving (brand, type, size) combination. Adapted: no
    # partsupp table, so the part-supplier relation is DERIVED from
    # lineitem (l_partkey, l_suppkey); the complaint-comment exclusion
    # becomes the negative-acctbal supplier set. Scale shape: the part
    # filters prune the broadcast dim BEFORE the join; the supplier
    # exclusion is a broadcast ANTI join (NOT IN on a non-null key);
    # count(DISTINCT) runs as Spark's two-shuffle expand — partial
    # distinct on (group, suppkey), then the count. Group keys break all
    # ORDER BY ties.
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        )
    )
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("long").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@register(
    "q_tpch_q17",
    """
WITH avgq AS (
    SELECT l_partkey,
           0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) AS q_lim
    FROM lineitem
    GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN avgq a ON l.l_partkey = a.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND p.p_size < 15
  AND l.l_quantity < a.q_lim
""",
)
def q_tpch_q17(spark, sf_dir):
    # TPC-H Q17 (small-quantity-order revenue): the correlated-average
    # scalar subquery — lines whose quantity is under 20% of their part's
    # average. Adapted: no p_container, so the container predicate becomes
    # a p_size bound. Scale shape: the per-part average is ONE map-side-
    # combinable groupBy over (l_partkey, l_quantity) — two pruned columns
    # — self-joined back on l_partkey (co-partitioned with the main scan's
    # shuffle, no extra exchange); the part filter broadcasts. The decimal-
    # pinned sum/count quotient makes the q_lim threshold bit-identical
    # cross-engine, so the < compare can't flake.
    avgq = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(dec(F.col("l_quantity"), 4)).cast("double")
                    / F.count(F.lit(1)).cast("double")
                )
            ).alias("q_lim")
        )
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("q_lim"))
        .agg(
            (F.sum(dec(F.col("l_extendedprice"), 4)).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


@register(
    "q_tpch_q19",
    """
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q_tpch_q19(spark, sf_dir):
    # TPC-H Q19 (discounted revenue, disjunctive predicates): the classic
    # OR-of-conjuncts join — each disjunct mixes part attributes with
    # lineitem attributes, so no single branch can be fully pushed to one
    # side. Scale shape: the part-only envelope of the disjunction (brand
    # IN + size <= 15) prunes the broadcast dim BEFORE the join; the full
    # disjunction runs as a codegen'd residual on the joined row. Adapted:
    # no p_container / l_shipmode in the synthetic schema, so those
    # conjuncts are dropped from each branch. Sum decimal-pinned.
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


@register(
    "q_tpch_q21",
    """
WITH per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_supp_r
    FROM lineitem
    GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN per_order po ON po.l_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
  AND po.n_supp >= 2
  AND po.n_supp_r = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
)
def q_tpch_q21(spark, sf_dir):
    # TPC-H Q21 (suppliers who kept waiting): the double-correlated
    # EXISTS / NOT-EXISTS query — a supplier's line on a finished
    # multi-supplier order where it was the ONLY supplier at fault.
    # Adapted: no l_commitdate/l_receiptdate, so "at fault" is
    # l_returnflag = 'R'. Implemented in the DECORRELATED form a scale
    # optimizer rewrites it to anyway: one map-side-combinable per-order
    # aggregate (distinct suppliers, distinct at-fault suppliers) replaces
    # BOTH correlated subqueries — EXISTS(other supplier) == n_supp >= 2,
    # NOT EXISTS(other at-fault supplier) == n_supp_r = 1 (l1 itself is at
    # fault) — then joins back co-partitioned on l_orderkey. Two lineitem
    # scans total instead of the naive four.
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
        )
    )
    s = _t(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(s, l1.l_suppkey == s.s_suppkey)
        .join(o, l1.l_orderkey == o.o_orderkey)
        .join(per_order, l1.l_orderkey == per_order.l_orderkey)
        .filter((F.col("n_supp") >= 2) & (F.col("n_supp_r") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "q_tpch_q22",
    """
WITH pos AS (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_bal
    FROM customer
    WHERE c_acctbal > 0.0
      AND c_nationkey IN (2, 7, 12, 17, 22)
)
SELECT c.c_nationkey AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, pos
WHERE c.c_nationkey IN (2, 7, 12, 17, 22)
  AND c.c_acctbal > pos.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
ORDER BY cntrycode
""",
)
def q_tpch_q22(spark, sf_dir):
    # TPC-H Q22 (global sales opportunity): rich customers who never
    # ordered, bucketed by country. Adapted: no c_phone in the synthetic
    # schema, so the phone-prefix country code is c_nationkey itself.
    # Scale shape: the positive-balance average is a 1-row broadcast
    # crossJoin (the scalar subquery); "never ordered" is a LEFT ANTI
    # join against only the o_custkey column — at 100 TB that anti join
    # shuffles two narrow key sets, nothing else. Decimal-pinned sums;
    # the avg_bal threshold is derived identically on both sides so the
    # > compare is exact.
    nats = [2, 7, 12, 17, 22]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nats))
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0.0).agg(
            (
                F.sum(dec(F.col("c_acctbal"), 2)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_bal")
        )
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(dec(F.col("c_acctbal"), 2)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q_tpch_q2",
    """
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS supplycost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
eligible AS (
    SELECT co.l_partkey, co.l_suppkey, co.supplycost,
           s.s_acctbal, s.s_name, n.n_name
    FROM cost co
    JOIN supplier s ON co.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
),
best AS (
    SELECT l_partkey, min(supplycost) AS min_cost
    FROM eligible
    GROUP BY l_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, e.l_suppkey AS s_suppkey,
       e.supplycost
FROM part p
JOIN eligible e ON p.p_partkey = e.l_partkey
JOIN best b ON b.l_partkey = e.l_partkey AND e.supplycost = b.min_cost
WHERE p.p_size = 15 AND p.p_type = 'LARGE'
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey, s_suppkey
LIMIT 100
""",
)
def q_tpch_q2(spark, sf_dir):
    # TPC-H Q2 (minimum cost supplier): the correlated-min subquery —
    # for each qualifying part, the EUROPE supplier(s) matching the
    # minimum supply cost. Adapted: no partsupp table, so supply cost is
    # DERIVED as each (part, supplier)'s best observed unit price
    # min(l_extendedprice / l_quantity) from lineitem (per-row IEEE
    # division + MIN — both order-insensitive, so exact cross-engine).
    # Scale shape: the derived cost table is one map-side-combinable
    # groupBy; region->nation->supplier collapse to a broadcast dim that
    # prunes it to EUROPE rows; the correlated min decorrelates into a
    # per-part groupBy joined back co-partitioned on l_partkey; the part
    # filter broadcasts. (p_partkey, s_suppkey) uniquifies the top-100.
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        r, F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = cost.join(s, cost.l_suppkey == s.s_suppkey)
    best = eligible.groupBy(F.col("l_partkey").alias("_bk")).agg(
        F.min("supplycost").alias("min_cost")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    return (
        eligible.join(
            best,
            (F.col("l_partkey") == F.col("_bk"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "supplycost",
        )
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
            F.asc("s_suppkey"),
        )
        .limit(100)
    )


@register(
    "q_tpch_q11",
    """
WITH v AS (
    SELECT l.l_partkey,
           sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
               AS value_dec
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_4'
    GROUP BY l.l_partkey
),
tot AS (SELECT sum(value_dec) AS total_dec FROM v)
SELECT v.l_partkey, CAST(v.value_dec AS DOUBLE) AS value
FROM v, tot
WHERE CAST(v.value_dec AS DOUBLE) > CAST(tot.total_dec AS DOUBLE) * 0.001
ORDER BY value DESC, v.l_partkey
""",
)
def q_tpch_q11(spark, sf_dir):
    # TPC-H Q11 (important stock identification): per-part value from one
    # nation's suppliers, kept only when it exceeds a FRACTION OF THE
    # GLOBAL TOTAL — the group-vs-global-scalar HAVING. Adapted: no
    # partsupp, so value is discounted revenue from lineitem instead of
    # supplycost * availqty. Scale shape: nation+supplier broadcast-prune
    # the scan; ONE groupBy builds the per-part decimal sums; the global
    # total re-aggregates that same (already tiny) frame and broadcasts
    # back as a crossJoin scalar — no second fact scan. Both sides of the
    # > compare come from exact decimal sums cast to double, then one
    # IEEE multiply — deterministic cross-engine. l_partkey breaks value
    # ties.
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .alias("value_dec")
        )
    )
    tot = F.broadcast(v.agg(F.sum("value_dec").alias("total_dec")))
    return (
        v.crossJoin(tot)
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * F.lit(0.001)
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


@register(
    "q_tpch_q12",
    """
SELECT l.l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY ship_class
""",
)
def q_tpch_q12(spark, sf_dir):
    # TPC-H Q12 (shipping modes and order priority): the CASE-pair
    # conditional counts. Adapted: the synthetic lineitem has no
    # l_shipmode / l_commitdate / l_receiptdate, so the class column is
    # l_linestatus and the late-delivery date arithmetic is dropped; the
    # priority split (URGENT+HIGH vs rest) is verbatim. Scale shape: the
    # shipdate filter pushes to the lineitem scan; one fact-fact join on
    # the order key; integer CASE sums are map-side combinable and exact.
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_class")
    )


@register(
    "q_tpch_q20",
    """
WITH red_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
partqty AS (
    SELECT l.l_partkey,
           sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS total_qty
    FROM lineitem l
    JOIN red_parts rp ON l.l_partkey = rp.p_partkey
    GROUP BY l.l_partkey
),
suppq AS (
    SELECT l.l_suppkey, l.l_partkey,
           sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS supp_qty
    FROM lineitem l
    JOIN red_parts rp ON l.l_partkey = rp.p_partkey
    GROUP BY l.l_suppkey, l.l_partkey
),
dominant AS (
    SELECT DISTINCT sq.l_suppkey
    FROM suppq sq
    JOIN partqty pq ON sq.l_partkey = pq.l_partkey
    WHERE CAST(sq.supp_qty AS DOUBLE) > 0.3 * CAST(pq.total_qty AS DOUBLE)
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN dominant d ON s.s_suppkey = d.l_suppkey
WHERE n.n_name IN ('NATION_0', 'NATION_5', 'NATION_10')
ORDER BY s.s_suppkey
""",
)
def q_tpch_q20(spark, sf_dir):
    # TPC-H Q20 (potential part promotion): the nested-semi-join chain —
    # suppliers (in a nation set) who hold a DOMINANT position on some
    # 'red' part. Adapted: no partsupp/availqty, so "dominant" is shipped
    # share > 30% of the part's total shipped quantity, both derived from
    # lineitem. Scale shape: the red-part keyset broadcasts into both
    # aggregates; per-(supp,part) and per-part sums are map-side
    # combinable over two pruned columns and co-partition on l_partkey
    # for the share join; the distinct supplier keyset then drives a
    # broadcast SEMI join into supplier. Decimal-pinned quantities; the
    # share compare is double-vs-double derived identically both sides.
    rp = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        rp, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    partqty = li.groupBy("l_partkey").agg(
        F.sum(dec(F.col("l_quantity"), 4)).alias("total_qty")
    )
    suppq = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(dec(F.col("l_quantity"), 4)).alias("supp_qty")
    )
    dominant = (
        suppq.join(partqty, "l_partkey")
        .filter(
            F.col("supp_qty").cast("double")
            > F.lit(0.3) * F.col("total_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_0", "NATION_5", "NATION_10")
        )
    )
    s = _t(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# OPC HDA time-weighted average (r5) — the historian aggregate family's
# centerpiece, alongside q_resample_1h (last-value) and q_resample_lerp
# (interpolated).
# ---------------------------------------------------------------------------


@register(
    "q_time_weighted_avg",
    f"""
WITH {OPC_VALUES_SQL_CTE},
good AS (
    SELECT server, tag, sourceTimestamp AS ts, doubleValue AS v, event_id
    FROM opc WHERE quality = 192
),
seg AS (
    SELECT server, tag, ts, v,
           lead(ts) OVER (PARTITION BY server, tag
                          ORDER BY ts, event_id) AS nxt
    FROM good
),
segb AS (
    SELECT server, tag, ts, v, nxt,
           unnest(generate_series(date_trunc('hour', ts),
                                  date_trunc('hour', nxt),
                                  INTERVAL 1 HOUR)) AS bucket
    FROM seg WHERE nxt IS NOT NULL
),
wtd AS (
    SELECT server, tag, bucket,
           greatest(CAST(0 AS BIGINT),
                    least(epoch_us(nxt), epoch_us(bucket + INTERVAL 1 HOUR))
                    - greatest(epoch_us(ts), epoch_us(bucket))) AS ov_us,
           CAST(v AS DECIMAL(18,4)) AS vdec
    FROM segb
)
SELECT server, tag, bucket,
       CAST(CAST(sum(vdec * CAST(ov_us AS DECIMAL(18,0))) AS DOUBLE)
            / CAST(sum(ov_us) AS DOUBLE) AS DOUBLE) AS twa,
       CAST(sum(ov_us) AS BIGINT) AS covered_us
FROM wtd
GROUP BY server, tag, bucket
HAVING sum(ov_us) > 0
""",
)
def q_time_weighted_avg(spark, sf_dir):
    # OPC HDA 'timeaverage' (operators/resample.py::time_weighted_avg):
    # hourly time-weighted mean per (server, tag) under stepped
    # interpolation — each good-quality reading holds until the next one,
    # weighted by microsecond overlap with the hour. Exact cross-engine:
    # integer-µs weights, decimal-pinned value x weight products, one
    # final IEEE division; event_id tiebreaks duplicate timestamps so
    # lead() sees the same ordering in both engines.
    from opc2mongodb_spark.operators.resample import time_weighted_avg

    opc = events_as_opc_values(_t(spark, sf_dir, "events")).filter(
        F.col("quality") == 192
    )
    return time_weighted_avg(
        opc,
        ["server", "tag"],
        "sourceTimestamp",
        "doubleValue",
        step="1 hour",
        tiebreak_col="event_id",
        spread=spark.sparkContext.defaultParallelism,
    )


# ---------------------------------------------------------------------------
# Curation: PII scrubbing and source-mix rebalancing (r5)
# ---------------------------------------------------------------------------

# Java-regex / RE2 common subset: no lookaround, no backrefs — both engines
# compile these identically. 'entity' is a dictionary-term demo pattern so
# the scrubber has real hits on the synthetic corpus (which contains no
# actual emails/IPs — their 0-counts still verify the pattern plumbing).
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("entity", r"\bcustomer\b", "<ENTITY>"),
]


@register(
    "q_pii_scrub",
    """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '\\bcustomer\\b')) AS BIGINT) AS n_entity,
       md5(regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
               '\\bcustomer\\b', '<ENTITY>', 'g')) AS redacted_fp
FROM documents
""",
)
def q_pii_scrub(spark, sf_dir):
    # PII scrubbing gate: per document, match-counts for each redaction
    # pattern plus the md5 fingerprint of the fully-redacted text (the
    # audit artifact a pipeline stores instead of diffing bodies).
    # Patterns live in the Java/RE2 COMMON SUBSET so Spark and DuckDB
    # compile them identically; replacements apply in a fixed order so
    # the fingerprint is reproducible. Scale: pure per-row Column
    # expressions (regexp_count / regexp_replace are codegen'd JVM-side),
    # no UDF, no shuffle — the scan is the cost, as it should be.
    d = _t(spark, sf_dir, "documents")
    out = d.select(
        "doc_id",
        *[
            F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat, _ in _PII_PATTERNS
        ],
    )
    red = F.col("text")
    for _, pat, repl in _PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return out.join(
        d.select("doc_id", F.md5(red).alias("redacted_fp")), "doc_id"
    )


@register(
    "q_mix_rebalance",
    """
WITH n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
w AS (SELECT source, n_s,
             1 + (CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 3)
                 AS w_s
      FROM n),
sc AS (SELECT min(CAST(n_s AS DOUBLE) / CAST(w_s AS DOUBLE)) AS scale FROM w),
k AS (SELECT source, CAST(floor(w_s * scale) AS BIGINT) AS keep_n FROM w, sc),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rk
      FROM documents)
SELECT r.doc_id, r.source
FROM r JOIN k ON r.source = k.source
WHERE r.rk <= k.keep_n
""",
)
def q_mix_rebalance(spark, sf_dir):
    # Source-mix rebalancing: downsample each source to EXACT counts that
    # realize target mixture weights (here w_s = 1 + src_index % 3 — the
    # 'temperature' reweighting a training-data pipeline applies across
    # domains). scale = min_s(n_s / w_s) is the largest factor every
    # source can satisfy; keep_n = floor(w_s * scale). Selection is
    # deterministic: per-source rank by md5(doc_id) — a seeded shuffle
    # both engines replay bit-identically. Scale shape: counts are one
    # map-side-combinable groupBy; the keep_n table is |sources| rows and
    # BROADCASTS onto the rank; the rank itself is one per-source window
    # sort — the honest cost of exact-count selection (the approximate-
    # rate alternative is q_stratified_sample's hash-threshold, which
    # avoids the sort when +/-0.1% drift is acceptable).
    d = _t(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = n.withColumn(
        "w_s",
        F.lit(1)
        + (F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int") % 3),
    )
    sc = w.agg(
        F.min(F.col("n_s").cast("double") / F.col("w_s").cast("double")).alias(
            "scale"
        )
    )
    k = F.broadcast(
        w.crossJoin(F.broadcast(sc)).select(
            "source",
            F.floor(F.col("w_s") * F.col("scale")).cast("long").alias("keep_n"),
        )
    )
    rk_w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    r = d.select("doc_id", "source", F.row_number().over(rk_w).alias("rk"))
    return r.join(k, "source").filter(F.col("rk") <= F.col("keep_n")).select(
        "doc_id", "source"
    )


@register(
    "q_pagerank2",
    f"""
WITH {_TOK_CTE}, {_SIGS_SQL},
{_CAND_CTES},
edges AS (
    SELECT a_id AS src, b_id AS dst FROM cand
    UNION ALL
    SELECT b_id AS src, a_id AS dst FROM cand
),
nn AS (SELECT count(*) AS n FROM documents),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
base AS (
    SELECT d.doc_id, g.deg
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN deg g ON g.src = d.doc_id
),
pr0 AS (
    SELECT doc_id, deg, CAST(1 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS pr
    FROM base, nn
),
c1 AS (
    SELECT e.dst AS doc_id, sum(CAST(p.pr / p.deg AS DECIMAL(28,12))) AS contrib
    FROM edges e JOIN pr0 p ON p.doc_id = e.src AND p.deg IS NOT NULL
    GROUP BY e.dst
),
dm1 AS (
    SELECT CAST(coalesce(sum(CAST(pr AS DECIMAL(28,12))),
                         CAST(0 AS DECIMAL(28,12))) AS DOUBLE) AS dm
    FROM pr0 WHERE deg IS NULL
),
pr1 AS (
    SELECT b.doc_id, b.deg,
           (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(nn.n AS DOUBLE)
           + CAST(0.85 AS DOUBLE)
             * (coalesce(CAST(c1.contrib AS DOUBLE), CAST(0 AS DOUBLE))
                + dm1.dm / CAST(nn.n AS DOUBLE)) AS pr
    FROM base b LEFT JOIN c1 ON c1.doc_id = b.doc_id, nn, dm1
),
c2 AS (
    SELECT e.dst AS doc_id, sum(CAST(p.pr / p.deg AS DECIMAL(28,12))) AS contrib
    FROM edges e JOIN pr1 p ON p.doc_id = e.src AND p.deg IS NOT NULL
    GROUP BY e.dst
),
dm2 AS (
    SELECT CAST(coalesce(sum(CAST(pr AS DECIMAL(28,12))),
                         CAST(0 AS DECIMAL(28,12))) AS DOUBLE) AS dm
    FROM pr1 WHERE deg IS NULL
),
pr2 AS (
    SELECT b.doc_id,
           (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(nn.n AS DOUBLE)
           + CAST(0.85 AS DOUBLE)
             * (coalesce(CAST(c2.contrib AS DOUBLE), CAST(0 AS DOUBLE))
                + dm2.dm / CAST(nn.n AS DOUBLE)) AS pr
    FROM base b LEFT JOIN c2 ON c2.doc_id = b.doc_id, nn, dm2
)
SELECT doc_id, pr FROM pr2
""",
)
def q_pagerank2(spark, sf_dir):
    # Graph centrality over the LSH similarity graph: TWO synchronous
    # PageRank rounds (operators/pagerank.py) on the est_jaccard >= 0.5
    # candidate pairs, undirected (both edge directions). Template/
    # boilerplate hubs surface at the top — the curation complement of
    # q_neardup_degree. Determinism: the lloyd discipline (decimal-pinned
    # contribution sums, one IEEE division per edge, fixed scalar
    # sequence); the DuckDB twin replays the identical arithmetic from the
    # same md5 signature pipeline. The final pr is emitted as a RAW DOUBLE
    # deliberately: every scaled decimal stays under 2^53, so both
    # engines' decimal->double casts are single-rounded and the scalar
    # chain is bit-identical — while a %.9e render would FAIL here (Java's
    # formatter double-rounds via the shortest repr, and 12-decimal-grid
    # values like 6.0405040515e-4 land exactly on its half-digit
    # boundary; measured r5). Scale: one shuffle per round
    # (contribution groupBy on dst), dangling mass a 1-row broadcast,
    # isolated docs re-enter via the left join on the checkpointed base.
    from opc2mongodb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from opc2mongodb_spark.operators.pagerank import pagerank

    d = _t(spark, sf_dir, "documents")
    # Cut the candidate plan once: edges are consumed by the degree count
    # plus every round's contribution join — without the checkpoint each
    # reference re-runs the whole signature + band-join pipeline
    # (measured 4.0 -> ~1.5 s at sf0.1). Narrow frame (two ids).
    cand = (
        lsh_candidate_pairs(minhash_signatures(d, "doc_id", "text"), "doc_id")
        .filter(F.col("est_jaccard") >= 0.5)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    edges = cand.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionAll(cand.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    # doc_id is the table's primary key — no defensive distinct (it would
    # add a full |docs| shuffle for nothing).
    pr = pagerank(d.select("doc_id"), edges, id_col="doc_id", iters=2)
    return pr.select("doc_id", "pr")


@register(
    "q_exact_quantiles",
    """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25_qty,
       quantile_cont(l_quantity, 0.50) AS med_qty,
       quantile_cont(l_quantity, 0.75) AS q75_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_exact_quantiles(spark, sf_dir):
    # EXACT linear-interpolated quantiles per group — the precise
    # counterpart of q_approx_quantile (D3's approx_percentile sketch).
    # Spark's percentile() and DuckDB's quantile_cont share the same
    # definition (sorted position h = (n-1)q, linear between neighbors);
    # the column is INTEGER-VALUED doubles (l_quantity in 1..50), so every
    # interpolated result lands on an exact binary fraction (k, k+.25,
    # k+.5, k+.75) — no last-bit divergence is possible. Scale: exact
    # quantiles genuinely need the per-group sorted layout; Spark's
    # percentile aggregate buffers per group (fine for bounded groups —
    # 3 flags here); unbounded-cardinality columns at 100 TB should use
    # the approx sketch instead, which is why both are registered.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25_qty"),
            F.percentile("l_quantity", 0.50).alias("med_qty"),
            F.percentile("l_quantity", 0.75).alias("q75_qty"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_ann_recall",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
anch AS (SELECT vec_id AS aid, v AS av FROM e WHERE vec_id IN (1, 2, 3, 4)),
bits AS (
    SELECT e.vec_id,
           string_agg(CASE WHEN list_dot_product(e.v, a.av) > 0
                           THEN '1' ELSE '0' END, '' ORDER BY a.aid) AS bucket
    FROM e, anch a GROUP BY e.vec_id
),
qs AS (
    SELECT e.vec_id AS qid, e.v AS qv, b.bucket AS qb
    FROM e JOIN bits b ON b.vec_id = e.vec_id
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
lsh AS (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {_COS.format(a="e.v", b="q.qv")} DESC,
                                       e.vec_id ASC) AS rk
    FROM e
    JOIN bits b ON e.vec_id = b.vec_id
    JOIN qs q ON b.bucket = q.qb
    WHERE e.vec_id <> q.qid
),
ls AS (SELECT qid, vec_id FROM lsh WHERE rk <= 10),
hit AS (
    SELECT x.qid, count(*) AS nh
    FROM ex x JOIN ls l ON x.qid = l.qid AND x.vec_id = l.vec_id
    GROUP BY x.qid
)
SELECT q.qid AS query_id,
       CAST(coalesce(h.nh, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.nh, 0) AS DOUBLE) / 10.0 AS recall_at_k
FROM qs q LEFT JOIN hit h ON h.qid = q.qid
""",
)
def q_ann_recall(spark, sf_dir):
    # ANN index-quality audit (operators/similarity.py::ann_recall_audit):
    # recall@10 of the 4-anchor sign-LSH index vs exact brute force, per
    # sampled query. The number a pipeline watches before widening the
    # anchor set or probe radius. Exact side is |queries| x |corpus| BY
    # DESIGN (sampled audit); both rankings tiebreak on vec_id and use the
    # bit-identical cosine fold, so the top-k sets — and therefore the
    # integer hit counts — are exact cross-engine.
    from opc2mongodb_spark.operators.similarity import ann_recall_audit

    return ann_recall_audit(
        _t(spark, sf_dir, "embeddings"),
        query_ids=[0, 10, 20, 30],
        anchor_ids=[1, 2, 3, 4],
        k=10,
    )


# ---------------------------------------------------------------------------
# Event analytics: funnel, cohort retention, SCD2 change intervals (r5)
# ---------------------------------------------------------------------------


@register(
    "q_funnel",
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
)
SELECT * FROM (
    SELECT 1 AS step, 'view' AS event_type,
           CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
)
ORDER BY step
""",
)
def q_funnel(spark, sf_dir):
    # Ordered funnel (view -> click -> purchase): per user, each step
    # counts only if it happens STRICTLY AFTER the user's previous step —
    # the sequencing makes this a chain of correlated mins, not three
    # independent counts. Scale shape: each step is one map-side-
    # combinable min-groupBy over the (pushed-down) event-type slice,
    # joined to the previous step's per-user table (AQE broadcasts it
    # when it fits; at 1e9 users it degrades to a key-shuffle join, never
    # an OOM). The events table is scanned once per step with the type
    # filter pushed to parquet. Integer counts; strict > matching on
    # exact timestamps.
    ev = _t(spark, sf_dir, "events")

    def step(etype, prev, prev_t):
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            # No broadcast HINT: the step table is |users|-bounded, which
            # is broadcastable on most corpora but not at 1e9 users — let
            # AQE convert to broadcast at runtime when it actually fits.
            e = e.join(prev, ["user_id"]).filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))

    v = step("view", None, "")
    c = step("click", v, "t_view")
    p = step("purchase", c, "t_click")
    rows = [
        (1, "view", v),
        (2, "click", c),
        (3, "purchase", p),
    ]
    out = None
    for n, name, frame in rows:
        one = frame.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(n).alias("step"), F.lit(name).alias("event_type"), "n_users"
        )
        out = one if out is None else out.unionAll(one)
    return out.orderBy("step")


@register(
    "q_cohort_retention",
    """
WITH first_w AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
    FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_k,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM active a JOIN first_w f ON a.user_id = f.user_id
GROUP BY f.cohort_week, CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT)
ORDER BY cohort_week, week_k
""",
)
def q_cohort_retention(spark, sf_dir):
    # Cohort retention matrix: users grouped by first-activity week,
    # counted in each subsequent week they were active — the standard
    # product-analytics triangle. Both engines truncate weeks to ISO
    # Monday; week_k is an exact integer day-difference / 7 (cohort and
    # activity weeks are both week-aligned). Scale shape: first-activity
    # is one min-groupBy; the distinct (user, week) activity table
    # collapses the event volume BEFORE the join with the cohort frame
    # (both shuffle on user_id and co-partition; AQE broadcasts the
    # cohort side when it fits).
    ev = _t(spark, sf_dir, "events")
    # |users|-bounded, so usually broadcastable — but AQE decides at
    # runtime rather than a forced hint that would OOM at 1e9 users.
    first_w = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    week_k = (
        F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7)
    ).cast("int")
    return (
        active.join(first_w, "user_id")
        .groupBy("cohort_week", week_k.alias("week_k"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .orderBy("cohort_week", "week_k")
    )


@register(
    "q_scd2_intervals",
    f"""
WITH {OPC_VALUES_SQL_CTE},
ordered AS (
    SELECT server, tag, doubleValue AS v, sourceTimestamp AS ts,
           lag(doubleValue) OVER (PARTITION BY server, tag
                                  ORDER BY sourceTimestamp, event_id) AS pv
    FROM opc WHERE quality = 192
),
changes AS (
    SELECT server, tag, v, ts
    FROM ordered WHERE pv IS NULL OR v <> pv OR (v IS NULL AND pv IS NOT NULL)
),
iv AS (
    SELECT server, tag, v AS value, ts AS valid_from,
           lead(ts) OVER (PARTITION BY server, tag ORDER BY ts) AS valid_to
    FROM changes
)
SELECT server, tag, value, valid_from, valid_to FROM iv
""",
)
def q_scd2_intervals(spark, sf_dir):
    # SCD-type-2 history from a change stream: collapse consecutive equal
    # readings per (server, tag) and emit validity intervals
    # [valid_from, valid_to) — valid_to NULL for the current value. This
    # is the at-rest HISTORY table the reference's last-write-wins sink
    # (Program.cs:1179-1182) discards, i.e. the append-path it comments
    # out (:1174-1176) done properly. Scale shape: one window shuffle on
    # the key for the change flags, and the second window REUSES the same
    # partitioning (lag and lead share the exchange); change rows are a
    # tiny fraction of the scan. Timestamps compare exactly; the unique
    # (ts, event_id) ordering pins lag cross-engine.
    opc = events_as_opc_values(_t(spark, sf_dir, "events")).filter(
        F.col("quality") == 192
    )
    w = Window.partitionBy("server", "tag").orderBy(
        F.col("sourceTimestamp").asc(), F.col("event_id").asc()
    )
    ordered = opc.select(
        "server",
        "tag",
        F.col("doubleValue").alias("v"),
        F.col("sourceTimestamp").alias("ts"),
        F.lag("doubleValue").over(w).alias("pv"),
    )
    changes = ordered.filter(
        F.col("pv").isNull()
        | (F.col("v") != F.col("pv"))
        | (F.col("v").isNull() & F.col("pv").isNotNull())
    )
    w2 = Window.partitionBy("server", "tag").orderBy(F.col("ts").asc())
    return changes.select(
        "server",
        "tag",
        F.col("v").alias("value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


@register(
    "q_rate_of_change",
    f"""
WITH {OPC_VALUES_SQL_CTE},
good AS (
    SELECT server, tag, sourceTimestamp AS ts, doubleValue AS v, event_id
    FROM opc WHERE quality = 192
),
d AS (
    SELECT server, tag, ts, v,
           lag(v) OVER (PARTITION BY server, tag
                        ORDER BY ts, event_id) AS pv,
           lag(ts) OVER (PARTITION BY server, tag
                         ORDER BY ts, event_id) AS pt
    FROM good
)
SELECT server, tag, ts,
       (v - pv) / (CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE) / 1000000.0)
           AS rate_per_sec
FROM d
WHERE pt IS NOT NULL AND epoch_us(ts) - epoch_us(pt) > 0
""",
)
def q_rate_of_change(spark, sf_dir):
    # OPC HDA-style first derivative per (server, tag): finite difference
    # over consecutive good readings, in value-units per second. The
    # remaining member of the historian aggregate family (resample,
    # interpolated, timeaverage, deadband, gaps). Deterministic: the
    # elapsed time is an exact integer-µs difference; (v-pv) and the two
    # divisions are a fixed IEEE sequence on identical inputs, so the raw
    # doubles match bit-for-bit (no render needed). Zero-elapsed
    # duplicates are excluded (a derivative needs dt > 0); the unique
    # (ts, event_id) ordering pins lag. One window shuffle, nothing else.
    opc = events_as_opc_values(_t(spark, sf_dir, "events")).filter(
        F.col("quality") == 192
    )
    w = Window.partitionBy("server", "tag").orderBy(
        F.col("sourceTimestamp").asc(), F.col("event_id").asc()
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    d = opc.select(
        "server",
        "tag",
        F.col("sourceTimestamp").alias("ts"),
        F.col("doubleValue").alias("v"),
        F.lag("doubleValue").over(w).alias("pv"),
        F.lag("sourceTimestamp").over(w).alias("pt"),
    )
    dt_us = us(F.col("ts")) - us(F.col("pt"))
    return d.filter(F.col("pt").isNotNull() & (dt_us > 0)).select(
        "server",
        "tag",
        "ts",
        (
            (F.col("v") - F.col("pv"))
            / (dt_us.cast("double") / F.lit(1000000.0))
        ).alias("rate_per_sec"),
    )


@register(
    "q_triangle_count",
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
)
SELECT CAST(count(*) AS BIGINT) AS n_docs_in_triangles,
       CAST(coalesce(sum(n_tri), 0) AS BIGINT) AS triangle_corners,
       CAST(coalesce(max(n_tri), 0) AS BIGINT) AS max_per_doc
FROM pv
""",
)
def q_triangle_count(spark, sf_dir):
    # Triangle census of the LSH similarity graph — the third graph
    # operator (components, PageRank, triangles). Triangle density
    # distinguishes genuine duplicate CLIQUES (templates: many triangles)
    # from chain-like false-positive paths (few) — a cluster-quality
    # signal connected components alone cannot give. The classic ordered
    # enumeration: edges are stored a_id < b_id, so each triangle
    # {x<y<z} is found EXACTLY once via the two-hop join x-y, y-z, x-z —
    # no dedup pass. Scale shape: two self-joins of the (narrow,
    # LSH-bounded) edge list, cost ~ sum of neighbor-pair products of the
    # capped buckets; all-integer output.
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
    # One execution of the triangle join, not three (union arms re-run
    # the subtree; see q_clustering_coeff): explode(array) emits the
    # identical corner multiset from a single pass of `tri`.
    corners = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return corners.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_in_triangles"),
        F.coalesce(F.sum("n_tri"), F.lit(0)).cast("long").alias("triangle_corners"),
        F.coalesce(F.max("n_tri"), F.lit(0)).cast("long").alias("max_per_doc"),
    )


@register(
    "q_window_range_frame",
    f"""
WITH {OPC_VALUES_SQL_CTE},
good AS (
    SELECT server, tag, sourceTimestamp AS ts, doubleValue AS v, event_id
    FROM opc WHERE quality = 192
)
SELECT server, tag, ts, event_id,
       CAST(sum(CAST(v AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h,
       CAST(count(*) OVER w AS BIGINT) AS n_1h
FROM good
WINDOW w AS (PARTITION BY server, tag
             ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def q_window_range_frame(spark, sf_dir):
    # Time-RANGE window frame — the frame family member rowsBetween
    # (q_window_frame) cannot express: every reading aggregated with all
    # readings of the SAME KEY in the trailing hour, by VALUE distance on
    # the integer-µs time axis, not row count. Rows at equal timestamps
    # are frame-PEERS (both engines include all peers in RANGE frames —
    # why event_id is in the output but not the ordering). Decimal-pinned
    # sum; one window shuffle.
    opc = events_as_opc_values(_t(spark, sf_dir, "events")).filter(
        F.col("quality") == 192
    )
    us = F.unix_micros(F.col("sourceTimestamp").cast("timestamp"))
    w = (
        Window.partitionBy("server", "tag")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return opc.select(
        "server",
        "tag",
        F.col("sourceTimestamp").alias("ts"),
        "event_id",
        F.sum(dec(F.col("doubleValue"), 4)).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
    )


@register(
    "q_kmv_distinct",
    """
WITH h AS (
    SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hv
    FROM events
),
kth AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
           count(DISTINCT hv) OVER (PARTITION BY event_type) AS n_distinct
    FROM (SELECT DISTINCT event_type, hv FROM h)
)
SELECT event_type,
       CAST(n_distinct AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN n_distinct <= 16 THEN n_distinct
            ELSE CAST(round((16 - 1) /
                 (CAST(CAST(('0x' || substring(hv, 1, 15)) AS BIGINT) AS DOUBLE)
                  / CAST(CAST('0xfffffffffffffff' AS BIGINT) AS DOUBLE)))
                 AS BIGINT) END AS BIGINT) AS kmv_estimate
FROM kth WHERE rk = 16 OR (n_distinct < 16 AND rk = n_distinct)
""",
)
def q_kmv_distinct(spark, sf_dir):
    # KMV (k-minimum-values) distinct sketch, k=16: keep the k smallest
    # md5 hashes per group; estimate = (k-1) / kth-smallest-hash-fraction
    # (Bar-Yossef et al. 2002) — the MERGEABLE distinct sketch family
    # member next to HLL (q_approx_distinct, whose Spark/DuckDB sketches
    # differ and can only be rows-checked loosely) — KMV's md5 hash space
    # is engine-neutral, so estimate AND exact are hash-verified here.
    # Scale: the per-group k-smallest is a partial-aggregable top-k (at
    # production scale: groupBy + sort-limit per key or an approx
    # aggregate); the 60-bit hash prefix -> double division is a fixed
    # IEEE sequence, identical cross-engine; the final round() lands on
    # values far from .5 ties (estimates are irrational-ish ratios).
    ev = _t(spark, sf_dir, "events")
    h = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy(F.col("hv").asc())
    wc = Window.partitionBy("event_type")
    kth = (
        h.withColumn("rk", F.row_number().over(w))
        .withColumn("n_distinct", F.count(F.lit(1)).over(wc))
    )
    k = 16
    frac = F.conv(F.substring("hv", 1, 15), 16, 10).cast("double") / F.conv(
        F.lit("f" * 15), 16, 10
    ).cast("double")
    est = (
        F.when(F.col("n_distinct") <= k, F.col("n_distinct"))
        .otherwise(F.round(F.lit(k - 1) / frac).cast("long"))
        .cast("long")
    )
    return kth.filter(
        (F.col("rk") == k) | ((F.col("n_distinct") < k) & (F.col("rk") == F.col("n_distinct")))
    ).select(
        "event_type",
        F.col("n_distinct").cast("long").alias("exact_distinct"),
        est.alias("kmv_estimate"),
    )


@register(
    "q_event_transitions",
    """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, next_type
""",
)
def q_event_transitions(spark, sf_dir):
    # First-order Markov transition counts over each user's event stream —
    # the raw material for behavioral-model features and anomaly scoring
    # (an 'error'-heavy row stands out immediately). One window shuffle on
    # user_id for the lag; the transition matrix is a tiny
    # map-side-combinable rollup (|types|² rows). Unique (ts, event_id)
    # ordering pins lag; all-integer output.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "q_ts_similarity",
    f"""
WITH {OPC_VALUES_SQL_CTE},
hourly AS (
    SELECT server, tag, date_trunc('hour', sourceTimestamp) AS h,
           CAST(sum(CAST(doubleValue AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS m
    FROM opc WHERE quality = 192
    GROUP BY server, tag, date_trunc('hour', sourceTimestamp)
),
q AS (
    SELECT h, m AS qm FROM hourly
    WHERE server = 'server_1' AND tag = 'click.7'
),
dist AS (
    SELECT hh.server, hh.tag,
           CAST(sum(CAST((hh.m - q.qm) * (hh.m - q.qm) AS DECIMAL(28,12)))
                AS DOUBLE) AS d2,
           count(*) AS n_shared
    FROM hourly hh JOIN q ON q.h = hh.h
    WHERE NOT (hh.server = 'server_1' AND hh.tag = 'click.7')
    GROUP BY hh.server, hh.tag
)
SELECT server, tag,
       d2 / CAST(n_shared AS DOUBLE) AS msd,
       CAST(n_shared AS BIGINT) AS n_shared
FROM dist
WHERE n_shared >= 12
ORDER BY msd ASC, server, tag
LIMIT 10
""",
)
def q_ts_similarity(spark, sf_dir):
    # Distributed time-series similarity search (the EDBT'19 streaming-
    # similarity shape, PAPERS.md): which signals move like tag click.7?
    # Each signal is reduced to its hourly-mean profile (PAA-style
    # dimensionality reduction, decimal-pinned means), the query profile
    # broadcasts, and mean-squared distance over shared hours ranks the
    # rest — a min-overlap floor keeps trivially-short overlaps out.
    # Scale shape: the hourly rollup is one map-side-combinable groupBy
    # that SHRINKS the data to |tags| x |hours|; the distance join is
    # |profiles| x broadcast; top-10 is TakeOrdered. Determinism: per-row
    # squares are single IEEE ops pinned to the decimal grid before the
    # order-free sum; one division; (server, tag) tiebreaks.
    opc = events_as_opc_values(_t(spark, sf_dir, "events")).filter(
        F.col("quality") == 192
    )
    hourly = (
        opc.groupBy(
            "server", "tag", F.date_trunc("hour", "sourceTimestamp").alias("h")
        )
        .agg(
            (
                F.sum(dec(F.col("doubleValue"), 4)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        )
    )
    q = F.broadcast(
        hourly.filter(
            (F.col("server") == "server_1") & (F.col("tag") == "click.7")
        ).select("h", F.col("m").alias("qm"))
    )
    diff = F.col("m") - F.col("qm")
    return (
        hourly.filter(
            ~((F.col("server") == "server_1") & (F.col("tag") == "click.7"))
        )
        .join(q, "h")
        .groupBy("server", "tag")
        .agg(
            F.sum((diff * diff).cast("decimal(28,12)")).cast("double").alias("d2"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= 12)
        .select(
            "server",
            "tag",
            (F.col("d2") / F.col("n_shared").cast("double")).alias("msd"),
            F.col("n_shared").cast("long").alias("n_shared"),
        )
        .orderBy(F.asc("msd"), F.asc("server"), F.asc("tag"))
        .limit(10)
    )


@register(
    "q_sentiment",
    """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
scored AS (
    SELECT doc_id,
           count(*) AS n_tok,
           sum(CASE WHEN tok IN ('fast', 'small', 'value') THEN 1 ELSE 0 END)
               AS n_pos,
           sum(CASE WHEN tok IN ('slow', 'error', 'big') THEN 1 ELSE 0 END)
               AS n_neg
    FROM tok GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tok AS DOUBLE) AS polarity
FROM scored
""",
)
def q_sentiment(spark, sf_dir):
    # Lexicon-based sentiment/polarity scoring (the EDBT'16 Spark
    # sentiment-at-scale shape, PAPERS.md): per document, positive and
    # negative lexicon hit counts and a length-normalized polarity in
    # [-1, 1]. The lexicon here is a 3+3-word demo over the synthetic
    # vocabulary; swapping in a real lexicon is a broadcast join or a
    # bigger isin() — the plan is unchanged. Scale: one explode + one
    # map-side-combinable groupBy, integer counts, a single exact
    # division — no UDF anywhere.
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    pos = F.col("tok").isin("fast", "small", "value")
    neg = F.col("tok").isin("slow", "error", "big")
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("n_pos"),
            F.sum(F.when(neg, 1).otherwise(0)).cast("long").alias("n_neg"),
        )
        .select(
            "doc_id",
            "n_pos",
            "n_neg",
            (
                (F.col("n_pos") - F.col("n_neg")).cast("double")
                / F.col("n_tok").cast("double")
            ).alias("polarity"),
        )
    )


def _fps_d2(c: str) -> str:
    """Squared-L2 macro for the farthest-point oracle: the same
    dot-product expansion assign_cells folds, on alias ``{c}``."""
    return (
        f"(list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, {c}.cv)"
        f" + list_dot_product({c}.cv, {c}.cv))"
    )


@register(
    "q_kmeanspp_init",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT v AS cv FROM e WHERE vec_id = 0),
d1 AS (
    SELECT e.vec_id, {_fps_d2("c0")} AS d2
    FROM e, c0 WHERE e.vec_id <> 0
),
p1 AS (SELECT -((max({{'d': d2, 'ni': -vec_id}})).ni) AS id FROM d1),
c1 AS (SELECT e.v AS cv FROM e, p1 WHERE e.vec_id = p1.id),
dd2 AS (
    SELECT e.vec_id, least({_fps_d2("c0")}, {_fps_d2("c1")}) AS d2
    FROM e, c0, c1, p1 WHERE e.vec_id <> 0 AND e.vec_id <> p1.id
),
p2 AS (SELECT -((max({{'d': d2, 'ni': -vec_id}})).ni) AS id FROM dd2),
c2 AS (SELECT e.v AS cv FROM e, p2 WHERE e.vec_id = p2.id),
dd3 AS (
    SELECT e.vec_id,
           least({_fps_d2("c0")}, {_fps_d2("c1")}, {_fps_d2("c2")}) AS d2
    FROM e, c0, c1, c2, p1, p2
    WHERE e.vec_id <> 0 AND e.vec_id <> p1.id AND e.vec_id <> p2.id
),
p3 AS (SELECT -((max({{'d': d2, 'ni': -vec_id}})).ni) AS id FROM dd3)
SELECT 0 AS round, CAST(0 AS BIGINT) AS vec_id
UNION ALL SELECT 1, CAST(id AS BIGINT) FROM p1
UNION ALL SELECT 2, CAST(id AS BIGINT) FROM p2
UNION ALL SELECT 3, CAST(id AS BIGINT) FROM p3
""",
)
def q_kmeanspp_init(spark, sf_dir):
    # Deterministic k-means++-style seeding (farthest-point traversal,
    # operators/kmeans.py::farthest_point_seeds): seed 0 = vec_id 0, each
    # later seed maximizes distance to its nearest chosen seed — the
    # 2-approx k-center init whose seeds feed lloyd(). One declarative
    # plan (k-1 data passes, 1-row broadcast picks chained); argmax ties
    # break on the lowest id via a (d2, -id) struct max; the DuckDB twin
    # replays the identical fold arithmetic round by round.
    from opc2mongodb_spark.operators.kmeans import farthest_point_seeds

    return farthest_point_seeds(
        _t(spark, sf_dir, "embeddings"), k=4, first_id=0
    )


@register(
    "q_variant_extract",
    """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_valid(props) AS BOOLEAN) AS is_valid,
       CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 IS NOT NULL
            THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
            END AS k_mod
FROM events
""",
)
def q_variant_extract(spark, sf_dir):
    # Semi-structured access through Spark 4's VARIANT type: parse_json
    # once into the binary variant encoding, then typed try_variant_get
    # extraction — the modern engine path for open-schema columns (vs the
    # per-access string re-parse of get_json_object in q_json_funcs).
    # At 100 TB the difference is real: variant parses each value once
    # and shreds access into the columnar binary, instead of running a
    # JSON parser per extraction expression. The oracle twin uses
    # DuckDB's JSON functions — same logical result, engine-native
    # encodings on both sides. is_variant_null/json_valid parity: the
    # synthetic props are all valid JSON objects, and TRY semantics null
    # out anything that is not.
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.col("props").try_cast("variant").isNotNull().alias("is_valid"),
        (k % 10).alias("k_mod"),
    )


@register(
    "q_ref_integrity",
    """
SELECT * FROM (
    SELECT 'orders_without_customer' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_without_order',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_without_part',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_without_supplier',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_without_nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
)
ORDER BY check_name
""",
)
def q_ref_integrity(spark, sf_dir):
    # Referential-integrity audit — the data-quality gate a pipeline runs
    # after every load: orphan counts for each foreign-key edge of the
    # star schema, as one small report. Scale shape: every check is a
    # LEFT ANTI join + count — dim-side keys broadcast (nation, part,
    # supplier, customer at dim scale); fact-fact checks shuffle only the
    # key columns (pruned scans). All-integer output; check_name is the
    # unique sort key.
    checks = [
        ("orders_without_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem_without_order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem_without_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem_without_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer_without_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, fact, fk, dim, pk in checks:
        f = _t(spark, sf_dir, fact).select(fk)
        d = _t(spark, sf_dir, dim).select(pk)
        n = (
            f.join(d, f[fk] == d[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )
        out = n if out is None else out.unionAll(n)
    return out.orderBy("check_name")

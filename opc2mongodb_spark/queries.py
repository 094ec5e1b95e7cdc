"""Oracle-checked query inventory (SURVEY.md §2.2, the binding matrix).

Every entry pairs a PySpark DataFrame builder with an ANSI-SQL twin that
DuckDB runs on the same parquet tables. The driver compares row-count +
schema + order-insensitive value-hash, so each query follows strict
cross-engine determinism rules:

- float aggregates go through DECIMAL so summation order cannot change the
  result (map-side partial aggregation in Spark is order-nondeterministic);
- every computed column is aliased identically on both sides;
- ranking/limit queries carry a unique tiebreaker in the ORDER BY;
- int-width functions (year, length, rank, ...) are cast to a common type.

The Spark side is written the way you'd write it for 100 TB: broadcast hints
on small dims, partial-aggregable expressions, no Python UDFs, no collect.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opc2mongodb_spark.opcmodel import OPC_VALUES_SQL_CTE, events_as_opc_values
from opc2mongodb_spark.operators.last_value import last_value_per_key_window
from opc2mongodb_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(build=fn, oracle=oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: F.Column, scale: int = 2) -> F.Column:
    """Decimal-pin a double for cross-engine exact aggregation."""
    return col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# A3 — keyed last-value upsert (the reference's sink semantics, Program.cs:1179-1182)
# ---------------------------------------------------------------------------


@register(
    "q_last_value_per_key",
    f"""
WITH {OPC_VALUES_SQL_CTE},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY server, tag
        ORDER BY serverTimestamp DESC, event_id DESC) AS rn
    FROM opc
)
SELECT server, tag, dataType, doubleValue, boolValue, stringValue,
       sourceTimestamp, serverTimestamp, quality
FROM ranked WHERE rn = 1
""",
)
def q_last_value_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    opc = events_as_opc_values(_t(spark, sf_dir, "events"))
    latest = last_value_per_key_window(
        opc, ["server", "tag"], "serverTimestamp", tiebreak_cols=["event_id"]
    )
    return latest.drop("event_id")


# ---------------------------------------------------------------------------
# Category B — projection / filter / predicates
# ---------------------------------------------------------------------------


@register(
    "q_project",
    """
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS revenue,
       l_returnflag AS flag
FROM lineitem
""",
)
def q_project(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.col("l_returnflag").alias("flag"),
    )


@register(
    "q_filter",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 30
  AND l_returnflag = 'N'
  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def q_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 30)
        & (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "q_predicates",
    """
SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 50000 AND 300000
  AND o_orderstatus LIKE 'F%'
""",
)
def q_predicates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 300000)
        & F.col("o_orderstatus").like("F%")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")


@register(
    "q_null_handling",
    """
SELECT event_id,
       nullif(event_type, 'click')                     AS et_nullable,
       coalesce(nullif(event_type, 'click'), '(none)') AS et_filled,
       (nullif(event_type, 'click') IS NULL)           AS was_click
FROM events
""",
)
def q_null_handling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    nullable = F.nullif(F.col("event_type"), F.lit("click"))
    return ev.select(
        "event_id",
        nullable.alias("et_nullable"),
        F.coalesce(nullable, F.lit("(none)")).alias("et_filled"),
        nullable.isNull().alias("was_click"),
    )


# ---------------------------------------------------------------------------
# Category C — casts & scalar functions (reference coercion semantics, §1.2)
# ---------------------------------------------------------------------------


@register(
    "q_coerce_numeric",
    """
SELECT event_id,
       value                 AS doubleValue,
       value <> 0            AS boolValue,
       CAST(value AS VARCHAR) AS stringValue
FROM events
""",
)
def q_coerce_numeric(spark, sf_dir):
    # coerce_numeric family (Program.cs:162-202): double passthrough, !=0, render
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        v.alias("doubleValue"),
        (v != 0).alias("boolValue"),
        v.cast("string").alias("stringValue"),
    )


@register(
    "q_coerce_string",
    """
SELECT event_id,
       coalesce(TRY_CAST(event_type AS DOUBLE), 0.0)  AS d_from_text,
       coalesce(TRY_CAST(CAST(user_id AS VARCHAR) AS DOUBLE), 0.0) AS d_from_numstr,
       coalesce(TRY_CAST(CAST(user_id AS VARCHAR) AS DOUBLE), 0.0) <> 0 AS b_from_numstr
FROM events
""",
)
def q_coerce_string(spark, sf_dir):
    # string family with 0.0-on-parse-failure fallback (Program.cs:397-405)
    ev = _t(spark, sf_dir, "events")
    d1 = F.coalesce(F.col("event_type").try_cast("double"), F.lit(0.0))
    numstr = F.col("user_id").cast("string")
    d2 = F.coalesce(numstr.try_cast("double"), F.lit(0.0))
    return ev.select(
        "event_id",
        d1.alias("d_from_text"),
        d2.alias("d_from_numstr"),
        (d2 != 0).alias("b_from_numstr"),
    )


@register(
    "q_coerce_bool",
    """
SELECT event_id,
       value > 100                                       AS boolValue,
       CAST(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS doubleValue,
       CAST(value > 100 AS VARCHAR)                      AS stringValue
FROM events
""",
)
def q_coerce_bool(spark, sf_dir):
    # bool family: 1.0/0.0 (Program.cs:150), lowercase render (Program.cs:146)
    ev = _t(spark, sf_dir, "events")
    b = F.col("value") > 100
    return ev.select(
        "event_id",
        b.alias("boolValue"),
        F.when(b, F.lit(1.0)).otherwise(F.lit(0.0)).alias("doubleValue"),
        b.cast("string").alias("stringValue"),
    )


@register(
    "q_datetime",
    """
SELECT event_id,
       CAST(year(ts) AS INTEGER)              AS y,
       CAST(month(ts) AS INTEGER)             AS m,
       CAST(day(ts) AS INTEGER)               AS d,
       CAST(hour(ts) AS INTEGER)              AS h,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day,
       CAST(floor(epoch(ts)) AS BIGINT)       AS epoch_s
FROM events
""",
)
def q_datetime(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.date_trunc("day", ts).alias("ts_day"),
        F.unix_timestamp(ts).alias("epoch_s"),
    )


@register(
    "q_string_funcs",
    """
SELECT doc_id,
       upper(substring(text, 1, 10))      AS head10,
       lower(source)                      AS src,
       concat_ws('.', lang, source)       AS dotted,
       split_part(text, ' ', 1)           AS first_tok,
       CAST(length(text) AS INTEGER)      AS n_len
FROM documents
""",
)
def q_string_funcs(spark, sf_dir):
    # dotted-tag hierarchy handling generalized (SURVEY.md §1.3)
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring(F.col("text"), 1, 10)).alias("head10"),
        F.lower(F.col("source")).alias("src"),
        F.concat_ws(".", F.col("lang"), F.col("source")).alias("dotted"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_tok"),
        F.length(F.col("text")).alias("n_len"),
    )


@register(
    "q_math_funcs",
    """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)        AS abs_d,
       floor(l_extendedprice)        AS floor_p,
       ceil(l_extendedprice)         AS ceil_p,
       sqrt(l_quantity)              AS sqrt_q,
       CAST(l_quantity AS BIGINT) % 7 AS mod_q,
       greatest(l_tax, l_discount)   AS max_rate
FROM lineitem
""",
)
def q_math_funcs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.floor(F.col("l_extendedprice")).alias("floor_p"),
        F.ceil(F.col("l_extendedprice")).alias("ceil_p"),
        F.sqrt(F.col("l_quantity")).alias("sqrt_q"),
        (F.col("l_quantity").cast("bigint") % 7).alias("mod_q"),
        F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
    )


@register(
    "q_array_funcs",
    """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER)          AS dim,
       CAST(embedding[1] AS DOUBLE)             AS first_val,
       CAST(list_max(embedding) AS DOUBLE)      AS max_val,
       CAST(list_min(embedding) AS DOUBLE)      AS min_val
FROM embeddings
""",
)
def q_array_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.array_min(emb).cast("double").alias("min_val"),
    )


@register(
    "q_json_funcs",
    """
SELECT event_id,
       json_extract_string(props, '$.k')                  AS k_str,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
FROM events
""",
)
def q_json_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.try_cast("bigint").alias("k_int"),
    )


@register(
    "q_case_when",
    """
SELECT event_id,
       CASE WHEN value < 100 THEN 'low'
            WHEN value < 500 THEN 'mid'
            ELSE 'high' END AS band
FROM events
""",
)
def q_case_when(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 100, "low")
        .when(F.col("value") < 500, "mid")
        .otherwise("high")
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# Category D — aggregation
# ---------------------------------------------------------------------------


@register(
    "q_group_agg",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))      AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
       CAST(min(l_quantity) AS DECIMAL(18,2))                             AS min_qty,
       CAST(max(l_quantity) AS DECIMAL(18,2))                             AS max_qty,
       count(*)                                                           AS cnt
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_group_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec(F.col("l_quantity"))).cast("decimal(18,2)").alias("sum_qty"),
        F.sum(dec(F.col("l_extendedprice"))).cast("decimal(18,2)").alias("sum_price"),
        F.min("l_quantity").cast("decimal(18,2)").alias("min_qty"),
        F.max("l_quantity").cast("decimal(18,2)").alias("max_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_distinct",
    """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def q_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_approx_distinct",
    """
SELECT l_returnflag, TRUE AS within_tol
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_approx_distinct(spark, sf_dir):
    # approx_count_distinct (HLL++) checked against the exact count with 5%
    # tolerance; the oracle pins the *invariant*, not the sketch estimate.
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    )
    return g.select(
        "l_returnflag",
        (F.abs(F.col("approx") - F.col("exact")) <= 0.05 * F.col("exact")).alias(
            "within_tol"
        ),
    )


@register(
    "q_rollup",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
       count(*) AS cnt,
       CAST(grouping(l_returnflag) AS INTEGER)  AS g_flag,
       CAST(grouping(l_linestatus) AS INTEGER)  AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(dec(F.col("l_quantity"))).cast("decimal(18,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@register(
    "q_agg_filter",
    """
SELECT l_linestatus,
       CAST(sum(CASE WHEN l_returnflag = 'R'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
            AS DECIMAL(18,2))                                    AS returned_price,
       count(CASE WHEN l_discount > 0.05 THEN 1 END)             AS n_discounted
FROM lineitem
GROUP BY l_linestatus
""",
)
def q_agg_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", dec(F.col("l_extendedprice"))))
        .cast("decimal(18,2)")
        .alias("returned_price"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
    )


@register(
    "q_global_agg",
    """
SELECT count(*) AS cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
       min(o_orderdate) AS first_date,
       max(o_orderdate) AS last_date,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
""",
)
def q_global_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec(F.col("o_totalprice"))).cast("decimal(18,2)").alias("total"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# Category G — sort / limit / set ops
# ---------------------------------------------------------------------------


@register(
    "q_sort",
    """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
""",
)
def q_sort(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
    )


@register(
    "q_topk",
    """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def q_topk(spark, sf_dir):
    # TakeOrderedAndProject: per-partition top-K then driver merge — no global sort.
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_union",
    """
SELECT event_id, 'clicks' AS bucket FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, 'buys' AS bucket FROM events WHERE event_type = 'purchase'
""",
)
def q_union(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "event_id", F.lit("clicks").alias("bucket")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.lit("buys").alias("bucket")
    )
    return a.unionByName(b)


@register(
    "q_set_ops",
    """
SELECT n_nationkey, 'both' AS side FROM (
    SELECT c_nationkey AS n_nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS n_nationkey FROM supplier)
UNION ALL
SELECT n_nationkey, 'customer_only' AS side FROM (
    SELECT c_nationkey AS n_nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS n_nationkey FROM supplier)
""",
)
def q_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    both = c.intersect(s).select("n_nationkey", F.lit("both").alias("side"))
    only = c.subtract(s).select(  # subtract == SQL EXCEPT (distinct)
        "n_nationkey", F.lit("customer_only").alias("side")
    )
    return both.unionByName(only)

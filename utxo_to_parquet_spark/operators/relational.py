"""General relational operator surface (SURVEY.md §2.3 / §7.4).

The reference delegates all querying to a downstream SQL engine
(README.md:50-107); here the engine is Spark SQL itself. Each query is
written DataFrame-first so Catalyst owns pushdown/pruning/join-selection,
with small dimension tables broadcast explicitly.

Oracle-dialect notes (DuckDB 1.0):
- ``SUM(BIGINT)`` is HUGEINT there — every integral sum is CAST to BIGINT.
- double aggregates are ROUNDed in both engines so value hashes match.
- ``year()`` returns BIGINT there vs INT here — Spark side casts to long.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load, register


# --- TPC-H Q1 style pricing summary: scan + filter + 8-agg groupBy --------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3 style: 3-way join + agg + deterministic top-k ---------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5 style: 5-way star join rolled up by nation ------------------

@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --- join family ----------------------------------------------------------

@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F' AND c_acctbal > 5000
    """,
)
def q_join_inner(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total")
    )


@register(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, COALESCE(CAST(COUNT(o_orderkey) AS BIGINT), 0) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left_outer(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q_join_semi(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey", "c_name")


# --- aggregate family -----------------------------------------------------

@register(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS rflag,
           COALESCE(l_linestatus, '(all)') AS lstatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("lstatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           ROUND(SUM(o_totalprice), 2) AS total,
           COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "total",
            "n",
        )
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q_distinct(spark, sf_dir):
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) AS DOUBLE) AS qty_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return piv.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).cast("double").alias("qty_o"),
        F.coalesce(F.col("F"), F.lit(0.0)).cast("double").alias("qty_f"),
    )


# --- window family --------------------------------------------------------

@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS bal, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@register(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def q_window_running_sum(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER w, 2) AS delta_prev,
           CAST(LEAD(o_orderkey, 1, -1) OVER w AS BIGINT) AS next_order
    FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_lead(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2).alias("delta_prev"),
        F.lead("o_orderkey", 1, -1).over(w).cast("long").alias("next_order"),
    )


@register(
    "q_window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prnk
    FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def q_window_rank_dense(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
    )


# --- sort / limit / set ops ----------------------------------------------

@register(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q_topk_global(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .limit(25)
    )


@register(
    "q_set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_union_distinct(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_set_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_except(spark, sf_dir):
    n = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.exceptAll(s).distinct()


# --- scalar function family ----------------------------------------------

@register(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS uname,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS prefix,
           REPLACE(p_name, ' ', '_') AS snake,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part WHERE p_name LIKE '%widget%'
    """,
)
def q_scalar_string(spark, sf_dir):
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.regexp_replace("p_name", " ", "_").alias("snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "q_scalar_math",
    oracle="""
    SELECT p_partkey,
           ROUND(SQRT(p_retailprice), 4) AS root,
           ROUND(LN(p_retailprice), 4) AS lnp,
           ROUND(POWER(p_size, 2), 1) AS size_sq,
           ABS(p_size - 25) AS dist25,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
           p_size % 7 AS size_mod
    FROM part
    """,
)
def q_scalar_math(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 4).alias("root"),
        F.round(F.log("p_retailprice"), 4).alias("lnp"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.abs(F.col("p_size") - 25).alias("dist25"),
        F.floor("p_retailprice").alias("fl"),
        F.ceil("p_retailprice").alias("ce"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "q_scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
           CAST(DAY(o_orderdate) AS BIGINT) AS dy,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
           CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders
    """,
)
def q_scalar_datetime(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
    )


@register(
    "q_case_when_bucketing",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n, ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer GROUP BY 1
    """,
)
def q_case_when_bucketing(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        cust.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )


# --- subqueries (Spark SQL surface) --------------------------------------

@register(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
        FROM customer_v
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_v)
        """
    )


@register(
    "q_cte_multi",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n_big FROM orders
      WHERE o_totalprice > 200000 GROUP BY o_custkey
    )
    SELECT c_mktsegment, CAST(SUM(n_big) AS BIGINT) AS total_big
    FROM customer JOIN big_orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q_cte_multi(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_cte_v")
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big FROM orders_v
          WHERE o_totalprice > 200000 GROUP BY o_custkey
        )
        SELECT c_mktsegment, SUM(n_big) AS total_big
        FROM customer_cte_v JOIN big_orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        """
    )


@register(
    "q_range_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines_in_window,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
)
def q_range_join(spark, sf_dir):
    """Range join: lineitems shipped within 30 days of their order date.

    The equi key (orderkey) drives a hash join; the date range is a
    residual predicate evaluated inside the join — no nested-loop. For a
    PURE range join (no equi key) at scale, the same shape is recovered
    by bucketizing the range key (e.g. date -> month) into an equi key
    and filtering the residual, which keeps the join shuffle-partitioned
    instead of broadcast-nested-loop.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 30)),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines_in_window"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q_agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group, computed DISTRIBUTED —
    no per-group value buffering anywhere. Spark's builtin exact
    ``percentile`` collects and sorts every group value in one reducer,
    which is the classic 100-TB OOM; instead this builds a (group,
    distinct value) histogram with a map-side-combinable groupBy, runs
    the cumulative-count window over that much smaller relation
    (partitioned by group), and reconstructs the same interpolated
    quantile (pos = q*(n-1), linear between the two bracketing order
    statistics — identical to DuckDB ``quantile_cont`` / Spark
    ``percentile``) from conditional-min aggregates over the ranks.
    State per task is O(|distinct values in group|), not O(rows)."""
    li = load(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wtot = W.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("n"),
    )
    quantiles = {"p50": 0.5, "p95": 0.95, "p99": 0.99}

    def pos(q):
        return F.lit(q) * (F.col("n") - 1).cast("double")

    # value at 0-indexed rank r = min distinct value whose cumulative
    # count exceeds r; lo/hi bracket pos for the interpolation
    aggs = [F.max("n").alias("n")]
    for name, q in quantiles.items():
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.floor(pos(q)) + 1, F.col("l_extendedprice"))
            ).alias(f"{name}_lo")
        )
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.ceil(pos(q)) + 1, F.col("l_extendedprice"))
            ).alias(f"{name}_hi")
        )
    agg = cum.groupBy("l_returnflag").agg(*aggs)
    out = ["l_returnflag"]
    for name, q in quantiles.items():
        frac = pos(q) - F.floor(pos(q))
        out.append(
            F.round(
                F.col(f"{name}_lo")
                + frac * (F.col(f"{name}_hi") - F.col(f"{name}_lo")),
                4,
            ).alias(name)
        )
    out.append(F.col("n"))
    return agg.select(*out)


@register(
    "q_agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS within_rank_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch) with a RANK-ENVELOPE
    contract — the quantile strategy at 100 TB: the GK sketch is
    bounded-size and mergeable (map-side partial + tiny shuffle), and
    the check verifies exactly what GK guarantees: the returned value's
    rank lies within eps*n of the target rank (eps = 1/accuracy). The
    verification is a SECOND plain aggregation — count of values at or
    below / strictly below the sketch output — so NOTHING in this query
    buffers per-group values; both passes are map-side combinable.
    (The old contract recomputed the exact percentile over the full
    data next to the sketch — a per-group sort-buffer that defeats the
    point of approximating. Exact-vs-approx value comparison now lives
    in tests/test_relational_extra.py at fixture scale.)

    With ties the value's rank is an interval [r_lt, r_le]; the check
    asserts that interval intersects [q-eps, q+eps]. A sketch
    regression flips the boolean and breaks the oracle value hash."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    sk = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(l_extendedprice, array(0.5, 0.95), 1000)"
        ).alias("approx")
    )
    eps = 2.0 / 1000  # GK eps = 1/accuracy, doubled for interpolation slack
    checked = (
        li.join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    (F.col("l_extendedprice") <= F.col("approx")[i]).cast("long")
                ).alias(f"r{i}_le")
                for i in (0, 1)
            ],
            *[
                F.sum(
                    (F.col("l_extendedprice") < F.col("approx")[i]).cast("long")
                ).alias(f"r{i}_lt")
                for i in (0, 1)
            ],
        )
    )

    def in_envelope(i, q):
        nd = F.col("n").cast("double")
        return (F.col(f"r{i}_lt") / nd <= q + eps) & (
            F.col(f"r{i}_le") / nd >= q - eps
        )

    return checked.select(
        "l_returnflag",
        "n",
        (in_envelope(0, 0.5) & in_envelope(1, 0.95)).alias("within_rank_tol"),
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                            (o_orderpriority, o_orderstatus))
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form under rollup/cube):
    three aggregation granularities in one pass over the input —
    Spark expands then aggregates with map-side partial aggregation, so
    the input is still read once at any scale."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus))
        """
    )


# --- TPC-H Q6 style: pure filter + single agg (pushdown showcase) ---------

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: every predicate is a plain column comparison, so
    all four reach the parquet scan as pushed filters and the aggregate
    is a map-side partial — the cheapest possible plan for this query."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q10 style: returned-item report (join + agg + top-k) -----------

@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: fact-to-fact join keyed on orderkey, customer
    dimension broadcast, top-k by revenue with a deterministic key
    tie-break (TakeOrderedAndProject — no global sort materialized)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- salted join: the explicit skew-mitigation pattern --------------------

N_SALTS = 8


@register(
    "q_join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_salted_skew(spark, sf_dir):
    """Manually salted join — the pre-AQE skew mitigation, shown as an
    operator because at 100 TB some skews (one key = 10% of the fact
    table) still beat AQE's split heuristics. The big side gets a
    deterministic salt in [0, {N_SALTS}); the small side is exploded
    {N_SALTS}x; the join key becomes (key, salt), spreading each hot key
    over {N_SALTS} shuffle partitions. Semantically identical to the
    plain join — which is exactly what the oracle checks.
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_partkey", "l_suppkey", "l_linenumber"), F.lit(N_SALTS))
    )
    orders = load(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    )
    return (
        li.join(orders, (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_scalar_array",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             LIST(l_linenumber ORDER BY l_linenumber) AS lines,
             LIST(ROUND(l_extendedprice, 2) ORDER BY l_linenumber) AS prices
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(LEN(lines) AS BIGINT) AS n_lines,
           ARRAY_TO_STRING(lines[1:3], ',') AS first3,
           LIST_CONTAINS(lines, 4) AS has_line4,
           ROUND(LIST_SUM(prices), 2) AS total_price
    FROM per_order
    """,
)
def q_scalar_array(spark, sf_dir):
    """Array-function family over grouped data: ordered collect, slice,
    membership, and a higher-order sum — the nested-type surface
    (ArrayType columns flow through shuffles like scalars)."""
    li = load(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(F.collect_list("l_linenumber")).alias("lines"),
            F.expr(
                "transform(array_sort(collect_list(struct(l_linenumber, "
                "round(l_extendedprice, 2) AS p))), x -> x.p)"
            ).alias("prices"),
        )
    )
    return per_order.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        # array ops stay exercised (collect/sort/slice) but the final
        # projection is scalar-only: the driver's canonicalizer hashes
        # pandas frames and list cells are unhashable.
        F.array_join(F.slice("lines", 1, 3), ",").alias("first3"),
        F.array_contains("lines", 4).alias("has_line4"),
        F.round(
            F.aggregate("prices", F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("total_price"),
    )


@register(
    "q_unpivot_metrics",
    oracle="""
    SELECT metric, ROUND(AVG(value), 4) AS avg_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount
      INTO NAME metric VALUE value
    )
    GROUP BY metric
    """,
)
def q_unpivot_metrics(spark, sf_dir):
    """Unpivot (melt): wide metric columns to (metric, value) rows, then
    aggregate per metric — one scan, rows expand 3x map-side, no extra
    shuffle beyond the final aggregation."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            [],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "value",
        )
        .groupBy("metric")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    THE distinct-counting strategy at 100 TB: the sketch is fixed-size
    and mergeable, so the aggregation stays map-side partial + tiny
    shuffle regardless of cardinality, where exact COUNT(DISTINCT)
    shuffles every distinct value.

    The raw sketch estimate is engine-specific, so the CHECKABLE contract
    is the error bound, not the estimate: emit the exact count plus a
    boolean asserting the HLL estimate (rsd 0.02) landed within 5%
    relative error. The oracle computes the exact count and a literal
    TRUE — if Spark's sketch ever drifts past tolerance the value hash
    breaks, which is exactly the regression this row should catch. The
    tighter relative-error assertion lives in
    tests/test_scale_techniques.py.
    """
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col(
        "exact_parts"
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n_rows",
        (rel_err <= 0.05).alias("within_tol"),
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a broadcast
    dimension join — the promo revenue share for one month. Both the
    date predicates push to the fact scan; the part join broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_brackets",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_type = 'ECONOMY' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_disjunctive_brackets(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd predicate brackets mixing join-side
    columns. Catalyst extracts the common join key (the brackets stay a
    post-join filter) and pushes the per-side disjunction components
    into each scan where derivable — the query that punishes engines
    without CNF extraction."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    b1 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    b3 = (
        (F.col("p_type") == "ECONOMY")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return joined.filter(b1 | b2 | b3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_window_distribution",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_distribution(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per priority partition with a deterministic tie-break — the ranking
    family beyond plain rank/row_number. One shuffle on the partition
    key, per-partition sort, no global ordering."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_agg_mode",
    oracle="""
    SELECT o_orderpriority, l_returnflag AS modal_flag,
           CAST(cnt AS BIGINT) AS n
    FROM (
      SELECT o_orderpriority, l_returnflag, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY COUNT(*) DESC, l_returnflag) AS rn
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority, l_returnflag
    ) WHERE rn = 1
    """,
)
def q_agg_mode(spark, sf_dir):
    """Per-group modal value (most frequent return flag per priority)
    with a deterministic tie-break — count-then-rank, the standard
    two-shuffle mode computation (Spark's mode() aggregate has
    nondeterministic ties, so the explicit form is the portable one)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    counts = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("n"), "l_returnflag")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("l_returnflag").alias("modal_flag"), "n")
    )


# --- TPC-H Q4/Q18/Q22 shapes adapted to the fixture schema ----------------
# (fixtures lack l_commitdate/l_receiptdate/l_shipmode/c_phone, so the
#  canonical predicates are re-expressed on the columns that exist; the
#  operator shapes — EXISTS semi-join, HAVING-subquery IN, scalar-subquery
#  + anti-join — are preserved. Reference delegates all SQL to the reader
#  engine, README.md:50-107.)

@register(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a left-semi
    join, then a grouped count. The correlated predicate compares a
    probe-side column against a build-side column (shipdate vs
    orderdate+60d), so it rides the semi-join condition; the date range
    pushes to the orders scan."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q18_large_volume",
    oracle="""
    SELECT c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (an aggregated
    semi-join), re-joined to the fact for the final rollup, top-100 by
    price. The HAVING aggregate is a map-side-combinable sum; at scale
    the qualifying-keys set is small, so Spark's runtime broadcasts it
    into the semi-join under AQE."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"),
                    F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q22_dormant_rich",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_dormant_rich(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average,
    computed once and folded into the filter as a broadcast scalar) plus
    NOT EXISTS decorrelated to a left-anti join against a date-pruned
    orders slice — "rich customers with no recent orders", per segment."""
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal"))
    return (
        cust.join(avg_bal, F.col("c_acctbal") > F.col("avg(c_acctbal)"))
        .drop("avg(c_acctbal)")
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    WHERE l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar-aggregate subquery (per-part
    average quantity) decorrelated by hand into a grouped aggregate
    joined back to the fact on the correlation key — the self-join-
    with-aggregate pattern. The per-key aggregate is map-side
    combinable and its output is one row per part, so under AQE it
    broadcasts into the probe; the fact table is scanned once per
    side with only the three needed columns."""
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_join_full_outer",
    oracle="""
    WITH cn AS (
      SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer WHERE c_acctbal > 8000 GROUP BY 1
    ),
    sn AS (
      SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier WHERE s_acctbal > 8000 GROUP BY 1
    )
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def q_join_full_outer(spark, sf_dir):
    """Full-outer join: per-nation counts of high-balance customers vs
    high-balance suppliers, keeping nations present on either side only.
    Completes the join-type surface (inner/left/semi/anti/full). Full
    outer can't broadcast — both sides shuffle on the key; here both
    inputs are pre-aggregated so the shuffled rows are one per nation."""
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    cn = (
        cust.filter(F.col("c_acctbal") > 8000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        sup.filter(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.alias("c")
        .join(sn.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer")
        .select(
            F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "q_window_ntile",
    oracle="""
    SELECT c_mktsegment, tile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM (
      SELECT c_mktsegment, c_acctbal,
             NTILE(10) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS tile
      FROM customer
    ) t
    GROUP BY c_mktsegment, tile
    """,
)
def q_window_ntile(spark, sf_dir):
    """Decile bucketing per market segment via NTILE — equal-frequency
    binning, summarized per bucket. c_custkey tiebreaks equal balances
    so tile assignment is deterministic; min/max project exact input
    doubles (no rounding drift)."""
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.withColumn("tile", F.ntile(10).over(w))
        .groupBy("c_mktsegment", "tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "q_agg_pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS weighted_avg_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_pandas_udaf(spark, sf_dir):
    """User-defined aggregate via a GROUPED_AGG pandas UDF — the
    extensibility surface the reference lacks entirely (SURVEY §2.3):
    quantity-weighted mean price per return flag, computed Arrow-batched
    per group. Built-ins express this case too (the oracle is plain
    SQL), but the shape generalizes to aggregates Catalyst has no
    operator for. Rounded to 4: pandas' pairwise summation and the
    engines' sequential sums agree well past that precision, though not
    bitwise."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module-level `from __future__ import
    # annotations` stringifies type hints, which defeats signature
    # inference for pandas UDFs
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg(price, qty):
        return float((price * qty).sum() / qty.sum())

    # grouped-agg pandas UDFs cannot mix with built-in aggregates in one
    # agg() — the row count is a second UDAF
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def cnt(qty):
        return len(qty)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price"),
        cnt("l_quantity").alias("n"),
    )


@register(
    "q_window_first_last_nth",
    oracle="""
    SELECT DISTINCT l_orderkey,
           FIRST_VALUE(l_extendedprice) OVER w AS first_price,
           LAST_VALUE(l_extendedprice) OVER w AS last_price,
           NTH_VALUE(l_extendedprice, 2) OVER w AS second_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last_nth(spark, sf_dir):
    """Navigation window functions (first_value / last_value / nth_value)
    over the full-partition frame — one per-order row summarizing the
    first, last, and second line's price. The explicit UNBOUNDED frame
    matters: last_value over the default frame is the current row, a
    classic窗-function trap both engines share. Exact doubles, no
    rounding (values are copied, not summed)."""
    li = load(spark, sf_dir, "lineitem")
    # l_linenumber DUPLICATES within an order in this fixture — the price
    # tiebreak makes the ordering (and thus the navigated values)
    # engine-deterministic
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        li.select(
            "l_orderkey",
            F.first("l_extendedprice").over(w).alias("first_price"),
            F.last("l_extendedprice").over(w).alias("last_price"),
            F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
        )
        .distinct()
    )


@register(
    "q_agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_corr_covar(spark, sf_dir):
    """Bivariate statistical aggregates (correlation, sample covariance,
    regression slope) per group — single-pass mergeable moment sketches
    in both engines, so they stay map-side partial at any scale; rounded
    past the summation-order drift."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
    )


@register(
    "q_agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(BIT_OR(l_linenumber) AS BIGINT) AS lines_or,
           CAST(BIT_AND(l_linenumber) AS BIGINT) AS lines_and,
           CAST(BIT_XOR(l_orderkey) AS BIGINT) AS orders_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bitwise(spark, sf_dir):
    """Bitwise aggregates — integer-exact and order-independent (OR/AND
    are idempotent-commutative, XOR commutative), so no rounding is
    needed anywhere; the set-membership-bitmap building block."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_or(l_linenumber)").cast("long").alias("lines_or"),
        F.expr("bit_and(l_linenumber)").cast("long").alias("lines_and"),
        F.expr("bit_xor(l_orderkey)").cast("long").alias("orders_xor"),
    )


@register(
    "q_agg_string_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(l_linenumber))), ',')
             AS line_numbers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_string_agg(spark, sf_dir):
    """Ordered string aggregation: the distinct line numbers per group as
    a sorted CSV — collect_set → array_sort → array_join makes the
    concatenation order-deterministic (a bare string_agg depends on row
    arrival order and can never hash-match across engines)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.array_join(F.array_sort(F.collect_set("l_linenumber")), ",").alias(
            "line_numbers"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# --- higher-order array functions ----------------------------------------

@register(
    "q_scalar_array_hof",
    oracle="""
    WITH t AS (SELECT p_partkey, range(1, p_size % 8 + 4) AS arr FROM part)
    SELECT p_partkey,
           ARRAY_TO_STRING(list_transform(arr, x -> x * 2), ',') AS doubled,
           ARRAY_TO_STRING(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
           LEN(list_filter(arr, x -> x > 5)) > 0 AS has_gt5,
           CAST(list_sum(arr) AS BIGINT) AS total,
           ARRAY_TO_STRING(
             list_transform(range(1, len(arr) + 1),
                            i -> arr[i] + arr[len(arr) - i + 1]), ',')
             AS mirror_sums
    FROM t
    """,
)
def q_scalar_array_hof(spark, sf_dir):
    """Higher-order array functions — transform / filter / exists /
    aggregate / zip_with as Catalyst lambda expressions. These run inside
    codegen on the JVM (no Python round-trip), which is what makes
    array-typed feature columns viable at 100 TB: a per-row lambda over
    an array shuffles and pipelines like any scalar expression. Final
    projection is scalar-only (arrays serialized via array_join) for the
    driver's canonicalizer."""
    part = load(spark, sf_dir, "part")
    arr = F.sequence(F.lit(1).cast("long"), (F.col("p_size") % 8 + 3).cast("long"))
    t = part.select("p_partkey", arr.alias("arr"))
    return t.select(
        "p_partkey",
        F.array_join(F.transform("arr", lambda x: x * 2), ",").alias("doubled"),
        F.array_join(F.filter("arr", lambda x: x % 2 == 0), ",").alias("evens"),
        F.exists("arr", lambda x: x > 5).alias("has_gt5"),
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total"),
        F.array_join(
            F.zip_with("arr", F.reverse("arr"), lambda a, b: a + b), ","
        ).alias("mirror_sums"),
    )


# --- exact median + discrete percentiles ---------------------------------

@register(
    "q_agg_median_disc",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_disc(l_extendedprice, 0.25) AS p25_price,
           quantile_disc(l_extendedprice, 0.90) AS p90_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_median_disc(spark, sf_dir):
    """Exact median (continuous) + discrete percentiles. percentile_disc
    picks an actual order statistic — no interpolation arithmetic — so it
    is bit-exact across engines; median over integral-valued doubles
    interpolates at worst to x.5, also exact. Both are single-pass sort
    aggregates that partial-aggregate per partition before one shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p25_price"),
        F.expr(
            "percentile_disc(0.90) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# --- skewness / kurtosis (shape moments) ---------------------------------

@register(
    "q_agg_skew_kurtosis",
    oracle="""
    WITH mu AS (
      SELECT l_returnflag, AVG(l_quantity) AS m FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           ROUND(AVG(POW(l_quantity - m, 3))
                 / POW(AVG(POW(l_quantity - m, 2)), 1.5), 6) AS skew,
           ROUND(AVG(POW(l_quantity - m, 4))
                 / POW(AVG(POW(l_quantity - m, 2)), 2) - 3, 6) AS kurt,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q_agg_skew_kurtosis(spark, sf_dir):
    """Population skewness and excess kurtosis per group. Spark's
    skewness/kurtosis are the population formulas m3/m2^1.5 and
    m4/m2^2-3 over central moments; the oracle states those formulas
    explicitly (DuckDB's builtins are the bias-corrected sample versions,
    a different estimator). One-pass streaming moments here vs the
    oracle's two-pass mean-join — rounded to 6 to absorb the
    accumulation-order difference."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_window_rolling_median",
    oracle="""
    SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           ROUND(median(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 4) AS roll_median
    FROM lineitem
    WHERE l_suppkey < 50
    """,
)
def q_window_rolling_median(spark, sf_dir):
    """Rolling exact median over an 11-row frame per supplier — the
    robust-statistics window (outlier-resistant trend) that mean-based
    running aggregates can't give. Spark's exact percentile is a true
    aggregate, so it runs inside the window frame without collecting the
    partition; the order-by key is made unique (shipdate, orderkey,
    linenumber) so both engines see identical frame contents — a rolling
    frame over a non-unique sort key is nondeterministic by definition.
    One exchange on l_suppkey; the supplier filter is pushed to the
    scan. At scale, per-partition frame evaluation is O(rows × frame),
    so frame width — not table size — is the knob that matters."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 50)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-10, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.expr("percentile(l_quantity, 0.5)").over(w), 4).alias(
            "roll_median"
        ),
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name <> b.r_name
    """,
)
def q_join_cross(spark, sf_dir):
    """Explicit cartesian product of a tiny dimension with itself (all
    ordered region pairs) — the one join type the rest of the library
    deliberately avoids. Legitimate only when both sides are
    broadcast-small (pairwise comparison matrices, parameter grids);
    crossJoin states the intent so Catalyst doesn't reject an
    accidental missing-condition join (spark.sql.crossJoin semantics)."""
    r = load(spark, sf_dir, "region").select("r_name")
    a, b = r.alias("a"), r.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_name") != F.col("b.r_name"))
        .select(
            F.col("a.r_name").alias("region_a"),
            F.col("b.r_name").alias("region_b"),
        )
    )


def _zorder_exprs() -> "tuple[str, str]":
    """Build the 8-bit × 8-bit Morton-interleave expression for Spark SQL
    and DuckDB (same arithmetic, different shift syntax)."""
    spark_terms = []
    duck_terms = []
    for i in range(8):
        spark_terms.append(
            f"shiftleft(shiftright(xd, {i}) & 1, {2 * i})"
            f" + shiftleft(shiftright(yd, {i}) & 1, {2 * i + 1})"
        )
        duck_terms.append(
            f"(((xd >> {i}) & 1) << {2 * i}) + (((yd >> {i}) & 1) << {2 * i + 1})"
        )
    return " + ".join(spark_terms), " + ".join(duck_terms)


_Z_SPARK, _Z_DUCK = _zorder_exprs()


@register(
    "q_zorder_key",
    oracle=f"""
    WITH dims AS (
      SELECT o_orderkey,
             o_custkey % 256 AS xd,
             CAST(DATE_DIFF('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
               % 256 AS yd
      FROM orders
    ),
    keyed AS (SELECT o_orderkey, xd, yd, {_Z_DUCK} AS zkey FROM dims)
    SELECT zkey // 1024 AS z_bucket,
           COUNT(*) AS n_orders,
           CAST(MAX(xd) - MIN(xd) AS BIGINT) AS cust_spread,
           CAST(MAX(yd) - MIN(yd) AS BIGINT) AS day_spread
    FROM keyed
    GROUP BY 1
    """,
)
def q_zorder_key(spark, sf_dir):
    """Morton (Z-order) clustering key: interleave the low 8 bits of
    customer id and order day so sorting by one key co-locates BOTH
    dimensions — the multi-column data-skipping layout (Delta/Iceberg
    Z-ORDER) reduced to pure column arithmetic. The per-bucket spread
    audit shows why it works: each 1024-wide zkey range touches at most
    a 32-value slice of either dimension, so min/max page stats prune
    scans filtered on either column. Writing the actual layout is then
    just repartitionByRange(zkey).sortWithinPartitions(zkey) before the
    parquet sink — same mechanics the UTXO converter uses for script
    clustering, generalized to two dimensions."""
    o = load(spark, sf_dir, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("xd"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            % 256
        ).alias("yd"),
    )
    keyed = dims.select("o_orderkey", "xd", "yd", F.expr(_Z_SPARK).alias("zkey"))
    return (
        keyed.groupBy((F.col("zkey") / 1024).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.max("xd") - F.min("xd")).cast("long").alias("cust_spread"),
            (F.max("yd") - F.min("yd")).cast("long").alias("day_spread"),
        )
    )


@register(
    "q_cdc_merge_apply",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    changes AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'I'
                  WHEN o_orderkey % 2 = 0 THEN 'U'
                  ELSE 'D' END AS op,
             o_orderstatus,
             ROUND(o_totalprice * 1.1, 2) AS new_price
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
      SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
             COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
             CASE WHEN c.op IN ('I','U') THEN c.new_price
                  ELSE b.o_totalprice END AS o_totalprice
      FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM merged WHERE o_orderkey % 100 < 5
    """,
)
def q_cdc_merge_apply(spark, sf_dir):
    """CDC merge (lakehouse MERGE INTO semantics on plain Spark): apply a
    change set of inserts / updates / deletes onto a base table with one
    full-outer join — update rows take the change's values, deletes drop
    the row, inserts survive the join with no base match. The change set
    here is derived deterministically from the fixture so the oracle
    replays the identical merge. At scale this is the nightly
    table-maintenance shape: shuffle both sides on the merge key once;
    when the change set is small relative to base (the usual case),
    broadcast it and rewrite only matched files instead — same logical
    plan, physical strategy chosen by size. The deterministic keyed
    sample bounds the checked output without an ORDER BY ... LIMIT
    (which would need a global sort just for the gate)."""
    o = load(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    changes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("c_key"),
        F.when(F.col("o_orderkey") % 7 == 0, "I")
        .when(F.col("o_orderkey") % 2 == 0, "U")
        .otherwise("D")
        .alias("op"),
        F.col("o_orderstatus").alias("c_status"),
        F.round(F.col("o_totalprice") * 1.1, 2).alias("new_price"),
    )
    merged = (
        base.join(changes, base.o_orderkey == changes.c_key, "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(F.col("o_orderkey"), F.col("c_key")).alias("o_orderkey"),
            F.coalesce(F.col("c_status"), F.col("o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.when(F.col("op").isin("I", "U"), F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return merged.filter(F.col("o_orderkey") % 100 < 5)


@register(
    "q_lateral_topn",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_nationkey
    FROM region r, LATERAL (
      SELECT n_name, n_nationkey FROM nation
      WHERE n_regionkey = r.r_regionkey
      ORDER BY n_name LIMIT 2
    ) t
    """,
)
def q_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 nations per region by name) —
    the SQL-surface twin of the window top-k-per-group operator.
    Catalyst decorrelates the lateral into a ranked join, so the
    physical plan is the same shuffle-on-group + per-group sort the
    DataFrame version produces; what this adds is coverage of the
    LATERAL syntax path (parser + decorrelation rules), which the
    DataFrame API never exercises."""
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_nationkey
        FROM region r, LATERAL (
          SELECT n_name, n_nationkey FROM nation
          WHERE n_regionkey = r.r_regionkey
          ORDER BY n_name LIMIT 2
        ) t
        """
    )


@register(
    "q_join_null_safe",
    oracle="""
    WITH cn AS (
      SELECT NULLIF(c_nationkey, 3) AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    ),
    sn AS (
      SELECT NULLIF(s_nationkey, 3) AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT cn.nk AS nationkey, n_cust, n_supp
    FROM cn JOIN sn ON cn.nk IS NOT DISTINCT FROM sn.nk
    """,
)
def q_join_null_safe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping, the semantics needed
    when a join key legitimately encodes "unknown" (here nation 3 is
    nulled on both sides to manufacture the case). Both inputs are
    pre-aggregated to one row per key first, so the NULL group joins
    1×1 instead of |nulls|×|nulls| — the null-safe twin of the usual
    pre-aggregate-before-join discipline, and doubly important here
    because a hot NULL key is the most common real-world skew key."""
    nk_c = F.nullif(F.col("c_nationkey"), F.lit(3))
    nk_s = F.nullif(F.col("s_nationkey"), F.lit(3))
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(nk_c.alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(nk_s.alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.alias("c")
        .join(sn.alias("s"), F.col("c.nk").eqNullSafe(F.col("s.nk")))
        .select(F.col("c.nk").alias("nationkey"), "n_cust", "n_supp")
    )


# --- MapType surface ------------------------------------------------------


@register(
    "q_scalar_map",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey, l_linenumber, CAST(SUM(l_quantity) AS BIGINT) AS qty
      FROM lineitem GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           STRING_AGG(l_linenumber || '=' || qty, ',' ORDER BY l_linenumber) AS entries,
           MAX(CASE WHEN l_linenumber = 1 THEN qty END) AS qty_line1,
           CAST(COUNT(*) FILTER (WHERE qty >= 25) AS BIGINT) AS n_heavy
    FROM lines GROUP BY l_orderkey
    """,
)
def q_scalar_map(spark, sf_dir):
    """MapType surface: build a linenumber→quantity map per order with
    map_from_entries, then probe it with element_at / map_filter /
    map_entries — maps flow through shuffles like scalars, so a per-row
    keyed property bag needs no second table. Final projection
    serializes the (sorted) entries to a string for the driver's
    canonicalizer, mirroring how a map column would be exported to a
    JSON/text sink."""
    li = load(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("k"),
                        F.col("qty").alias("v"),
                    )
                )
            )
        ).alias("m")
    )
    entries = F.concat_ws(
        ",",
        F.transform(
            F.map_entries("m"),
            lambda e: F.concat(e["key"].cast("string"), F.lit("="), e["value"].cast("string")),
        ),
    )
    return per_order.select(
        "l_orderkey",
        F.size("m").cast("long").alias("n_lines"),
        entries.alias("entries"),
        F.element_at("m", F.lit(1)).alias("qty_line1"),
        F.size(F.map_filter("m", lambda k, v: v >= 25)).cast("long").alias("n_heavy"),
    )


# --- cumulative distinct (first-occurrence flag + running sum) ------------


@register(
    "q_window_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(DATE_TRUNC('month', MIN(o.o_orderdate)) AS DATE) AS first_month
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    monthly AS (
      SELECT nationkey, first_month AS month,
             CAST(COUNT(*) AS BIGINT) AS new_customers
      FROM firsts GROUP BY nationkey, first_month
    )
    SELECT nationkey, month, new_customers,
           CAST(SUM(new_customers) OVER (PARTITION BY nationkey ORDER BY month
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_customers
    FROM monthly
    """,
)
def q_window_cumulative_distinct(spark, sf_dir):
    """Cumulative COUNT(DISTINCT) over time — not directly supported in
    window frames by any engine at scale — via the standard rewrite:
    reduce each (nation, customer) to its first-activity month, count
    firsts per month, then a running sum. Turns an O(n·frame) distinct
    window into two hash aggregations plus a window over the tiny
    monthly rollup."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    firsts = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.to_date(F.date_trunc("month", F.min("o_orderdate"))).alias("first_month"))
    )
    monthly = (
        firsts.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("first_month").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("new_customers"))
    )
    w = W.partitionBy("nationkey").orderBy("month").rowsBetween(W.unboundedPreceding, W.currentRow)
    return monthly.select(
        "nationkey",
        "month",
        "new_customers",
        F.sum("new_customers").over(w).cast("long").alias("cum_customers"),
    )


# --- data-quality expectations (constraint-violation report) --------------


@register(
    "q_quality_expectations",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_checked FROM lineitem)
    SELECT 'quantity_in_1_50' AS rule, n_checked,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT) AS n_violations
    FROM lineitem CROSS JOIN n GROUP BY n_checked
    UNION ALL
    SELECT 'discount_in_0_0p1', n_checked,
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                AS BIGINT)
    FROM lineitem CROSS JOIN n GROUP BY n_checked
    UNION ALL
    SELECT 'orderkey_not_null', n_checked,
           CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
    FROM lineitem CROSS JOIN n GROUP BY n_checked
    UNION ALL
    SELECT 'orderkey_fk_orders', n_checked,
           CAST(COUNT(*) FILTER (
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
           ) AS BIGINT)
    FROM lineitem CROSS JOIN n GROUP BY n_checked
    UNION ALL
    SELECT 'line_id_unique', n_checked,
           CAST(COALESCE(SUM(c), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS c FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
         CROSS JOIN n GROUP BY n_checked
    """,
)
def q_quality_expectations(spark, sf_dir):
    """Data-quality expectations: evaluate a rule set (range, not-null,
    foreign-key, uniqueness) over a table and report violations per rule
    — the validation gate a lake pipeline runs before publishing a
    partition.

    Engineered as three scans, not one per rule: all ROW-LOCAL rules
    (range/null) fold into a single conditional aggregation; the FK rule
    is one broadcast-able anti-join count; uniqueness is one keyed
    aggregation. Adding row-local rules costs zero extra passes —
    the shape stays fixed as the rule set grows."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    viol = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    n_checked = F.count(F.lit(1)).cast("long")
    row_local = li.agg(
        n_checked.alias("n_checked"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "quantity_in_1_50"
        ),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "discount_in_0_0p1"
        ),
        viol(F.col("l_orderkey").isNull()).alias("orderkey_not_null"),
    )
    rules = row_local.unpivot(
        ["n_checked"],
        ["quantity_in_1_50", "discount_in_0_0p1", "orderkey_not_null"],
        "rule",
        "n_violations",
    ).select("rule", "n_checked", "n_violations")

    total = li.agg(n_checked.alias("n_checked"))
    fk = (
        li.join(F.broadcast(o.select("o_orderkey")),
                li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .crossJoin(total)
        .select(F.lit("orderkey_fk_orders").alias("rule"), "n_checked", "n_violations")
    )
    uniq = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_violations"))
        .crossJoin(total)
        .select(F.lit("line_id_unique").alias("rule"), "n_checked", "n_violations")
    )
    return rules.unionByName(fk).unionByName(uniq)


@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE walk(okey, node, depth) AS (
      SELECT o_orderkey, o_orderkey, 0 FROM orders
      UNION ALL
      SELECT okey, node // 32, depth + 1 FROM walk WHERE node >= 32
    )
    SELECT node AS root_key,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           CAST(SUM(okey) AS BIGINT) AS sum_keys
    FROM walk WHERE node < 32 GROUP BY node
    """,
)
def q_recursive_cte(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE, Spark 4): walk a synthetic
    parent(k)=k div 32 hierarchy from every order up to its root and
    aggregate per root — the iterate-to-fixpoint surface (transitive
    closure / BOM explosion) expressed declaratively instead of a
    driver-side loop. The engine unions per-level frontiers until the
    recursion drains; each level is one distributed step, and the
    WHERE node >= 32 guard bounds the depth (log32 of the key domain),
    so the plan is a short fixed chain at any scale. The reference has
    no iterative operators (SURVEY.md §2.3); this is the idiomatic
    Spark-4 counterpart of its absence-noted "subqueries/CTEs" row."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec_v")
    return spark.sql(
        """
        WITH RECURSIVE walk(okey, node, depth) AS (
          SELECT o_orderkey, o_orderkey, 0 FROM orders_rec_v
          UNION ALL
          SELECT okey, node DIV 32, depth + 1 FROM walk WHERE node >= 32
        )
        SELECT node AS root_key,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               CAST(SUM(okey) AS BIGINT) AS sum_keys
        FROM walk WHERE node < 32 GROUP BY node
        """
    )


@register(
    "q_scalar_try_arith",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             l_orderkey / NULLIF(l_linenumber - 3, 0) AS safe_ratio,
             TRY_CAST(CASE WHEN l_linenumber <= 3
                           THEN CAST(l_orderkey AS VARCHAR)
                           ELSE 'k' || CAST(l_orderkey AS VARCHAR) END
                      AS BIGINT) AS parsed
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN safe_ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           ROUND(SUM(safe_ratio), 2) AS sum_ratio,
           CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cast_null,
           CAST(SUM(parsed) AS BIGINT) AS sum_parsed
    FROM t GROUP BY l_returnflag
    """,
)
def q_scalar_try_arith(spark, sf_dir):
    """Error-safe scalar surface (ANSI mode is the Spark 4 default, so
    raw division/cast throw on bad input mid-job — fatal at 100 TB where
    one poisoned row kills a stage): try_divide nulls out
    division-by-zero and try_cast nulls malformed numeric strings, with
    the null counts surfaced per group so data-quality loss is
    observable instead of silent. The oracle expresses the same
    semantics via NULLIF and TRY_CAST."""
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.try_divide(F.col("l_orderkey"), F.col("l_linenumber") - 3).alias("safe_ratio"),
        F.expr(
            "try_cast(CASE WHEN l_linenumber <= 3 THEN CAST(l_orderkey AS STRING)"
            " ELSE concat('k', CAST(l_orderkey AS STRING)) END AS BIGINT)"
        ).alias("parsed"),
    )
    return t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("safe_ratio").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_div_null"),
        F.round(F.sum("safe_ratio"), 2).alias("sum_ratio"),
        F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_cast_null"),
        F.sum("parsed").cast("long").alias("sum_parsed"),
    )


@register(
    "q_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_discounted,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
    FROM lineitem
    """,
)
def q_observe_metrics(spark, sf_dir):
    """Run-time metrics via DataFrame.observe: the scan is instrumented
    with named aggregates that accumulate DURING the job, so pipeline
    telemetry (row counts, quality counters, watermark values) costs
    zero extra passes — at 100 TB the alternative is a second
    full-table validation scan after every write. The observed values
    are collected from the one action and returned as a 1-row frame;
    the oracle recomputes the same aggregates declaratively."""
    from pyspark.sql import Observation

    obs = Observation("lineitem_metrics")
    li = load(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("long")
        .alias("n_discounted"),
        F.max("l_orderkey").alias("max_orderkey"),
    )
    li.write.format("noop").mode("overwrite").save()  # one pass, no result set
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_price"], m["n_discounted"], m["max_orderkey"])],
        "n_rows long, sum_price double, n_discounted long, max_orderkey long",
    )


@register(
    "q_table_fingerprint",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(bit_xor(('0x' || substr(md5(CONCAT_WS('|',
                  CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR),
                  CAST(l_suppkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
                  l_returnflag, l_linestatus)), 1, 15))::BIGINT)
                AS BIGINT) AS fingerprint
    FROM lineitem
    """,
)
def q_table_fingerprint(spark, sf_dir):
    """Whole-table content fingerprint: xor-aggregate of a 60-bit hash of
    each row's key columns — the anti-entropy primitive for validating
    replicas/migrations without moving data (two sides exchange ONE row
    each). XOR is commutative/associative, so the aggregation is fully
    map-side partial with no ordering requirement, and any single-row
    difference flips the fingerprint.

    Hashes only the integer/flag columns whose text rendering is
    engine-stable (floats render differently across engines — a
    production fingerprint would hash their IEEE bits instead)."""
    li = load(spark, sf_dir, "lineitem")
    row_repr = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        "l_returnflag",
        "l_linestatus",
    )
    h = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long")
    return li.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h)").cast("long").alias("fingerprint"),
    )


@register(
    "q_basket_pair_counts",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM b a JOIN b c
      ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def q_basket_pair_counts(spark, sf_dir):
    """Market-basket pair counts: how often two parts appear in the same
    order — the co-occurrence aggregation under recommendation rules
    (the counting core of FP-growth/apriori). Equi-self-join on the
    basket key, pair ordered a < b to emit each pair once, kept when
    support >= 2.

    Scale shape: fan-out per basket is C(lines, 2) with TPC-H-bounded
    lines-per-order (<= 7), so the join output is a small constant
    multiple of the fact table — the skew failure mode of pair
    self-joins (one giant basket) is structurally absent here; for
    unbounded baskets the guard is the same DF-cap used by the shingle
    index."""
    li = load(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    c = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(c, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


# --- bloom-filter runtime join pruning: the explicit semi-join filter -----

BLOOM_BITS = 1 << 17  # m: 131072 bits = 2048 longs = 16 KiB broadcast
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 5  # k: fpr ~ (1 - e^(-k*n/m))^k ~ 2e-7 at n~1.2k keys


def bloom_build(dim, key: str):
    """Fold the dim side's join keys into a bit-packed bloom filter:
    one row, one ``array<long>`` of {BLOOM_WORDS} words (16 KiB). Two
    bounded aggregates — per-word bit_or (≤{BLOOM_WORDS} groups), then a
    single-row map assembly — so the build cost is one pass over the dim
    keys regardless of dim size."""
    seeds = F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])
    return (
        dim.select(F.explode(seeds).alias("seed"), key)
        .select(F.pmod(F.xxhash64(key, "seed"), F.lit(BLOOM_BITS)).alias("pos"))
        .select(
            F.shiftright("pos", 6).cast("int").alias("word"),
            F.col("pos").bitwiseAND(F.lit(63)).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("w"))
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "w"))).alias("m"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
                lambda i: F.coalesce(F.try_element_at("m", i), F.lit(0).cast("long")),
            ).alias("bf")
        )
    )


def bloom_probe(fact, key: str, bf):
    """Prune ``fact`` to rows whose ``key`` MIGHT be in the bloom filter
    ``bf`` (1-row DataFrame from :func:`bloom_build`). The sketch reaches
    every row via a 1-row broadcast nested-loop attach; each row then
    pays {BLOOM_HASHES} xxhash64 probes + bit tests, all JVM codegen —
    no shuffle, no Python. False positives pass (the caller's exact join
    removes them); true matches always pass."""
    probed = fact.crossJoin(F.broadcast(bf))
    for i in range(BLOOM_HASHES):
        probed = probed.withColumn(
            f"_p{i}", F.pmod(F.xxhash64(key, F.lit(i)), F.lit(BLOOM_BITS))
        )
    hit = F.lit(True)
    for i in range(BLOOM_HASHES):
        hit = hit & (
            F.expr(
                f"element_at(bf, cast(shiftright(_p{i}, 6) as int) + 1)"
                f" & shiftleft(1L, cast(_p{i} & 63 as int))"
            )
            != 0
        )
    return probed.filter(hit).select(fact.columns)


@register(
    "q_join_bloom_prune",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= TIMESTAMP '1999-01-01'
    )
    GROUP BY l_returnflag
    """,
)
def q_join_bloom_prune(spark, sf_dir):
    """Explicit bloom-filter runtime join pruning — the 100-TB semi-join
    shape Spark's InjectRuntimeFilter automates, built here as a
    first-class DataFrame op (``bloom_filter_agg``/``might_contain`` are
    not publicly registered). The selective dim side ({BLOOM_HASHES}
    xxhash64 probes per key) is folded into a {BLOOM_WORDS}-long
    bit-packed array — two bounded aggregates, 16 KiB total — then
    attached to every fact row via a 1-row broadcast, so the fact table
    is pruned by pure JVM bit tests BEFORE the exact join's shuffle.
    False positives survive the bloom test but die in the exact
    (semi) join, so the result is value-identical to the plain semi
    join — exactly what the oracle checks. At 100 TB this is the
    pattern that turns a 100%-scan shuffle join into a <1%-scan one
    when the dim side is too big to broadcast whole but its key
    FINGERPRINT is not."""
    orders = load(spark, sf_dir, "orders")
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey")
    li = load(spark, sf_dir, "lineitem")
    bf = bloom_build(dim, "o_orderkey")
    pruned = bloom_probe(li, "l_orderkey", bf)
    # no broadcast hint on the exact join: the pattern's premise is a dim
    # too big to broadcast whole — after the bloom prune both join inputs
    # are small fractions, and Catalyst picks broadcast vs shuffle from
    # stats (here it still broadcasts; at 100 TB it would shuffle the
    # <1% survivors, which is the point)
    return (
        pruned.join(dim, pruned.l_orderkey == dim.o_orderkey, "semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# --- schema-evolution read: mergeSchema over drifted parquet parts --------

_SCHEMA_EVO_DIRS: dict[str, str] = {}


@register(
    "q_schema_evolution_read",
    oracle="""
    WITH merged AS (
      SELECT source, CAST(NULL AS BIGINT) AS quality
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT source, CAST(n_chars % 100 AS BIGINT) AS quality
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(quality) AS BIGINT) AS n_scored,
           CAST(SUM(COALESCE(quality, 0)) AS BIGINT) AS sum_quality
    FROM merged GROUP BY source
    """,
)
def q_schema_evolution_read(spark, sf_dir):
    """Schema-evolution read: a table whose later files carry a column
    the earlier ones predate — the normal state of any lake that has
    been written to for years. The query materializes two REAL parquet
    parts with different physical schemas (v1: doc_id/source/n_chars;
    v2 adds a quality score), then merge-reads them with
    ``mergeSchema=true`` so v1 rows surface the missing column as NULL,
    and aggregates per source. The oracle reconstructs the same logical
    union from the registered view, so the gate checks the physical
    round-trip, not just the arithmetic. Scale note: mergeSchema unions
    schemas from file footers at planning time — O(files) on the
    driver — so production pins the merged schema in a catalog and
    passes it explicitly; the read path exercised here (missing-column
    null fill inside the vectorized reader) is the same either way."""
    import tempfile

    docs = load(spark, sf_dir, "documents")
    # one mkdtemp per (process, fixture), memoized: unique per process so
    # concurrent sessions never race on overwrite-while-read, memoized so
    # repeated invocations (gate + bench run this many times per session)
    # don't leak a full table copy each call
    if sf_dir not in _SCHEMA_EVO_DIRS:
        base = tempfile.mkdtemp(prefix="schema_evo_")
        v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "source", "n_chars"
        )
        v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "source",
            "n_chars",
            (F.col("n_chars") % 100).cast("long").alias("quality"),
        )
        v1.write.mode("overwrite").parquet(f"{base}/epoch=1")
        v2.write.mode("overwrite").parquet(f"{base}/epoch=2")
        _SCHEMA_EVO_DIRS[sf_dir] = base
    base = _SCHEMA_EVO_DIRS[sf_dir]
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/epoch=1", f"{base}/epoch=2"
    )
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality").alias("n_scored"),
        F.sum(F.coalesce("quality", F.lit(0))).cast("long").alias("sum_quality"),
    )


# --- HLL sketch build + union: re-aggregatable distinct counts ------------

@register(
    "q_agg_hll_union",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS merged_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_hll_union(spark, sf_dir):
    """DataSketches HLL build-then-union — the silver-table pattern for
    distinct counts at 100 TB: fine-grained sketches (here per
    returnflag x linestatus) are persisted once, then any coarser rollup
    unions the KB-sized sketches instead of re-scanning raw data
    (hll_sketch_agg -> hll_union_agg -> hll_sketch_estimate). This is
    strictly stronger than approx_count_distinct
    (q_agg_approx_distinct): the sketch is a first-class VALUE that
    survives storage and re-aggregation, not just an aggregate's
    internal state. The checkable contract is the error bound of the
    UNIONED estimate vs the exact count (oracle emits literal TRUE);
    sketch-drift past 5% breaks the value hash."""
    li = load(spark, sf_dir, "lineitem")
    silver = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = silver.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return merged.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("est") - F.col("exact_parts")) / F.col("exact_parts")
            <= 0.05
        ).alias("merged_within_tol"),
    )


QS_CAP = 512  # summary points kept per Arrow batch
QS_TARGETS = (0.01, 0.25, 0.5, 0.75, 0.99)


def _qs_partial(batches):
    """Mergeable quantile summary over one partition's Arrow batches.

    Per batch: sort, then keep every ceil(n_b/QS_CAP)-th order statistic
    with a weight equal to the number of raw values it covers — weights
    sum to n_b exactly and the cumulative weight of each kept point IS
    its exact in-batch rank, so the only rank uncertainty is the <= k_b
    gap between kept points. A (v=NULL, w=n_b) sentinel per batch lets
    the merger count batches B and recover N without a second corpus
    pass. Memory is bounded by one Arrow batch, not the partition.
    Module-level so the rank-error theorem is unit-testable without
    Spark."""
    import math

    import numpy as np
    import pandas as pd

    for pdf in batches:
        vals = np.sort(pdf["v"].to_numpy(dtype="float64"))
        n_b = len(vals)
        if n_b == 0:
            continue
        k = math.ceil(n_b / QS_CAP)
        idx = np.arange(k - 1, n_b, k)
        if idx[-1] != n_b - 1:
            idx = np.append(idx, n_b - 1)
        w = np.diff(np.append(-1, idx))
        yield pd.DataFrame(
            {
                "v": np.append(vals[idx], np.nan),
                "w": np.append(w, n_b).astype("int64"),
                "sentinel": [False] * len(idx) + [True],
            }
        )


def _qs_merge(pdf):
    """Merge all partial summaries (bounded: <= QS_CAP x B + B rows) and
    answer the QS_TARGETS quantiles with a per-answer worst-case rank
    error of 2*ceil(N/QS_CAP) + B + 2: each batch contributes <= k_b =
    ceil(n_b/QS_CAP) <= n_b/QS_CAP + 1 gap uncertainty (sums to N/QS_CAP
    + B) and the final selection adds one more inter-point gap."""
    import math

    import pandas as pd

    sent = pdf[pdf["sentinel"]]
    b = len(sent)
    n = int(sent["w"].sum())
    pts = pdf[~pdf["sentinel"]].sort_values("v")
    cum = pts["w"].cumsum().to_numpy()
    vals = pts["v"].to_numpy()
    bound = 2 * math.ceil(n / QS_CAP) + b + 2
    out = []
    for q in QS_TARGETS:
        t = max(1, math.ceil(q * n))
        i = int((cum >= t).argmax())
        out.append((q, float(vals[i]), t, n, bound))
    return pd.DataFrame(
        out, columns=["q", "approx", "target_rank", "n", "bound"]
    )


@register(
    "q_agg_quantile_sketch",
    oracle="""
    SELECT CAST(q AS DOUBLE) AS q, (SELECT COUNT(*) FROM lineitem) AS n,
           TRUE AS within_rank_bound
    FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.99)) AS t(q)
    """,
)
def q_agg_quantile_sketch(spark, sf_dir):
    """Mergeable quantile sketch over ``l_extendedprice`` — the custom
    re-aggregatable summary family's third member (HLL: distinct, CM/MG:
    frequency, this: rank/quantile), for when ``approx_percentile`` must
    be computed bottom-up across pre-aggregated shards rather than in
    one pass.

    Shape: ``mapInPandas`` emits a <= QS_CAP-point weighted summary per
    Arrow batch (exact in-batch ranks at the kept points, sentinel rows
    carry batch counts), a single bounded ``applyInPandas`` group merges
    them — summary traffic is QS_CAP x B rows regardless of corpus size
    — and the theorem "every answer's true rank is within 2N/QS_CAP +
    B + 2 of target" is then CHECKED against the corpus: the five
    answer values (a fixed, Q_CAP-style constant pull) go back in as
    literals and one exact counting pass computes each value's true rank
    interval. ``within_rank_bound`` flips false — failing the hash — if
    the sketch ever answers outside its guarantee, under any
    partitioning or batch layout.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    summaries = li.mapInPandas(_qs_partial, "v double, w long, sentinel boolean")
    merged = (
        summaries.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda _, pdf: _qs_merge(pdf),
            "q double, approx double, target_rank long, n long, bound long",
        )
        .collect()  # bounded: exactly len(QS_TARGETS) rows
    )
    # one exact pass: the true rank interval [lt+1, le] of each answer
    aggs = []
    for i, r in enumerate(merged):
        aggs.append(F.sum((F.col("v") < r.approx).cast("long")).alias(f"lt{i}"))
        aggs.append(F.sum((F.col("v") <= r.approx).cast("long")).alias(f"le{i}"))
    ranks = li.agg(*aggs).collect()[0]
    rows = [
        (
            r.q,
            r.n,
            bool(
                ranks[f"lt{i}"] + 1 <= r.target_rank + r.bound
                and ranks[f"le{i}"] >= r.target_rank - r.bound
            ),
        )
        for i, r in enumerate(merged)
    ]
    return spark.createDataFrame(
        rows, "q double, n long, within_rank_bound boolean"
    )


KMV_K = 1024  # k-minimum-values kept per set


def _kmv_partial(batches):
    """Per-partition k-min partial: for each set label, the KMV_K
    smallest distinct 63-bit hashes seen in this partition — bounded
    memory (labels x KMV_K longs) however many rows stream through, so
    the downstream merge sees <= labels x KMV_K x partitions rows
    instead of the corpus."""
    import numpy as np
    import pandas as pd

    mins: dict = {}
    for pdf in batches:
        for lbl, grp in pdf.groupby("lbl"):
            h = grp["h"].to_numpy(dtype="int64")
            prev = mins.get(lbl)
            allh = h if prev is None else np.concatenate([prev, h])
            mins[lbl] = np.unique(allh)[:KMV_K]
    if mins:
        yield pd.DataFrame(
            {
                "lbl": np.repeat(
                    list(mins), [len(v) for v in mins.values()]
                ),
                "h": np.concatenate(list(mins.values())),
            }
        )


@register(
    "q_agg_kmv_intersect",
    oracle="""
    WITH sets AS (
      SELECT DISTINCT CAST(l_quantity AS BIGINT) AS lbl, l_partkey AS p
      FROM lineitem WHERE l_quantity <= 3
    )
    SELECT a.lbl AS lbl_a, b.lbl AS lbl_b,
           CAST(COUNT(*) AS BIGINT) AS exact_common,
           TRUE AS within_tol
    FROM sets a JOIN sets b ON a.p = b.p AND a.lbl < b.lbl
    GROUP BY 1, 2
    """,
)
def q_agg_kmv_intersect(spark, sf_dir):
    """Distinct-set INTERSECTION estimation via KMV/theta sketches —
    the set algebra HLL cannot do (HLL unions merge fine, but
    intersections need the theta trick: keep each set's KMV_K smallest
    distinct hashes; below the cut θ = min(θ_a, θ_b) the two sketches
    are uniform samples of their sets, so |{common hashes < θ}| / θ
    estimates the intersection). Sets here are 'partkeys ever shipped
    with quantity q' for q=1,2,3 — each covers ~45% of parts and
    pairwise overlaps only partially, so the estimator genuinely
    estimates (sets exceed KMV_K at sf0.1; below that the sketches
    hold the full sets and the estimate is exact by construction —
    both regimes are exercised across the gate + bench scales).

    Scale shape: one distinct on (label, key), a bounded per-partition
    k-min partial (``mapInPandas``), a window over the <= labels x
    KMV_K x partitions summary rows, then all pairwise work happens on
    sketches (labels x KMV_K rows, broadcast). The exact pairwise
    intersection — the full self-join this sketch replaces at 100 TB —
    is computed once as the contract reference; ``within_tol`` flips
    the hash if the estimate strays past max(25%, 64) of exact.
    """
    li = load(spark, sf_dir, "lineitem")
    sets = (
        li.filter(F.col("l_quantity") <= 3)
        .select(
            F.col("l_quantity").cast("long").alias("lbl"),
            F.col("l_partkey").alias("p"),
        )
        .distinct()
    )
    hashed = sets.select(
        "lbl", F.shiftrightunsigned(F.xxhash64("p"), 1).alias("h")
    )
    partials = hashed.mapInPandas(_kmv_partial, "lbl long, h long")
    w = W.partitionBy("lbl").orderBy("h")
    sk = (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .localCheckpoint(eager=True)  # bounded: labels x KMV_K rows; reused 3x
    )
    two63 = float(1 << 63)
    theta = sk.groupBy("lbl").agg(
        F.when(F.count(F.lit(1)) >= KMV_K, F.max("h") / two63)
        .otherwise(F.lit(1.0))
        .alias("theta")
    )
    a, b = sk.alias("a"), sk.alias("b")
    common = (
        a.join(F.broadcast(b), (F.col("a.h") == F.col("b.h")) & (F.col("a.lbl") < F.col("b.lbl")))
        .select(F.col("a.lbl").alias("lbl_a"), F.col("b.lbl").alias("lbl_b"), F.col("a.h").alias("h"))
        .join(F.broadcast(theta.select(F.col("lbl").alias("lbl_a"), F.col("theta").alias("th_a"))), "lbl_a")
        .join(F.broadcast(theta.select(F.col("lbl").alias("lbl_b"), F.col("theta").alias("th_b"))), "lbl_b")
        .withColumn("th", F.least("th_a", "th_b"))
        .filter(F.col("h") / two63 < F.col("th"))
        .groupBy("lbl_a", "lbl_b", "th")
        .agg((F.count(F.lit(1)) / F.col("th")).alias("est"))
    )
    exact = (
        sets.alias("x")
        .join(sets.alias("y"), (F.col("x.p") == F.col("y.p")) & (F.col("x.lbl") < F.col("y.lbl")))
        .groupBy(F.col("x.lbl").alias("lbl_a"), F.col("y.lbl").alias("lbl_b"))
        .agg(F.count(F.lit(1)).alias("exact_common"))
    )
    return exact.join(F.broadcast(common), ["lbl_a", "lbl_b"], "left").select(
        "lbl_a",
        "lbl_b",
        "exact_common",
        (
            F.abs(F.coalesce("est", F.lit(0.0)) - F.col("exact_common"))
            <= F.greatest(0.25 * F.col("exact_common"), F.lit(64.0))
        ).alias("within_tol"),
    )


# Poisson(1) CDF thresholds scaled to 2^32: a row's bootstrap weight in
# replica b is the number of thresholds its 32-bit mixed hash exceeds.
# The mix is PURE INTEGER arithmetic (multiply / xor / shift, all mod
# 2^32) expressible identically in Spark and DuckDB — a cryptographic
# hash is pointless here and md5-per-row cost 40x more wall
BOOT_THRESH = [
    1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
    4292415291, 4294609777, 4294923276, 4294962463,
]
BOOT_B = 32  # bootstrap replicas
_M32 = 1 << 32


def _boot_oracle() -> str:
    """DuckDB twin of the integer-mix Poisson bootstrap."""
    w = " + ".join(f"CASE WHEN h > {t} THEN 1 ELSE 0 END" for t in BOOT_THRESH)
    return f"""
    WITH reps AS (
      SELECT l_extendedprice AS x, b.b,
             (((l_orderkey * 8 + l_linenumber) + b.b * 1000003) % {_M32})
               AS k0
      FROM lineitem, (SELECT UNNEST(range(0, {BOOT_B})) AS b) b
    ),
    mix1 AS (SELECT x, b, (k0 * 1540483477) % {_M32} AS h1 FROM reps),
    mix2 AS (SELECT x, b, (xor(h1, h1 // 32768) * 889871637) % {_M32} AS h2
             FROM mix1),
    mixed AS (SELECT x, b, xor(h2, h2 // 8192) AS h FROM mix2),
    means AS (
      SELECT b, ROUND(SUM(({w}) * x) / SUM({w}), 4) AS m
      FROM mixed GROUP BY b
    ),
    ranked AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM means),
    ex AS (SELECT ROUND(AVG(l_extendedprice), 4) AS exact_mean FROM lineitem)
    SELECT CAST({BOOT_B} AS BIGINT) AS n_replicas,
           MAX(CASE WHEN rn = 2 THEN m END) AS ci_lo,
           MAX(CASE WHEN rn = {BOOT_B - 1} THEN m END) AS ci_hi,
           (MAX(CASE WHEN rn = 2 THEN m END) <= MAX(ex.exact_mean)
            AND MAX(ex.exact_mean) <= MAX(CASE WHEN rn = {BOOT_B - 1} THEN m END))
             AS contains_exact
    FROM ranked, ex
    """


@register("q_agg_bootstrap_ci", oracle=_boot_oracle())
def q_agg_bootstrap_ci(spark, sf_dir):
    """Bootstrap confidence interval for the mean via the POISSON
    bootstrap — the distributed form: instead of resampling rows (a
    corpus-sized shuffle per replica), every row draws an independent
    Poisson(1) weight per replica from an integer xorshift-multiply mix
    of its own key, so all replicas are weighted aggregates of ONE scan
    whose groupBy(b) map-side-combines to BOOT_B groups per partition.
    The mix is plain 64-bit arithmetic mod 2^32 (multipliers < 2^31 so ANSI mode cannot overflow), identical expression
    in both engines, so weights are bit-identical and the interval
    ENDPOINTS are value-hashed, not just a containment boolean (a
    pytest chi-squares the weight distribution against the Poisson pmf).
    ``contains_exact`` additionally checks the 2nd..31st replica-mean
    envelope captured the true mean. Implementation history, measured
    at sf0.1: md5-per-(row,replica) 13 s; 64-column single-aggregate
    md5 form 8-9 s (fell out of whole-stage codegen); this integer form
    ~1 s. At 100 TB the classical resample bootstrap is BOOT_B corpus
    shuffles; this is one scan."""
    li = load(spark, sf_dir, "lineitem")
    reps = li.select(
        F.col("l_extendedprice").alias("x"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    # multipliers < 2^31 keep every product under 2^63 (ANSI mode
    # errors on long overflow); operands are pre-reduced mod 2^32
    h1 = (((F.col("k") + F.col("b") * 1000003) % _M32) * 1540483477) % _M32
    mixed = reps.withColumn("h1", h1)
    h2 = F.expr("(h1 ^ (h1 div 32768)) * 889871637") % _M32
    mixed = mixed.withColumn("h2", h2).withColumn(
        "h", F.expr("h2 ^ (h2 div 8192)")
    )
    w = sum(
        (F.when(F.col("h") > t, 1).otherwise(0) for t in BOOT_THRESH), F.lit(0)
    )
    means = (
        mixed.withColumn("w", w)
        .groupBy("b")
        .agg(F.round(F.sum(F.col("w") * F.col("x")) / F.sum("w"), 4).alias("m"))
        .select("m")
    )
    exact = li.agg(F.round(F.avg("l_extendedprice"), 4).alias("exact_mean"))
    wr = W.orderBy("m")
    ranked = means.withColumn("rn", F.row_number().over(wr))
    return (
        ranked.agg(
            F.lit(BOOT_B).cast("long").alias("n_replicas"),
            F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == BOOT_B - 1, F.col("m"))).alias("ci_hi"),
        )
        .crossJoin(F.broadcast(exact))
        .select(
            "n_replicas",
            "ci_lo",
            "ci_hi",
            (
                (F.col("ci_lo") <= F.col("exact_mean"))
                & (F.col("exact_mean") <= F.col("ci_hi"))
            ).alias("contains_exact"),
        )
    )


# --- Benford first-digit audit over order totals ------------------------


@register(
    "q_agg_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d
      WHERE digit BETWEEN 1 AND 9 GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT digit, n_obs,
           CAST(FLOOR(CAST(n AS DOUBLE)
                      * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE))
                      * 1e4 + 0.5) AS BIGINT) AS exp_e4,
           CAST(FLOOR((CAST(n_obs AS DOUBLE)
                       - CAST(n AS DOUBLE)
                         * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                      * (CAST(n_obs AS DOUBLE)
                         - CAST(n AS DOUBLE)
                           * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                      / (CAST(n AS DOUBLE)
                         * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                      * 1e6 + 0.5) AS BIGINT) AS chi_e6
    FROM obs, tot
    """,
)
def q_agg_benford_audit(spark, sf_dir):
    """Benford first-significant-digit audit over order totals — the
    classic fraud/synthetic-data screen: natural multiplicative amounts
    follow P(d) = log10(1+1/d); fabricated or clipped data shows up as
    per-digit chi-square excess.

    The observed side is exact integer counting (leading digit via the
    decimal rendering of floor(total), a 9-value group key with map-side
    partial aggregation — one shuffle of <=9 rows per partition at any
    scale). The Benford expectation and per-digit chi-square term are
    computed from those exact BIGINTs with an identical double
    expression tree on both engines and fixed-pointed in the output
    (exp_e4, chi_e6), so the comparison never depends on float
    summation order. Total row count enters via a broadcast scalar."""
    orders = load(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    # Benford is defined on first SIGNIFICANT digits: totals under 1.0
    # floor to digit 0 (and 1/0 would cast engine-defined) — excluded on
    # both engines
    obs = (
        d.filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    j = obs.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    expct = nd * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    dev = F.col("n_obs").cast("double") - expct
    return j.select(
        "digit",
        "n_obs",
        F.floor(expct * 1e4 + F.lit(0.5)).cast("long").alias("exp_e4"),
        F.floor(dev * dev / expct * 1e6 + F.lit(0.5)).cast("long").alias("chi_e6"),
    )


@register(
    "q_agg_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS rev_e2
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(SUM(rev_e2) AS BIGINT) AS tot FROM rev)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MAX(tot) AS BIGINT) AS total_rev_e2,
           CAST(SUM(CAST(FLOOR(CAST(rev_e2 AS DOUBLE) / CAST(tot AS DOUBLE)
                               * (CAST(rev_e2 AS DOUBLE) / CAST(tot AS DOUBLE))
                               * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS hhi_e12
    FROM rev, tot
    """,
)
def q_agg_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman market-concentration index over supplier
    revenue shares — the antitrust-grade concentration screen (HHI in
    [1/n, 1]; e12 scale puts the regulatory 0.15/0.25 thresholds at
    1.5e11/2.5e11). Per-supplier discounted revenue is fixed-pointed to
    e2 BEFORE summation (exact BIGINT under any merge order); each
    squared share is one identical double expression tree fixed-pointed
    to e12 per supplier before the final exact sum, so no float
    summation order exists anywhere. Plan: one map-side-combinable
    aggregate to |suppliers| rows, a 1-row broadcast total, one scalar
    rollup."""
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.select(
            "l_suppkey",
            F.floor(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("v_e2"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("v_e2").alias("rev_e2"))
    )
    tot = rev.agg(F.sum("rev_e2").alias("tot"))
    share = F.col("rev_e2").cast("double") / F.col("tot").cast("double")
    term = F.floor(share * share * 1e12 + F.lit(0.5)).cast("long")
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(F.col("tot"), term.alias("term"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.max("tot").alias("total_rev_e2"),
            F.sum("term").alias("hhi_e12"),
        )
    )


# --- Pareto skyline: cheapest-vs-freshest non-dominated orders ----------

SKY_BUCKETS = 32


@register(
    "q_agg_pareto_skyline",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS p_e2,
             CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS d_s
      FROM orders
    ),
    sc AS (
      SELECT o_orderkey, p_e2, d_s,
             MAX(d_s) OVER (ORDER BY p_e2
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS max_d_cheaper,
             MAX(d_s) OVER (PARTITION BY p_e2) AS max_d_same
      FROM pts
    )
    SELECT o_orderkey, p_e2, d_s
    FROM sc
    WHERE (max_d_cheaper IS NULL OR max_d_cheaper < d_s)
      AND max_d_same = d_s
    """,
)
def q_agg_pareto_skyline(spark, sf_dir):
    """Two-objective Pareto skyline over orders — minimize price,
    maximize order date ("as cheap and as fresh as possible"): an order
    is on the skyline iff no other order is both <= its price and >= its
    date with one strict. The multi-objective top-k every marketplace /
    procurement query family needs, and the one all-pairs-shaped
    operator here with a clean distributed decomposition.

    Dominance test in exact integers (e2 price, epoch-second date), so
    membership is bit-deterministic. p is dominated iff
    max(date | price < p.price) >= p.date  OR  max(date | price ==
    p.price) > p.date; the oracle computes both with one RANGE window.
    The Spark plan makes that scale-correct instead: price-RANGE buckets
    from driver-side approxQuantile boundaries (bucketing only routes
    computation — membership logic is boundary-independent, so the
    sketch's nondeterminism cannot change results), a bucket-PARTITIONED
    range window for the strictly-cheaper max, a (bucket, price) window
    for the equal-price max, and a cross-bucket carry-in computed on the
    SKY_BUCKETS-row bucket aggregate (the asof-join pattern) broadcast
    back — no global window ever sees fact rows."""
    orders = load(spark, sf_dir, "orders")
    pts = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("p_e2"),
        # NTZ-safe epoch seconds: UTC session makes the NTZ→TZ cast
        # epoch-preserving, unix_micros is exact integer micros
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").alias(
            "d_s"
        ),
    )
    # value-range bucket boundaries: any boundary set is CORRECT (the
    # dominance logic below never assumes balance), approxQuantile just
    # keeps them balanced enough that no bucket holds the whole table
    qs = [i / SKY_BUCKETS for i in range(1, SKY_BUCKETS)]
    bnd = sorted(set(int(b) for b in pts.stat.approxQuantile("p_e2", qs, 0.01)))
    bucket = F.lit(0)
    for b in bnd:
        bucket = bucket + F.when(F.col("p_e2") > b, 1).otherwise(0)
    pts = pts.withColumn("bkt", bucket)
    w_cheaper = (
        W.partitionBy("bkt").orderBy("p_e2").rangeBetween(W.unboundedPreceding, -1)
    )
    w_same = W.partitionBy("bkt", "p_e2")
    sc = pts.select(
        "o_orderkey",
        "p_e2",
        "d_s",
        "bkt",
        F.max("d_s").over(w_cheaper).alias("in_bkt_cheaper"),
        F.max("d_s").over(w_same).alias("max_d_same"),
    )
    # carry-in: max date of all strictly-lower buckets, computed on the
    # SKY_BUCKETS-row aggregate (bounded single-partition window)
    bmax = pts.groupBy("bkt").agg(F.max("d_s").alias("bdmax"))
    w_carry = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    carry = bmax.select("bkt", F.max("bdmax").over(w_carry).alias("carry"))
    lo = F.lit(-(1 << 62))
    joined = sc.join(F.broadcast(carry), "bkt")
    max_d_cheaper = F.greatest(
        F.coalesce(F.col("in_bkt_cheaper"), lo), F.coalesce(F.col("carry"), lo)
    )
    return joined.filter(
        (max_d_cheaper < F.col("d_s")) & (F.col("max_d_same") == F.col("d_s"))
    ).select("o_orderkey", "p_e2", "d_s")


@register(
    "q_agg_spearman_rho",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS x,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ),
    dx AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY 1),
    rx AS (
      SELECT v,
             2 * (SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
             + cnt + 1 AS r2
      FROM dx
    ),
    dy AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY 1),
    ry AS (
      SELECT v,
             2 * (SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
             + cnt + 1 AS r2
      FROM dy
    ),
    j AS (
      SELECT rx.r2 AS rx2, ry.r2 AS ry2
      FROM c JOIN rx ON c.x = rx.v JOIN ry ON c.y = ry.v
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx2) AS sx, SUM(ry2) AS sy,
             SUM(rx2 * rx2) AS sxx, SUM(ry2 * ry2) AS syy,
             SUM(rx2 * ry2) AS sxy
      FROM j
    )
    SELECT n, sx, sy, sxx, syy, sxy,
           CAST(FLOOR(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1e6 + 0.5) AS BIGINT) AS rho_e6
    FROM m
    WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
    """,
)
def q_agg_spearman_rho(spark, sf_dir):
    """Spearman rank correlation between a customer's ORDER COUNT and
    TOTAL SPEND — the monotone-association statistic: Pearson on
    midranks, robust to the spend distribution's heavy tail where raw
    Pearson (q_agg_corr_covar) is dominated by outliers.

    Exact-integer discipline: spend is fixed-pointed to BIGINT cents
    PER ROW before summation (double order sums would drift across
    engines), both rank dimensions use DOUBLED midranks from the
    distributed two-pass global_midrank2 helper (range partition +
    32-row offset carry — no corpus-sized single-partition window), and
    the five moment sums are exact BIGINTs. Only the final rho is a
    double — ONE identical closed-form expression over those BIGINTs on
    both engines (IEEE sqrt is correctly rounded), snapped to e6 fixed
    point, with zero-variance degeneracy filtered identically on both
    sides instead of letting NaN reach the hash. At 100 TB: two
    map-side-combinable aggregations, two 32-partition range exchanges
    over DISTINCT-value relations, one moment reduce.

    Int64 bound: rx2 <= 2n, so sxx/syy grow as ~4n^3/3 and exceed
    BIGINT around n ~ 1.3-1.9M distinct customers — Spark's non-ANSI
    SUM(long) would wrap silently while DuckDB widens to HUGEINT.
    Within the fixture family n <= ~150k/SF-0.1-copy, 4 orders of
    magnitude of headroom at the 16x probe; past that, widen the
    rx2*rx2 / ry2*ry2 / rx2*ry2 products to DECIMAL(38,0) (Spark) /
    explicit HUGEINT (DuckDB) — the documented swap, same as
    q_agg_cov_matrix's n*Sxy widening.

    int64 bound (same convention as q_events_linreg_trend /
    q_agg_cov_matrix): the doubled midranks rx2/ry2 reach ~2n for n
    DISTINCT rank values, so sxx/syy grow ~4n^3 and overflow BIGINT
    near n ~ 1.3M distinct values — Spark's non-ANSI SUM(long) would
    wrap silently while DuckDB widens to HUGEINT, silently diverging.
    Here n_x is the handful of per-customer order counts and n_y is
    bounded by |customer| (150k at sf1 of this fixture), two orders of
    magnitude under the cliff. Documented swap past ~1M distinct
    values: cast rx2/ry2 to double BEFORE the moment products (the
    n*Sxy swap q_agg_cov_matrix documents) — exact up to 2^53 per
    term, with the final rho already double."""
    from .registry import global_midrank2

    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("y"),
    )
    dx = c.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    rx = global_midrank2(dx, "v").select(
        F.col("v").alias("x"), F.col("rank2").alias("rx2")
    )
    dy = c.groupBy(F.col("y").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ry = global_midrank2(dy, "v").select(
        F.col("v").alias("y"), F.col("rank2").alias("ry2")
    )
    j = c.join(rx, "x").join(ry, "y")
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    varx = nd * sxxd - sxd * sxd
    vary = nd * syyd - syd * syd
    rho = (nd * sxyd - sxd * syd) / F.sqrt(varx * vary)
    return m.filter((varx > 0) & (vary > 0)).select(
        "n", "sx", "sy", "sxx", "syy", "sxy",
        F.floor(rho * F.lit(1e6) + F.lit(0.5)).cast("long").alias("rho_e6"),
    )


K_ANON = 5  # minimum safe equivalence-class size


@register(
    "q_quality_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT lang, source,
             CAST(n_chars // 100 AS BIGINT) AS chars_bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang, source, chars_bucket, n,
           CAST(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk
    FROM g
    """,
)
def q_quality_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the corpus's quasi-identifiers: every
    (lang, source, length-bucket) equivalence class with its size, and
    a flag for classes smaller than K_ANON — the groups where a
    released record is re-identifiable by its metadata alone. The
    governance sibling of q_text_pii_redact: redaction scrubs content,
    this measures whether the METADATA shape itself leaks.

    Pure integer bucketing plus one map-side-combinable groupBy — the
    cheapest possible shape at any scale; the class-size histogram is
    the broadcastable output a suppression/generalization pass would
    consume next."""
    docs = load(spark, sf_dir, "documents")
    g = (
        docs.select(
            "lang",
            "source",
            F.expr("CAST(n_chars div 100 AS BIGINT)").alias("chars_bucket"),
        )
        .groupBy("lang", "source", "chars_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return g.select(
        "lang",
        "source",
        "chars_bucket",
        "n",
        F.when(F.col("n") < K_ANON, 1).otherwise(0).cast("long").alias("at_risk"),
    )


# --- Theil inequality index with between/within decomposition -------------


@register(
    "q_agg_theil_index",
    oracle="""
    WITH x AS (
      SELECT o.o_custkey AS c, n.n_name,
             SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS xc
      FROM orders o
      JOIN customer cu ON cu.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = cu.c_nationkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng, SUM(xc) AS sg
      FROM x GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, SUM(sg) AS s FROM g),
    within_terms AS (
      SELECT x.n_name,
             CAST(FLOOR(
               (CAST(xc AS DOUBLE) / CAST(sg AS DOUBLE))
               * LN(CAST(xc AS DOUBLE) * CAST(ng AS DOUBLE)
                    / CAST(sg AS DOUBLE))
               * 1e9 + 0.5) AS BIGINT) AS t_e9
      FROM x JOIN g ON g.n_name = x.n_name
    ),
    w AS (SELECT n_name, SUM(t_e9) AS within_e9 FROM within_terms GROUP BY 1)
    SELECT g.n_name AS nation, g.ng AS n_cust, g.sg AS sum_cents,
           w.within_e9,
           CAST(FLOOR(
             (CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
             * LN((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
                  / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE)))
             * 1e9 + 0.5) AS BIGINT) AS between_e9
    FROM g JOIN w ON w.n_name = g.n_name, tot
    """,
)
def q_agg_theil_index(spark, sf_dir):
    """Theil-T inequality index of customer revenue, decomposed by
    nation: T = T_between + sum_g share_g * T_within_g — the additive
    decomposition that answers "is revenue inequality BETWEEN markets
    or INSIDE them?", which Gini (q_utxo_balance_gini) cannot split.

    Exact-integer discipline end to end: revenues are BIGINT cents
    (per-row fixed-point before the customer sum), group and global
    totals are integer aggregates, and every logarithmic term is ONE
    identical double expression over those exact integers snapped to e9
    fixed point BEFORE its summation — so the per-nation within-sum is
    an order-proof BIGINT sum (emitted as the fixed-point SUM, never a
    re-rounded mean). ln() is not correctly rounded, but its 1-ulp
    noise (~1e-16) sits ~7 orders below the e9 granularity (the
    established dsir-log2 precedent, verified at three SFs). Scale
    shape: one map-side-combinable groupBy(customer), one equi-join to
    the customer dim (AQE decides the strategy — the dim GROWS with
    SF), a 25-row nation broadcast, and two scalar broadcasts."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    x = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("xc")
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "xc")
    )
    g = x.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("ng"), F.sum("xc").alias("sg")
    )
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"), F.sum("sg").alias("s")
    )
    xd, ngd = F.col("xc").cast("double"), F.col("ng").cast("double")
    sgd = F.col("sg").cast("double")
    t_e9 = F.floor(
        (xd / sgd) * F.log(xd * ngd / sgd) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    w = (
        x.join(F.broadcast(g), "n_name")
        .select("n_name", t_e9.alias("t_e9"))
        .groupBy("n_name")
        .agg(F.sum("t_e9").alias("within_e9"))
    )
    sd, nd = F.col("s").cast("double"), F.col("n").cast("double")
    between_e9 = F.floor(
        (sgd / sd) * F.log((sgd / sd) / (ngd / nd)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    return (
        g.join(w, "n_name")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_name").alias("nation"),
            F.col("ng").alias("n_cust"),
            F.col("sg").alias("sum_cents"),
            "within_e9",
            between_e9.alias("between_e9"),
        )
    )


# --- Winsorized / trimmed robust means ------------------------------------


@register(
    "q_agg_winsorized_mean",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p_e2
      FROM lineitem
    ),
    q AS (
      SELECT flag, quantile_disc(p_e2, 0.05) AS p05,
             quantile_disc(p_e2, 0.95) AS p95,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY 1
    )
    SELECT v.flag, q.n, q.p05 AS p05_e2, q.p95 AS p95_e2,
           CAST(SUM(LEAST(GREATEST(p_e2, p05), p95)) AS BIGINT)
             AS win_sum_e2,
           CAST(SUM(CASE WHEN p_e2 BETWEEN p05 AND p95 THEN p_e2 END)
                AS BIGINT) AS trim_sum_e2,
           CAST(SUM(CASE WHEN p_e2 BETWEEN p05 AND p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_trim
    FROM v JOIN q ON q.flag = v.flag
    GROUP BY 1, 2, 3, 4
    """,
)
def q_agg_winsorized_mean(spark, sf_dir):
    """Winsorized and trimmed robust location estimates per return
    flag: clamp (or drop) everything outside the exact [P5, P95]
    order-statistic band, then aggregate — the outlier-proof companion
    to q_agg_stats' raw means, emitted as fixed-point SUMS plus counts
    (the playbook rule: never hash a re-rounded mean when the exact
    numerator/denominator pair carries strictly more information).

    percentile_disc picks actual BIGINT elements (no interpolation;
    Spark returns DOUBLE, snapped straight back to the exact integer it
    chose), clamping is integer min/max, and both sums are exact BIGINT
    — zero floating point anywhere. Two map-side-combinable passes with
    a one-row-per-flag broadcast between them."""
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("p_e2"),
    )
    q = v.groupBy("flag").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY p_e2)")
        .cast("long")
        .alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY p_e2)")
        .cast("long")
        .alias("p95"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    j = v.join(F.broadcast(q), "flag")  # q: one row per flag
    inside = F.col("p_e2").between(F.col("p05"), F.col("p95"))
    return j.groupBy(
        "flag", "n", F.col("p05").alias("p05_e2"), F.col("p95").alias("p95_e2")
    ).agg(
        F.sum(F.least(F.greatest(F.col("p_e2"), F.col("p05")), F.col("p95")))
        .cast("long")
        .alias("win_sum_e2"),
        F.sum(F.when(inside, F.col("p_e2"))).cast("long").alias("trim_sum_e2"),
        F.sum(F.when(inside, 1).otherwise(0)).cast("long").alias("n_trim"),
    )


# --- Lorenz curve (decile concentration profile) ---------------------------


@register(
    "q_agg_lorenz_curve",
    oracle="""
    WITH x AS (
      SELECT o_custkey AS c,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS xc
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT c, xc, NTILE(10) OVER (ORDER BY xc, c) AS decile FROM x
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(xc) AS BIGINT) AS sum_cents
      FROM b GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_cust, sum_cents,
           -- HUGEINT widening: cum*1e6 overflows BIGINT at a 16x-replay
           -- corpus (the weak-scaling probe caught this live); DuckDB
           -- int128 // mirrors Spark's DECIMAL(38,0) div exactly
           CAST(CAST(SUM(sum_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
             * 1000000
             // (SELECT SUM(sum_cents) FROM d) AS BIGINT) AS cum_share_e6
    FROM d
    """,
)
def q_agg_lorenz_curve(spark, sf_dir):
    """Lorenz curve of customer revenue in ten points: rank customers
    by spend, cut into exact global deciles, and emit each decile's
    cumulative share of total revenue — the concentration profile whose
    area complement is the Gini (q_utxo_balance_gini gives the scalar;
    this gives the curve an analyst actually plots).

    The global decile cut uses registry.global_ntile — range partition
    + 32-row offset carry + closed-form NTILE bin, row-for-row equal to
    ANSI NTILE without any single-partition window over customers. The
    cumulative share then lives on the 10-row decile aggregate (integer
    cumsum over a pinned order, integer division by the exact total) —
    all BIGINT, no doubles anywhere."""
    from .registry import global_ntile

    o = load(spark, sf_dir, "orders")
    x = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("xc")
    )
    b = global_ntile(x, 10, ["xc", "c"], ntile_name="decile")
    d = b.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("xc").cast("long").alias("sum_cents"),
    )
    tot = d.agg(F.sum("sum_cents").alias("t"))
    return (
        d.crossJoin(F.broadcast(tot))  # 1-row total attach onto 10 rows
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_cust",
            "sum_cents",
            # DECIMAL(38,0) widening: BIGINT cum * 1e6 overflows at a
            # 16x-replay corpus (probe-caught); decimal128 div is exact
            F.expr(
                "cast(cast(sum(sum_cents) over (order by decile rows"
                " between unbounded preceding and current row)"
                " as decimal(38,0)) * 1000000 div t as bigint)"
            ).alias("cum_share_e6"),
        )
    )


# --- Pairwise covariance / correlation matrix -------------------------------

_COV_VARS = [
    ("qty", "CAST(l_quantity AS BIGINT)"),
    ("price", "CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)"),
    ("disc", "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"),
    ("tax", "CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)"),
]
_COV_PAIRS = [
    (a, b)
    for i, (a, _) in enumerate(_COV_VARS)
    for b, _ in [p for p in _COV_VARS[i:]]
]


def _cov_matrix_oracle() -> str:
    """Generated oracle: BIGINT moment sums for all 10 variable pairs,
    then the covariance/correlation closed forms in double. The moment
    products n*Sxy exceed int64 at replay scale, so the CLOSED FORMS
    cast every moment to double first (the spearman precedent:
    int64->double is correctly rounded and engine-identical)."""
    fix = ", ".join(f"{expr} AS {n}" for n, expr in _COV_VARS)
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"] + [
        f"SUM({n}) AS s_{n}" for n, _ in _COV_VARS
    ] + [f"SUM({a} * {b}) AS s_{a}_{b}" for a, b in _COV_PAIRS]
    outs = []
    for a, b in _COV_PAIRS:
        num = (
            f"(CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        if a == b:
            outs.append(
                f"CAST(FLOOR({num} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
                f" * 1e4 + 0.5) AS BIGINT) AS var_{a}_e4"
            )
        else:
            va = (
                f"(CAST(n AS DOUBLE) * CAST(s_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            )
            vb = (
                f"(CAST(n AS DOUBLE) * CAST(s_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            outs.append(
                f"CAST(FLOOR({num} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
                f" * 1e4 + 0.5) AS BIGINT) AS cov_{a}_{b}_e4"
            )
            outs.append(
                f"CAST(FLOOR({num} / SQRT({va} * {vb}) * 1e6 + 0.5)"
                f" AS BIGINT) AS corr_{a}_{b}_e6"
            )
    guards = " AND ".join(
        f"CAST(n AS DOUBLE) * CAST(s_{a}_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE) > 0"
        for a, _ in _COV_VARS
    )
    return f"""
    WITH v AS (SELECT l_returnflag AS flag, {fix} FROM lineitem),
    m AS (SELECT flag, {', '.join(sums)} FROM v GROUP BY 1)
    SELECT flag, n, {', '.join(outs)}
    FROM m WHERE {guards}
    """


@register("q_agg_cov_matrix", oracle=_cov_matrix_oracle())
def q_agg_cov_matrix(spark, sf_dir):
    """Full pairwise covariance + correlation matrix of four lineitem
    measures per return flag — the multivariate generalization of
    q_agg_corr_covar, computed the only way that scales: ONE pass of
    BIGINT moment sums (map-side combinable, 15 sums per group), then
    every cov/corr as a closed form over those moments. No per-pair
    passes, no centering pass — adding a variable costs O(k) more sums,
    never another scan.

    Determinism discipline (spearman precedent): per-row values are
    fixed-pointed to BIGINT, the 15 moment sums are exact integers
    (bounded: price^2 sums reach ~1e17 at 16x replay, inside int64),
    and the n*Sxy products — which WOULD overflow int64 — are computed
    in double from correctly-rounded int64->double casts, the identical
    expression tree on both engines; zero-variance groups filtered
    identically. Both matrices emit fixed-point (e4 cov, e6 corr)."""
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        *[F.expr(expr).alias(n) for n, expr in _COV_VARS],
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.sum(n).alias(f"s_{n}") for n, _ in _COV_VARS]
    aggs += [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}") for a, b in _COV_PAIRS
    ]
    m = v.groupBy("flag").agg(*aggs)

    def d(c):
        return F.col(c).cast("double")

    nd = d("n")
    outs = []
    guard = None
    for a, b in _COV_PAIRS:
        num = nd * d(f"s_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
        if a == b:
            outs.append(
                F.floor(num / (nd * nd) * F.lit(1e4) + F.lit(0.5))
                .cast("long")
                .alias(f"var_{a}_e4")
            )
            g = nd * d(f"s_{a}_{a}") - d(f"s_{a}") * d(f"s_{a}") > 0
            guard = g if guard is None else (guard & g)
        else:
            va = nd * d(f"s_{a}_{a}") - d(f"s_{a}") * d(f"s_{a}")
            vb = nd * d(f"s_{b}_{b}") - d(f"s_{b}") * d(f"s_{b}")
            outs.append(
                F.floor(num / (nd * nd) * F.lit(1e4) + F.lit(0.5))
                .cast("long")
                .alias(f"cov_{a}_{b}_e4")
            )
            outs.append(
                F.floor(num / F.sqrt(va * vb) * F.lit(1e6) + F.lit(0.5))
                .cast("long")
                .alias(f"corr_{a}_{b}_e6")
            )
    return m.filter(guard).select("flag", "n", *outs)


# --- One-way ANOVA F over order priorities --------------------------------


@register(
    "q_agg_anova_f",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS s_g,
             CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                      * CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
               AS ss_g
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g
    ),
    terms AS (
      SELECT CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE) + 0.5) AS BIGINT) AS tg,
             CAST(FLOOR((CAST(ss_g AS DOUBLE)
                         - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                           / CAST(n_g AS DOUBLE)) + 0.5) AS BIGINT)
               AS wg
      FROM g
    ),
    m AS (
      SELECT t.n, t.s, t.k,
             CAST(SUM(tg) AS BIGINT)
               - CAST(FLOOR(CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                            / CAST(t.n AS DOUBLE) + 0.5) AS BIGINT)
               AS ssb,
             CAST(SUM(wg) AS BIGINT) AS ssw
      FROM terms, tot t GROUP BY t.n, t.s, t.k
    )
    SELECT n, k, ssb, ssw,
           CAST(FLOOR(CAST(ssb AS DOUBLE) * CAST(n - k AS DOUBLE)
                      / (CAST(ssw AS DOUBLE) * CAST(k - 1 AS DOUBLE))
                      * 1e6 + 0.5) AS BIGINT) AS f_e6
    FROM m WHERE ssw > 0 AND k > 1
    """,
)
def q_agg_anova_f(spark, sf_dir):
    """One-way ANOVA F statistic across order-priority groups on whole-
    dollar order totals — the k-group generalization completing the
    inference family (Welch compares two means, this compares k at
    once; its rank twin is q_agg_kruskal_wallis below).

    Determinism contract (the Welch/OLS recipe): per-group moments
    (n_g, S_g, SS_g) are exact BIGINTs from one map-side-combinable
    aggregation; the per-group between/within contributions are each
    ONE identical double expression over those BIGINTs snapped to
    INTEGER squared-dollars BEFORE the cross-group sum (order-free
    BIGINT reduction, never a float AVG — and deliberately e0, not e4:
    S_g^2/n_g is ~2e18 at this fixture's dollar scale, so an e4 term
    sum would overflow int64 at sf0.01 already), and F is one final
    e6-snapped tree over the integer sums. Zero within-variance is
    filtered identically on both sides.

    int64 bound: SS_g sums x^2 with x = floor(o_totalprice) <= ~6e5,
    so SS_g < 9.2e18 through ~25M orders per group (sf ~ 100 of this
    fixture); past that, widen the x*x product to DECIMAL(38,0) /
    HUGEINT (the q_agg_cov_matrix swap). At 100 TB: one scan, a 5-row
    group relation, a 1-row broadcast — nothing scales with n after
    the first aggregate."""
    o = load(spark, sf_dir, "orders")
    x = F.floor("o_totalprice").cast("long")
    g = o.select(F.col("o_orderpriority").alias("grp"), x.alias("x"))
    per = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").alias("s_g"),
        F.sum(F.col("x") * F.col("x")).alias("ss_g"),
    )
    tot = per.agg(
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )

    def d(c):
        return F.col(c).cast("double")

    j = per.crossJoin(F.broadcast(tot))
    tg = F.floor(d("s_g") * d("s_g") / d("n_g") + F.lit(0.5)).cast("long")
    wg = F.floor(
        d("ss_g") - d("s_g") * d("s_g") / d("n_g") + F.lit(0.5)
    ).cast("long")
    m = j.groupBy("n", "s", "k").agg(
        (
            F.sum(tg)
            - F.floor(d("s") * d("s") / d("n") + F.lit(0.5)).cast("long")
        ).alias("ssb"),
        F.sum(wg).alias("ssw"),
    )
    f = (
        F.col("ssb").cast("double")
        * (F.col("n") - F.col("k")).cast("double")
        / (F.col("ssw").cast("double") * (F.col("k") - 1).cast("double"))
    )
    return m.filter((F.col("ssw") > 0) & (F.col("k") > 1)).select(
        "n", "k", "ssb", "ssw",
        F.floor(f * F.lit(1e6) + F.lit(0.5)).cast("long").alias("f_e6"),
    )


# --- Kruskal-Wallis H across order priorities -----------------------------


@register(
    "q_agg_kruskal_wallis",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS x
      FROM orders
    ),
    dx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
    rx AS (
      SELECT x, cnt,
             2 * (SUM(cnt) OVER (ORDER BY x) - cnt) + cnt + 1 AS rank2
      FROM dx
    ),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM dx),
    tot AS (
      SELECT nn.n,
             CAST(SUM(CAST(FLOOR((CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)
                                  * CAST(cnt AS DOUBLE) - CAST(cnt AS DOUBLE))
                                 / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                                    * CAST(nn.n AS DOUBLE)
                                    - CAST(nn.n AS DOUBLE))
                                 * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS t_e12
      FROM dx, nn GROUP BY nn.n
    ),
    g AS (
      SELECT v.grp,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(rx.rank2) AS BIGINT) AS r2_sum
      FROM v JOIN rx ON rx.x = v.x
      GROUP BY v.grp
    ),
    terms AS (
      SELECT grp, n_g, r2_sum,
             CAST(FLOOR(CAST(r2_sum AS DOUBLE) * CAST(r2_sum AS DOUBLE)
                        / (4.0 * CAST(n_g AS DOUBLE) * CAST(t.n AS DOUBLE)
                           * CAST(t.n + 1 AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT) AS tg_e6,
             t.n, t.t_e12
      FROM g, tot t
    ),
    h AS (
      SELECT n, t_e12,
             CAST(SUM(tg_e6) AS BIGINT) AS sum_tg_e6
      FROM terms GROUP BY n, t_e12
    )
    SELECT t.grp, t.n_g, t.r2_sum,
           CAST(FLOOR((12.0 * CAST(h.sum_tg_e6 AS DOUBLE) / 1e6
                       - 3.0 * CAST(h.n + 1 AS DOUBLE))
                      / (1.0 - CAST(h.t_e12 AS DOUBLE) / 1e12)
                      * 1e6 + 0.5) AS BIGINT) AS h_e6
    FROM terms t, h
    WHERE h.t_e12 < CAST(1000000000000 AS BIGINT)
    """,
)
def q_agg_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H (rank one-way ANOVA) across order priorities on
    whole-dollar order totals, with the exact tie correction — the
    k-group extension of q_events_mannwhitney_u and the rank twin of
    q_agg_anova_f, robust to the heavy right tail rank-free F inherits.

    Rank machinery is ``global_midrank2`` (registry.py): doubled
    midranks over the DISTINCT-value relation stay exact BIGINTs, so
    each group's rank mass R2_g is an order-free integer sum. The
    per-group H contribution R2_g^2/(4 n_g n (n+1)) is bounded by
    n_g, so its e6 fixed point sums safely; the tie term
    sum(t^3-t)/(n^3-n) is e12-fixed per DISTINCT value (the whole sum
    is bounded by 1e12 by construction) and the all-tied degenerate
    corpus (correction = 0) is filtered identically on both engines.
    Cubes and squares are evaluated in the shared double tree, never
    as BIGINT products (t^3 overflows int64 past ~2M-row tie groups).

    At 100 TB: two distinct-relation range exchanges (midranks), one
    rank join whose heavy keys are the tie groups (AQE skew shape),
    one 5-row group relation, two 1-row broadcasts."""
    from .registry import global_midrank2

    o = load(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor("o_totalprice").cast("long").alias("x"),
    )
    dx = v.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    rx = global_midrank2(dx, "x").select("x", "cnt", "rank2")

    def d(c):
        return F.col(c).cast("double")

    cd = d("cnt")
    n1 = dx.agg(F.sum("cnt").alias("n"))
    nd = F.col("n").cast("double")
    tot = (
        dx.crossJoin(F.broadcast(n1))
        .select(
            "n",
            F.floor(
                (cd * cd * cd - cd) / (nd * nd * nd - nd) * 1e12 + F.lit(0.5)
            ).cast("long").alias("tie_e12"),
        )
        .groupBy("n")
        .agg(F.sum("tie_e12").alias("t_e12"))
    )
    g = (
        v.join(rx.withColumnRenamed("cnt", "__c"), "x")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("rank2").alias("r2_sum"),
        )
        .crossJoin(F.broadcast(tot))
    )
    tg_e6 = F.floor(
        d("r2_sum") * d("r2_sum")
        / (F.lit(4.0) * d("n_g") * d("n") * (F.col("n") + 1).cast("double"))
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    h = g.groupBy("n", "t_e12").agg(F.sum(tg_e6).alias("sum_tg_e6"))
    hexpr = (
        (
            F.lit(12.0) * F.col("sum_tg_e6").cast("double") / F.lit(1e6)
            - F.lit(3.0) * (F.col("n") + 1).cast("double")
        )
        / (F.lit(1.0) - F.col("t_e12").cast("double") / F.lit(1e12))
    )
    return (
        g.join(F.broadcast(h.filter(F.col("t_e12") < F.lit(10**12))), ["n", "t_e12"])
        .select(
            "grp",
            "n_g",
            "r2_sum",
            F.floor(hexpr * F.lit(1e6) + F.lit(0.5)).cast("long").alias("h_e6"),
        )
    )


# --- Mutual information + Cramér's V between lang and source --------------


@register(
    "q_agg_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nij
      FROM documents GROUP BY 1, 2
    ),
    langs AS (SELECT lang, CAST(SUM(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
    srcs AS (SELECT source, CAST(SUM(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(nij) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS c
      FROM cells
    ),
    grid AS (
      SELECT l.lang, s.source, l.ni, s.nj,
             COALESCE(cl.nij, 0) AS nij
      FROM langs l CROSS JOIN srcs s
      LEFT JOIN cells cl ON cl.lang = l.lang AND cl.source = s.source
    ),
    terms AS (
      SELECT CASE WHEN nij > 0 THEN
               CAST(FLOOR(CAST(nij AS DOUBLE) / CAST(t.n AS DOUBLE)
                          * LOG2(CAST(t.n AS DOUBLE) * CAST(nij AS DOUBLE)
                                 / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
                          * 1e9 + 0.5) AS BIGINT)
             ELSE 0 END AS mi_t,
             CAST(FLOOR(
               (CAST(nij AS DOUBLE)
                - CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))
               * (CAST(nij AS DOUBLE)
                  - CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))
               / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE) / CAST(t.n AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT) AS chi_t
      FROM grid, tot t
    )
    SELECT t.n, t.r, t.c,
           CAST(SUM(mi_t) AS BIGINT) AS mi_e9,
           CAST(SUM(chi_t) AS BIGINT) AS chi2_e6,
           CAST(FLOOR(SQRT(CAST(SUM(chi_t) AS DOUBLE) / 1e6
                           / (CAST(t.n AS DOUBLE)
                              * CAST(LEAST(t.r, t.c) - 1 AS DOUBLE)))
                      * 1e6 + 0.5) AS BIGINT) AS cramers_v_e6
    FROM terms, tot t
    WHERE t.r > 1 AND t.c > 1
    GROUP BY t.n, t.r, t.c
    """,
)
def q_agg_mutual_info(spark, sf_dir):
    """Column-level dependence panel between the corpus's two categorical
    metadata axes (lang, source): mutual information in bits, the
    chi-square statistic over the FULL r x c grid (absent combinations
    contribute their expected-count mass — an inner groupBy alone would
    understate chi-square), and Cramér's V normalizing chi-square to
    [0,1]. The token-level sibling q_text_pmi_pairs scores word pairs;
    this scores the metadata schema itself — the check run before
    stratifying on one axis and assuming the other stays balanced.

    Determinism: cell/margin counts are exact BIGINTs; each cell's MI
    term (e9) and chi term (e6) is one identical double tree over them
    fixed-pointed BEFORE the cross-cell sum; V is a final tree over the
    BIGINT sums (IEEE sqrt correctly rounded, LOG2 1-ulp noise below
    fixed-point granularity per the dsir precedent). Degenerate 1-row/
    1-column grids are filtered identically on both engines.

    At 100 TB: one map-side-combinable scan to the cell relation
    (|langs| x |sources| rows), then everything runs on broadcastable
    aggregates — the grid cross join is r x c, never data-sized."""
    docs = load(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    langs = cells.groupBy("lang").agg(F.sum("nij").alias("ni"))
    srcs = cells.groupBy("source").agg(F.sum("nij").alias("nj"))
    tot = cells.agg(
        F.sum("nij").alias("n"),
        F.countDistinct("lang").cast("long").alias("r"),
        F.countDistinct("source").cast("long").alias("c"),
    )
    grid = (
        langs.crossJoin(srcs)
        .join(cells, ["lang", "source"], "left")
        .withColumn("nij", F.coalesce(F.col("nij"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )

    def d(c):
        return F.col(c).cast("double")

    e = d("ni") * d("nj") / d("n")
    mi_t = F.when(
        F.col("nij") > 0,
        F.floor(
            d("nij") / d("n") * F.log2(d("n") * d("nij") / (d("ni") * d("nj")))
            * 1e9
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    chi_t = F.floor(
        (d("nij") - e) * (d("nij") - e) / e * 1e6 + F.lit(0.5)
    ).cast("long")
    m = grid.groupBy("n", "r", "c").agg(
        F.sum(mi_t).alias("mi_e9"), F.sum(chi_t).alias("chi2_e6")
    )
    v = F.sqrt(
        F.col("chi2_e6").cast("double")
        / F.lit(1e6)
        / (d("n") * (F.least(F.col("r"), F.col("c")) - 1).cast("double"))
    )
    return m.filter((F.col("r") > 1) & (F.col("c") > 1)).select(
        "n", "r", "c", "mi_e9", "chi2_e6",
        F.floor(v * F.lit(1e6) + F.lit(0.5)).cast("long").alias("cramers_v_e6"),
    )


# --- Association rules (confidence / lift) over co-ordered parts ----------


@register(
    "q_basket_rules",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
          FROM b),
    item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp FROM b GROUP BY 1
    ),
    pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS nab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    rules AS (
      SELECT part_a AS antecedent, part_b AS consequent, nab,
             ia.supp AS supp_a, ib.supp AS supp_b, n.n_baskets
      FROM pair JOIN item ia ON ia.l_partkey = pair.part_a
                JOIN item ib ON ib.l_partkey = pair.part_b, n
      UNION ALL
      SELECT part_b, part_a, nab, ib.supp, ia.supp, n.n_baskets
      FROM pair JOIN item ia ON ia.l_partkey = pair.part_a
                JOIN item ib ON ib.l_partkey = pair.part_b, n
    )
    SELECT antecedent, consequent, nab AS support,
           CAST((1000000 * nab) // supp_a AS BIGINT) AS confidence_e6,
           CAST((1000000 * n_baskets * nab) // (supp_a * supp_b) AS BIGINT)
             AS lift_e6
    FROM rules
    """,
)
def q_basket_rules(spark, sf_dir):
    """Association rules over co-ordered parts — the scoring step above
    q_basket_pair_counts (the counting core): every surviving pair
    emitted in both directions with support, confidence(A=>B) =
    supp(AB)/supp(A) and the symmetric lift n*supp(AB)/(supp(A)*
    supp(B)). lift > 1e6 (fixed-point 1.0) marks genuinely associated
    parts; high-confidence low-lift rules are just popular consequents
    — the classic apriori read-out.

    Pure-integer op: supports are exact BIGINT counts and both scores
    are integer division of BIGINT products (n*nab ~ 1e14 at sf1,
    orders inside int64 — documented bound, DECIMAL swap past ~1e5
    baskets per pair). Pair fan-out is basket-size-bounded exactly as
    q_basket_pair_counts documents; the item-support joins are
    aggregate-level."""
    li = load(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    nb = b.agg(F.countDistinct("l_orderkey").cast("long").alias("n_baskets"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("supp"))
    a = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    c = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pair = (
        a.join(c, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("nab"))
        .filter(F.col("nab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b"))
    base = (
        pair.join(ia, "part_a").join(ib, "part_b").crossJoin(F.broadcast(nb))
    )
    fwd = base.select(
        F.col("part_a").alias("antecedent"), F.col("part_b").alias("consequent"),
        "nab", F.col("supp_a").alias("sa"), F.col("supp_b").alias("sb"),
        "n_baskets",
    )
    rev = base.select(
        F.col("part_b").alias("antecedent"), F.col("part_a").alias("consequent"),
        "nab", F.col("supp_b").alias("sa"), F.col("supp_a").alias("sb"),
        "n_baskets",
    )
    return fwd.unionByName(rev).select(
        "antecedent", "consequent", F.col("nab").alias("support"),
        F.expr("(1000000 * nab) div sa").cast("long").alias("confidence_e6"),
        F.expr("(1000000 * n_baskets * nab) div (sa * sb)")
        .cast("long").alias("lift_e6"),
    )


# --- two-sample distribution tests ----------------------------------------


@register(
    "q_agg_ks_test",
    oracle="""
    WITH val AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
      FROM val
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM val
    )
    SELECT t.n1, t.n2,
           CAST(MAX(ABS(c.cum1 * t.n2 - c.cum2 * t.n1)) AS BIGINT) AS d_num,
           CAST(MAX(ABS(c.cum1 * t.n2 - c.cum2 * t.n1)) * 1000000
                // (t.n1 * t.n2) AS BIGINT) AS d_e6
    FROM cum c, tot t
    GROUP BY t.n1, t.n2
    """,
)
def q_agg_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the order-value
    distributions of fulfilled ('F') and open/pending orders — the
    distribution-shift detector a data pipeline runs between corpus
    snapshots (here: does order value shift once orders complete?).

    D = max_x |F1(x) - F2(x)| computed EXACTLY in integers: one
    map-side-combinable aggregate onto the DISTINCT-cents relation, the
    two-pass distributed prefix sum (``global_cumsum``: range partition
    + 32-row offset carry — no corpus-sized single-partition window),
    then max |cum1*n2 - cum2*n1| — a common-denominator comparison with
    no division until the final e6 snap (integer div, positive
    operands). Int64 bound: cum*n <= n1*n2 ~ 5.8e12 at the 16x probe
    and the e6 product stays under 2^63 through ~64x; past that, widen
    the cross products to DECIMAL(38,0)/HUGEINT (the documented swap).
    At 100 TB: the distinct-value relation is the only shuffled
    intermediate, and the KS scan is linear in it."""
    from .registry import global_cumsum

    o = load(spark, sf_dir, "orders")
    val = o.groupBy(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v")
    ).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = global_cumsum(val, "v", ["c1", "c2"])
    tot = val.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))  # 1-row totals attach
        .select(
            "n1",
            "n2",
            F.abs(
                F.col("cum_c1") * F.col("n2") - F.col("cum_c2") * F.col("n1")
            ).alias("gap"),
        )
        .groupBy("n1", "n2")
        .agg(F.max("gap").alias("d_num"))
    )
    return d.select(
        "n1",
        "n2",
        F.col("d_num").cast("long").alias("d_num"),
        F.expr("(d_num * 1000000) div (n1 * n2)").cast("long").alias("d_e6"),
    )


PERM_R = 64  # sign-randomization replicas
_PERM_M32 = 1 << 32


@register(
    "q_agg_permutation_test",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM c
    ),
    obs AS (
      SELECT CAST(-1 AS BIGINT) AS perm_id,
             CAST(ABS(SUM((CASE WHEN c.o_custkey % 2 = 0 THEN 1 ELSE -1 END)
                          * (t.n * c.x - t.s))) AS BIGINT) AS t_abs
      FROM c, tot t GROUP BY ALL
    ),
    reps AS (
      SELECT c.o_custkey, c.x, t.n, t.s, r.r,
             ((c.o_custkey + r.r * 1000003) % {_PERM_M32}) AS k0
      FROM c, tot t, (SELECT UNNEST(range(0, {PERM_R})) AS r) r
    ),
    mix1 AS (SELECT *, (k0 * 1540483477) % {_PERM_M32} AS h1 FROM reps),
    mix2 AS (SELECT *, (xor(h1, h1 // 32768) * 889871637) % {_PERM_M32} AS h2
             FROM mix1),
    signed AS (
      SELECT r, CAST(ABS(SUM((xor(h2, h2 // 8192) % 2 * 2 - 1)
                             * (n * x - s))) AS BIGINT) AS t_abs
      FROM mix2 GROUP BY r
    )
    SELECT perm_id, t_abs FROM obs
    UNION ALL
    SELECT CAST(r AS BIGINT) AS perm_id, t_abs FROM signed
    """,
)
def q_agg_permutation_test(spark, sf_dir):
    """Sign-randomization (Fisher-style permutation) test for whether
    even- and odd-keyed customers draw the same order-count
    distribution — the exchangeability check a pipeline runs to
    validate that a hash-based split didn't correlate with behavior.
    The null is true by construction here, so observed |T| should sit
    inside the replica distribution; the constructed-case test plants a
    real effect and watches it escape.

    Statistic: T = |sum_i s_i * (n*x_i - S)| over per-customer order
    counts — scaled centering (n*x - S) keeps everything in EXACT
    BIGINTs (no mean division), and s_i is +/-1 from the library's
    xorshift-multiply integer mix (multipliers < 2^31, engine-identical
    arithmetic, the q_agg_bootstrap_ci idiom — md5-per-draw measured
    40x slower there). perm_id -1 carries the OBSERVED parity labels;
    rows 0..{PERM_R}-1 are the sign replicas. p-value = rank of the
    observed row among replicas, left to the consumer (the constructed
    test computes it). Int64 bound: |T| <= n^2 * max_x ~ 3e14 at the
    16x probe; the documented swap past ~1e9 customers is widening
    (n*x - S) to DECIMAL(38,0)/HUGEINT.

    Plan shape: one groupBy onto the customer relation, a {PERM_R}-way
    replica explode of that ALREADY-AGGREGATED relation (map-side
    generated, never the raw corpus), one hash aggregate per replica —
    all map-side combinable."""
    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    tot = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    ct = c.crossJoin(F.broadcast(tot))  # 1-row totals attach
    centered = F.col("n") * F.col("x") - F.col("s")
    obs = ct.select(
        (F.when(F.col("o_custkey") % 2 == 0, 1).otherwise(-1) * centered)
        .alias("term")
    ).agg(
        F.lit(-1).cast("long").alias("perm_id"),
        F.abs(F.sum("term")).cast("long").alias("t_abs"),
    )
    reps = ct.select(
        "o_custkey",
        "x",
        "n",
        "s",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_R - 1))).alias("r"),
    )
    k0 = (F.col("o_custkey") + F.col("r") * 1000003) % _PERM_M32
    h1 = (k0 * 1540483477) % _PERM_M32
    h2 = (
        F.expr(f"(cast(h1 as bigint) ^ (h1 div 32768)) * 889871637"
               f" % {_PERM_M32}")
    )
    signed = (
        reps.withColumn("h1", h1)
        .withColumn("h2", h2)
        .withColumn(
            "sgn", F.expr("(cast(h2 as bigint) ^ (h2 div 8192)) % 2 * 2 - 1")
        )
        .groupBy("r")
        .agg(
            F.abs(
                F.sum(F.col("sgn") * (F.col("n") * F.col("x") - F.col("s")))
            )
            .cast("long")
            .alias("t_abs")
        )
        .select(F.col("r").cast("long").alias("perm_id"), "t_abs")
    )
    return obs.unionByName(signed)


# --- chi-squared independence + Cramér's V --------------------------------

@register(
    "q_agg_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS rf, o_orderpriority AS sm,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    rmarg AS (SELECT rf, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY rf),
    cmarg AS (SELECT sm, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY sm),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT rf) AS BIGINT) AS r_levels,
                   CAST(COUNT(DISTINCT sm) AS BIGINT) AS c_levels
            FROM cells),
    terms AS (
      -- chi2 = sum O^2*N/(R*C) - N; each term snapped to e6 fixed point
      -- BEFORE the sum so the 21-cell summation order cannot flip the
      -- hash (identical double expression tree both engines)
      SELECT CAST(FLOOR(CAST(c.o AS DOUBLE) * c.o / r.rt / m.ct
                        * t.n * 1e6 + 0.5) AS BIGINT) AS term_e6
      FROM cells c
      JOIN rmarg r ON r.rf = c.rf
      JOIN cmarg m ON m.sm = c.sm
      CROSS JOIN tot t
    )
    SELECT t.n, t.r_levels, t.c_levels,
           (t.r_levels - 1) * (t.c_levels - 1) AS dof,
           CAST(s.chi2_e6 AS BIGINT) AS chi2_e6,
           -- GREATEST clamp: per-cell half-up rounding (21 cells, up to
           -- ~0.5 each) can push a near-independent table's chi2_e6
           -- slightly negative; sqrt of that would NaN on one engine
           -- and error on the other.
           CAST(FLOOR(SQRT((CAST(GREATEST(s.chi2_e6, 0) AS DOUBLE) / 1e6)
                           / (t.n * LEAST(t.r_levels - 1, t.c_levels - 1)))
                      * 1e6 + 0.5) AS BIGINT) AS cramers_v_e6
    FROM tot t CROSS JOIN
         (SELECT CAST(SUM(term_e6) AS BIGINT)
                 - (SELECT n FROM tot) * 1000000 AS chi2_e6
          FROM terms) s
    """,
)
def q_agg_chi2_independence(spark, sf_dir):
    """Pearson chi-squared test of independence between two categorical
    columns (order status x order priority) plus Cramér's V effect size — the
    drift/association check a pipeline runs between a label and a
    grouping dimension before trusting a stratified split.

    Exactness recipe: observed/margin/total counts are exact BIGINTs;
    chi2 uses the algebraic identity sum((O-E)^2/E) = sum(O^2*N/(R*C))
    - N so no intermediate subtraction of floats, and each cell term is
    snapped to e6 fixed point BEFORE the sum (the summation-order rule)
    with one identical double expression tree per engine. Cramér's V =
    sqrt(chi2 / (N * min(r-1, c-1))) is a single correctly-rounded sqrt
    over already-identical integers. Plan: one map-side-combinable
    groupBy over the fact table, two 3/7-row margin aggregates joined
    back broadcast-size, a 21-row term relation, one scalar fold —
    nothing here grows beyond the category domain at any corpus size.
    O^2*N stays inside the double's 53-bit mantissa for any single
    cell under ~94M rows at these domains; past that, widen the term to
    DECIMAL(38,6) (the q_text cum-product precedent)."""
    li = load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("rf"), F.col("o_orderpriority").alias("sm")
    )
    cells = li.groupBy("rf", "sm").agg(F.count(F.lit(1)).alias("o"))
    rmarg = cells.groupBy("rf").agg(F.sum("o").alias("rt"))
    cmarg = cells.groupBy("sm").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("rf").alias("r_levels"),
        F.countDistinct("sm").alias("c_levels"),
    )
    terms = (
        cells.join(F.broadcast(rmarg), "rf")
        .join(F.broadcast(cmarg), "sm")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                F.col("o").cast("double") * F.col("o") / F.col("rt")
                / F.col("ct") * F.col("n") * F.lit(1e6) + F.lit(0.5)
            ).cast("long").alias("term_e6"),
            "n",
        )
    )
    s = terms.groupBy("n").agg(
        (F.sum("term_e6") - F.col("n") * F.lit(1000000)).alias("chi2_e6")
    )
    k = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    return (
        tot.join(F.broadcast(s), "n")
        .select(
            "n",
            "r_levels",
            "c_levels",
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("dof"),
            F.col("chi2_e6").cast("long").alias("chi2_e6"),
            F.floor(
                # clamp: rounding noise can make chi2_e6 slightly negative
                # on a near-independent table; never feed sqrt a negative
                F.sqrt(
                    (F.greatest(F.col("chi2_e6"), F.lit(0)).cast("double")
                     / F.lit(1e6))
                    / (F.col("n") * k)
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("cramers_v_e6"),
        )
    )


# --- Hilbert-curve clustering key (the locality upgrade of Z-order) ----------


def _hilbert_stage_exprs() -> "tuple[list[str], list[str]]":
    """Per-level (x, y, d) update expressions for the 8-bit Hilbert
    xy2d walk (the standard iterative algorithm: quadrant digit, then
    the conditional flip+swap rotation with n-1 = 255), for Spark SQL
    and DuckDB. One staged SELECT per level keeps the expression tree
    linear — inlining all 8 levels would square x/y references per
    level."""
    spark_stages, duck_stages = [], []
    for k in range(7, -1, -1):
        s = 1 << k
        for terms, rx, ry, xor in (
            (spark_stages, f"(shiftright(x, {k}) & 1)",
             f"(shiftright(y, {k}) & 1)", "({a} ^ {b})"),
            (duck_stages, f"((x >> {k}) & 1)", f"((y >> {k}) & 1)",
             "xor({a}, {b})"),
        ):
            xr = xor.format(a=f"(3 * {rx})", b=ry)
            terms.append(
                (
                    f"d + {s * s} * {xr} AS d",
                    f"CASE WHEN {ry} = 0 THEN"
                    f" (CASE WHEN {rx} = 1 THEN 255 - y ELSE y END)"
                    f" ELSE x END AS x",
                    f"CASE WHEN {ry} = 0 THEN"
                    f" (CASE WHEN {rx} = 1 THEN 255 - x ELSE x END)"
                    f" ELSE y END AS y",
                )
            )
    return spark_stages, duck_stages


_H_SPARK_STAGES, _H_DUCK_STAGES = _hilbert_stage_exprs()


def _hilbert_oracle() -> str:
    ctes = [
        """h0 AS (
      SELECT o_orderkey,
             CAST(o_custkey % 256 AS BIGINT) AS xd,
             CAST(datediff('day', DATE '1970-01-01', o_orderdate) % 256
                  AS BIGINT) AS yd,
             CAST(o_custkey % 256 AS BIGINT) AS x,
             CAST(datediff('day', DATE '1970-01-01', o_orderdate) % 256
                  AS BIGINT) AS y,
             CAST(0 AS BIGINT) AS d
      FROM orders
    )"""
    ]
    for i, (de, xe, ye) in enumerate(_H_DUCK_STAGES, start=1):
        ctes.append(
            f"""h{i} AS (
      SELECT o_orderkey, xd, yd, {xe}, {ye}, {de} FROM h{i - 1}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT d // 1024 AS h_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(xd) - MIN(xd) AS BIGINT) AS cust_spread,
           CAST(MAX(yd) - MIN(yd) AS BIGINT) AS day_spread
    FROM h{len(_H_DUCK_STAGES)}
    GROUP BY 1"""
    )


@register("q_hilbert_key", oracle=_hilbert_oracle())
def q_hilbert_key(spark, sf_dir):
    """Hilbert-curve clustering key — the locality UPGRADE of
    q_zorder_key's Morton interleave: the Hilbert walk visits every
    (custkey mod 256, order-day mod 256) cell exactly once with
    UNIT-STEP moves (no Morton 'seams' where consecutive keys jump
    across the plane), so equal-width key ranges cover tighter
    rectangles and min/max page stats prune better on BOTH dimensions.
    Same deployment mechanics as Z-order: compute the key, then
    repartitionByRange(hkey).sortWithinPartitions(hkey) before the
    parquet sink. Emitted: the per-1024-key-bucket spread audit,
    directly comparable against q_zorder_key's buckets.

    The key is the standard iterative xy2d walk (8 levels for 8-bit
    dims: quadrant digit d += s^2 * ((3*rx) XOR ry), then the
    conditional flip-and-swap rotation), unrolled as 8 staged
    projections of pure integer bit arithmetic — one whole-stage-
    codegen pipeline, no shuffle before the final bucket aggregate, no
    UDF. Bijectivity over the full 256x256 grid and unit-step locality
    of consecutive keys are pinned by tests against the textbook
    recursive form."""
    o = load(spark, sf_dir, "orders")
    cur = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("xd"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            % 256
        ).alias("yd"),
    ).select(
        "o_orderkey", "xd", "yd",
        F.col("xd").alias("x"), F.col("yd").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    for de, xe, ye in _H_SPARK_STAGES:
        cur = cur.select(
            "o_orderkey", "xd", "yd",
            F.expr(xe), F.expr(ye), F.expr(de),
        )
    return (
        cur.groupBy((F.col("d") / 1024).cast("long").alias("h_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.max("xd") - F.min("xd")).cast("long").alias("cust_spread"),
            (F.max("yd") - F.min("yd")).cast("long").alias("day_spread"),
        )
    )

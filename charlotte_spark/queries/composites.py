"""Composite analytic queries — multi-join pipelines in the TPC-H
shape (Q3/Q5-like), exercising the D-rows *together* the way real
workloads do: selective scans → broadcast dim joins → fact-fact join →
partial+final aggregation → top-k.

Scale notes (r9 broadcast-hint discipline): ``F.broadcast`` hints ONLY
on frames whose cardinality is bounded by CONSTRUCTION at every SF —
nation (25), region (5), 1-row aggregates (max_rev/avg_bal/total).
customer/supplier/part and any lineitem-derived subset scale with SF
(supplier = 10k×SF rows: ~1 B rows at the 100 TB point — a forced
broadcast OOMs the build side), so those joins are left to the
planner: AQE broadcasts them while small and swaps to sort-merge /
shuffled-hash from runtime stats at scale — the same swap-note
doctrine as D21/D158. The lineitem⋈orders join is the only always-large
shuffle; top-k compiles to TakeOrderedAndProject (no global sort
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round
from ..registry import query


@query(
    "q3_shipping_priority",
    tags=("D8", "D9", "D14", "D15", "D24", "D39"),
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: two selective scans, an unhinted customer join
    (AQE broadcasts while small, SMJ at scale), fact-fact join,
    grouped revenue, top-10."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    tags=("D14", "D15", "D24", "D38"),
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five joins (nation/region broadcast, supplier
    unhinted — SF-proportional), date-banded fact scan, grouped
    revenue per nation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(F.col("n_name").alias("nation"), "revenue")
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Wider TPC-H-shaped surface, adapted to the driver's slimmed schemas (no
# partsupp / commitdate / receiptdate / shipmode columns exist — see
# charlotte_spark/schemas.py). Each query keeps the canonical plan shape of
# its TPC-H counterpart: the thing we are exercising is the composition of
# operators (semi/anti joins, correlated-style windows, scalar subqueries,
# disjunctive pushdown), not the exact TPC-H predicate constants.
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    tags=("D14", "D17", "D24", "D38", "D45"),
    oracle="""
    SELECT o.o_orderpriority AS orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    non-equi residual (shipped >30 days after order), then a small
    group-by. The semi join shuffles once on l_orderkey and never
    materializes the lineitem payload columns."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("order_count"))
        .orderBy("orderpriority")
    )


@query(
    "q6_forecast_revenue",
    tags=("D9", "D25"),
    oracle=f"""
    SELECT {sql_round("coalesce(sum(l_extendedprice * l_discount), 0.0)", 2)} AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side conjunctive filter + global agg.
    Every predicate is pushed to the parquet scan; the aggregate is a
    map-side partial + single final row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        pround(F.coalesce(F.sum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0)), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


@query(
    "q7_volume_shipping",
    tags=("D14", "D15", "D24", "D38", "D45", "D8"),
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    ship year. Both nation lookups broadcast; the pair disjunction is
    applied post-join so Catalyst can still push the date band to the
    scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@query(
    "q8_market_share",
    tags=("D14", "D15", "D24", "D28", "D38", "D45", "D8"),
    oracle=f"""
    SELECT year(o.o_orderdate) AS order_year,
           {sql_round(
               "sum(CASE WHEN n1.n_name = 'NATION_5' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)"
               " / sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    GROUP BY year(o.o_orderdate)
    ORDER BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional-sum ratio
    over an 8-table join. Nation/region broadcast; part and
    supplier joins are unhinted (SF-proportional); lineitem⋈orders is
    the only large shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_regionkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            pround(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


@query(
    "q10_returned_items",
    tags=("D14", "D15", "D24", "D39", "D8", "D9"),
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
           {sql_round("c.c_acctbal", 2)} AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in one quarter. Ends in TakeOrderedAndProject (top-k), not a
    full global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "revenue",
            pround(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    tags=("D16", "D24", "D38"),
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram over a left outer join —
    customers with zero qualifying orders must survive as c_count=0.
    Two cascaded aggregations, both map-side partial."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    # push the count below the outer join: aggregate orders per custkey
    # FIRST (shrinks the shuffled side from |orders| rows to |customers|
    # rows — at 100 TB that's the difference between shuffling the fact
    # table and shuffling a key-count pair per customer), then left-join
    # and coalesce missing customers to 0.
    ocnt = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_cust = c.select("c_custkey").join(ocnt, "c_custkey", "left").select(
        "c_custkey", F.coalesce("n_orders", F.lit(0)).alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_effect",
    tags=("D14", "D25", "D28", "D9"),
    oracle=f"""
    SELECT {sql_round(
        "100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)"
        " / sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS promo_revenue_pct,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — conditional
    aggregate ratio over a fact⋈dim join (strategy left to AQE)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        pround(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            4,
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q15_top_supplier",
    tags=("D14", "D15", "D24", "D25", "D33", "D38"),
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_round("sum(l_extendedprice * (1 - l_discount))", 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    scalar-subquery max is a 1-row aggregate broadcast back against the
    per-supplier revenue table — no single-partition window exchange;
    revenue stays partitioned end-to-end. Revenue is rounded before the
    equality compare so both engines select the same winners."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev")
    )
    return (
        top.join(s, top.supplier_no == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    tags=("D14", "D15", "D25", "D33", "D35", "D9"),
    oracle=f"""
    WITH flt AS (
      SELECT l.l_quantity, l.l_extendedprice,
             avg(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#13' AND p.p_size < 15
    )
    SELECT {sql_round("coalesce(sum(l_extendedprice), 0.0) / 7.0", 2)} AS avg_yearly,
           count(*) AS n_rows
    FROM flt
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually small orders of one
    brand — the correlated per-part AVG subquery expressed as a window
    over l_partkey (one shuffle, no self-join). l_quantity is whole-
    valued, so the per-part average is exact in both engines and the
    0.2·avg comparison cannot diverge on float noise."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 15)
    )
    w = Window.partitionBy("l_partkey")
    flt = (
        li.join(p, li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return flt.agg(
        pround(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q18_large_volume_customer",
    tags=("D11", "D14", "D17", "D24", "D39"),
    oracle=f"""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           {sql_round("o.o_totalprice", 2)} AS totalprice,
           sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    — IN-subquery decorrelated to a left-semi join against the
    aggregated order list. l_quantity is whole-valued so the HAVING
    threshold is exact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            pround(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    tags=("D14", "D25", "D9", "D12"),
    oracle=f"""
    SELECT {sql_round("coalesce(sum(l.l_extendedprice * (1 - l.l_discount)), 0.0)", 2)} AS revenue,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs over a fact⋈dim join. Catalyst
    extracts the common p_brand/p_size disjunction for the part side so
    the (unhinted, AQE-sized) build set is pre-filtered; the residual evaluates
    post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        pround(
            F.coalesce(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.lit(0.0)), 2
        ).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q22_idle_customers",
    tags=("D11", "D18", "D24", "D25", "D38"),
    oracle=f"""
    SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
           {sql_round("sum(c.c_acctbal)", 2)} AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= DATE '2001-01-01')
    GROUP BY c.c_nationkey
    ORDER BY nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers gone IDLE (no order since
    2001-01-01, the last ~7 months of the generator's date range) —
    scalar AVG subquery as a broadcast cross join (1 row), NOT EXISTS
    as a left-anti join on o_custkey with the date predicate pushed
    into the anti side's scan. Q22's literal "never ordered" is
    vacuous here (the generator gives ~every customer orders at every
    SF — a 0-row check, r12 fix); the recency form keeps the anti-join
    + scalar-subquery shape and is non-empty at every SF."""
    keys = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("numcust"), pround(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("nationkey")
    )


@query(
    "q2_min_cost_supplier",
    tags=("D14", "D15", "D24", "D37", "D39"),
    oracle=f"""
    WITH supply AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               {sql_round("min(l_extendedprice / l_quantity)", 4)} AS unit_cost
        FROM lineitem WHERE l_quantity > 0
        GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
        SELECT sp.pk, sp.unit_cost, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supply sp
        JOIN supplier s ON sp.sk = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    min_cost AS (SELECT pk, min(unit_cost) AS mc FROM eligible GROUP BY pk)
    SELECT e.s_acctbal AS acctbal, e.s_name AS sname, e.n_name AS nname,
           p.p_partkey AS partkey, p.p_name AS pname, e.unit_cost AS unit_cost
    FROM eligible e
    JOIN min_cost m ON e.pk = m.pk AND e.unit_cost = m.mc
    JOIN part p ON p.p_partkey = e.pk
    WHERE p.p_size = 15
    ORDER BY acctbal DESC, nname, sname, partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted to the schema (no partsupp table): the
    per-(part, supplier) min unit price from lineitem stands in for
    ps_supplycost; the correlated min-cost subquery becomes a grouped
    min joined back on (part, rounded cost) — the standard decorrelation
    Catalyst itself applies to scalar subqueries. Unit cost is rounded
    BEFORE the min/equality so both engines pick identical winners."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    supply = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(pround(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("unit_cost"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    eligible = (
        supply.join(s, supply.sk == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("pk", "unit_cost", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    min_cost = eligible.groupBy("pk").agg(F.min("unit_cost").alias("mc"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        eligible.join(min_cost, ["pk"])
        .filter(F.col("unit_cost") == F.col("mc"))
        .join(p, F.col("pk") == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("sname"),
            F.col("n_name").alias("nname"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("pname"),
            "unit_cost",
        )
        .orderBy(F.desc("acctbal"), "nname", "sname", "partkey")
        .limit(20)
    )


@query(
    "q9_product_type_profit",
    tags=("D14", "D24", "D44", "D45"),
    oracle=f"""
    SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
           {sql_round("sum(l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity)", 2)} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(l.l_shipdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by nation and year); ps_supplycost is
    proxied by 10% of p_retailprice (no partsupp in the schema)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(pround(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_stock",
    tags=("D14", "D24", "D25", "D9"),
    oracle=f"""
    WITH nat_value AS (
        SELECT l.l_partkey AS partkey,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey = (SELECT min(s_nationkey) FROM supplier)
        GROUP BY l.l_partkey
    )
    SELECT partkey, {sql_round("value", 2)} AS value
    FROM nat_value
    WHERE value > (SELECT avg(value) * 1.25 FROM nat_value)
    ORDER BY value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part traded value within one nation,
    keeping parts above 1.25x the nation's average per-part value
    (the nation = min supplier nation present, so the slice is
    non-empty at every SF) —
    the global scalar is a 1-row aggregate broadcast back (same
    no-single-partition-window pattern as q15). Above-AVERAGE rather
    than TPC-H's fraction-of-total: per-part share is ~1/|parts| at
    every SF of this generator, so any fixed total-fraction threshold
    returns zero rows at all SFs (a vacuous check, r12 fix); the
    above-average form keeps the scalar-subquery + broadcast shape and
    is non-empty at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    # the audited nation = min supplier nation present (a fixed literal
    # nation can be absent from the supplier set at tiny SFs — 0 rows);
    # 1-row aggregate broadcast, the same scalar pattern as the threshold
    nat = s.agg(F.min("s_nationkey").alias("nkey"))
    nat_value = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nat), s.s_nationkey == F.col("nkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = nat_value.agg((F.avg("value") * 1.25).alias("threshold"))
    return (
        nat_value.join(F.broadcast(total), F.col("value") > F.col("threshold"))
        .select("partkey", pround("value", 2).alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


@query(
    "q12_late_shipment_priority",
    tags=("D14", "D28", "D45"),
    oracle="""
    SELECT CASE WHEN l.l_tax >= 0.04 THEN 'HIGHTAX' ELSE 'LOWTAX' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY ship_bucket
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority counts over late shipments); the
    schema has no l_shipmode/l_receiptdate, so the mode becomes a
    deterministic tax bucket and 'late' means shipped >60 days after
    the order date."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .groupBy(
            F.when(F.col("l_tax") >= 0.04, "HIGHTAX").otherwise("LOWTAX").alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q16_supplier_part_count",
    tags=("D14", "D18", "D26", "D11"),
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS psize,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, brand, type, psize
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute group,
    excluding a supplier blocklist (negative balance stands in for the
    'complaints' comment filter; the NOT IN becomes a left-anti join)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type", "psize")
    )


@query(
    "q20_part_promotion",
    tags=("D14", "D17", "D24", "D12"),
    oracle="""
    WITH red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
        SELECT l.l_suppkey AS sk, sum(l.l_quantity) AS qty
        FROM lineitem l JOIN red_parts rp ON rp.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 50
    )
    SELECT s.s_name AS sname, CAST(s.s_acctbal AS DOUBLE) AS acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT sk FROM shipped)
    ORDER BY sname
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved enough of the promoted
    ('red') parts in 1996 — the IN-subquery chain becomes a grouped
    HAVING feeding a left-semi join."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(shipped, s.s_suppkey == shipped.sk, "left_semi")
        .select(F.col("s_name").alias("sname"), F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("sname")
    )


@query(
    "q21_waiting_supplier",
    tags=("D14", "D17", "D18", "D23"),
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    all_f AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name AS sname, count(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_f l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, sname
    LIMIT 25
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finalized multi-supplier order ('late' = shipped >90 days after the
    order date; no l_receiptdate/l_commitdate in the schema). The
    EXISTS becomes a left-semi self-join on (order, other-supplier) and
    the NOT EXISTS a left-anti — the non-trivial part is that both
    probe the SAME relation the outer query scans (D23 self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = (
        base.filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_f = base.select("l_orderkey", "l_suppkey").distinct()
    l2 = all_f.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    sole_late = (
        late.join(
            l2, (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2), "left_semi"
        )
        .join(l3, (late.l_orderkey == l3.o3) & (late.l_suppkey != l3.s3), "left_anti")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(s, sole_late.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("sname"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "sname")
        .limit(25)
    )

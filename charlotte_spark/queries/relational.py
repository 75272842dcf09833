"""Scans, projection, filtering, predicates (SURVEY §2.2 D1-D13).

The flagship query is ``q1_pricing_summary`` — the TPC-H-Q1-shaped
pricing summary over lineitem (SURVEY §7 Phase 1): scan → filter →
multi-agg groupBy → total-order sort. Catalyst pushes the shipdate
filter and the 7-column pruning into the parquet scan and plans a
partial+final hash aggregate, which is exactly the plan we want at
100 TB (no custom work needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round
from ..registry import query


@query(
    "q1_pricing_summary",
    tags=("D8", "D9", "D24", "D38"),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_round("sum(l_quantity)", 2)} AS sum_qty,
           {sql_round("sum(l_extendedprice)", 2)} AS sum_base_price,
           {sql_round("sum(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price,
           {sql_round("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
           {sql_round("avg(l_quantity)", 2)} AS avg_qty,
           {sql_round("avg(l_extendedprice)", 2)} AS avg_price,
           {sql_round("avg(l_discount)", 2)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            pround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            pround(F.sum(disc_price), 2).alias("sum_disc_price"),
            pround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            pround(F.avg("l_quantity"), 2).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 2).alias("avg_price"),
            pround(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "d1_scan_rowcounts",
    tags=("D1",),
    oracle="""
    SELECT * FROM (
        SELECT 'region' AS tbl, count(*) AS n FROM region
        UNION ALL SELECT 'nation', count(*) FROM nation
        UNION ALL SELECT 'customer', count(*) FROM customer
        UNION ALL SELECT 'supplier', count(*) FROM supplier
        UNION ALL SELECT 'part', count(*) FROM part
        UNION ALL SELECT 'orders', count(*) FROM orders
        UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        UNION ALL SELECT 'events', count(*) FROM events
        UNION ALL SELECT 'documents', count(*) FROM documents
        UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    ) ORDER BY tbl
    """,
)
def d1_scan_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan of all 10 test tables → per-table row counts."""
    from ..catalog import TABLE_NAMES

    out = None
    for name in TABLE_NAMES:
        df = (
            load_table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("tbl"), "n")
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("tbl")


@query(
    "d1_scan_checksum_lineitem",
    tags=("D1",),
    oracle=f"""
    SELECT count(*) AS n,
           CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
           CAST(sum(l_partkey) AS BIGINT)  AS sum_pkey,
           {sql_round("sum(l_extendedprice)", 2)} AS sum_price
    FROM lineitem
    """,
)
def d1_scan_checksum_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content checksum of the widest table (count + key sums)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_orderkey").alias("sum_okey"),
        F.sum("l_partkey").alias("sum_pkey"),
        pround(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "d7_select_rename",
    tags=("D7",),
    oracle="""
    SELECT o_orderkey AS okey, o_orderpriority AS priority, o_custkey AS cust
    FROM orders ORDER BY okey
    """,
)
def d7_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select / rename / reorder (pure projection, pruned scan)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_custkey").alias("cust"),
        )
        .orderBy("okey")
    )


@query(
    "d8_computed_projection",
    tags=("D8",),
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_round("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)} AS charge,
           CASE WHEN l_quantity > 30 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_band
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def d8_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + CASE WHEN projection (charlotte R8 dispatch analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
        F.when(F.col("l_quantity") > 30, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "d9_predicates",
    tags=("D9",),
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE (o_totalprice BETWEEN 1000 AND 150000)
      AND (o_orderstatus = 'O' OR o_orderstatus = 'F')
      AND NOT (o_custkey < 10)
    ORDER BY o_orderkey
    """,
)
def d9_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean predicate pushdown (=, BETWEEN, AND/OR/NOT)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(1000, 150000)
            & ((F.col("o_orderstatus") == "O") | (F.col("o_orderstatus") == "F"))
            & ~(F.col("o_custkey") < 10)
        )
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "d10_null_semantics",
    tags=("D10",),
    oracle=f"""
    WITH e AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v1,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v2
        FROM events
    )
    SELECT event_id,
           (v1 IS NULL) AS v1_null,
           (v1 IS NOT DISTINCT FROM v2) AS nse,
           coalesce({sql_round("v1", 2)}, -1.0) AS v1_filled
    FROM e
    ORDER BY event_id
    """,
)
def d10_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / null-safe equality (<=>) / coalesce default fabrication
    (the R13/R14 'default dimension row' primitive,
    /root/reference/charlotte/__init__.py:189,202)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value")).alias("v1"),
        F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")).alias("v2"),
    )
    return e.select(
        "event_id",
        F.col("v1").isNull().alias("v1_null"),
        F.col("v1").eqNullSafe(F.col("v2")).alias("nse"),
        F.coalesce(pround("v1", 2), F.lit(-1.0)).alias("v1_filled"),
    ).orderBy("event_id")


@query(
    "d11_in_list",
    tags=("D11",),
    oracle="""
    SELECT c_custkey, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      AND c_nationkey NOT IN (1, 2, 3)
    ORDER BY c_custkey
    """,
)
def d11_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
            & ~F.col("c_nationkey").isin(1, 2, 3)
        )
        .select("c_custkey", "c_mktsegment", "c_nationkey")
        .orderBy("c_custkey")
    )


@query(
    "d12_like_regexp",
    tags=("D12",),
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%i%' AND regexp_matches(p_type, '^(STANDARD|SMALL|ECONOMY)')
    ORDER BY p_partkey
    """,
)
def d12_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%i%") & F.col("p_type").rlike("^(STANDARD|SMALL|ECONOMY)")
        )
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@query(
    "d13_distinct",
    tags=("D13",),
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_suppkey
    """,
)
def d13_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_suppkey")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "l_suppkey")
    )


@query(
    "d108_sql_text_surface",
    tags=("D108", "D1", "D14", "D24"),
    oracle=f"""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_round("sum(o.o_totalprice)", 2)} AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def d108_sql_text_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text entry point: the same engine surface through
    ``spark.sql`` over registered views — a user of the reference who
    writes SQL (its queries ARE SQL templates,
    /root/reference/charlotte/__init__.py:473-608) gets the identical
    Catalyst plan as the DataFrame API: pushed filters, pruned columns,
    broadcast dimension joins. The query text below is near-verbatim
    the DuckDB oracle, modulo the portable rounding wrapper."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    # portable round spelled with explicit DOUBLE casts: in Spark SQL
    # text, `floor(x)/100.0` types as DECIMAL (bigint ÷ decimal
    # literal), unlike the DataFrame API where lit(100.0) is DOUBLE
    return spark.sql(
        """
        SELECT n.n_name,
               count(*) AS n_orders,
               CAST(floor(sum(o.o_totalprice) * 100.0 + 0.5) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )


@query(
    "d109_recursive_cte",
    tags=("D109", "D108", "D74"),
    oracle=f"""
    WITH RECURSIVE walk(key, node, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part
        UNION ALL
        SELECT key, node // 4, depth + 1 FROM walk WHERE node > 0
    ),
    depths AS (
        SELECT key, max(depth) AS depth FROM walk GROUP BY key
    )
    SELECT d.depth,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round("sum(p.p_retailprice)", 2)} AS total_price
    FROM depths d JOIN part p ON d.key = p.p_partkey
    GROUP BY d.depth ORDER BY d.depth
    """,
)
def d109_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.x): per-key path-to-root
    depth over a synthetic quaternary hierarchy on part keys
    (parent(k) = k div 4), rolled up to per-depth counts and price
    totals. The general hierarchy/graph-walk SQL surface — the same
    engine mechanism DuckDB uses for d74's transitive-closure oracle,
    now exercised on the SPARK side too.

    Execution is Spark's iterative union-loop: each recursion step is
    one narrow projection over the previous step's frontier (no joins
    here), with the frontier shrinking ~4× per level — ~log₄(maxkey)
    bounded steps, never a driver-side loop."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk(key, node, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM part
            UNION ALL
            SELECT key, node div 4, depth + 1 FROM walk WHERE node > 0
        ),
        depths AS (
            SELECT key, max(depth) AS depth FROM walk GROUP BY key
        )
        SELECT d.depth,
               count(*) AS n,
               CAST(floor(sum(p.p_retailprice) * 100.0 + 0.5) AS DOUBLE)
                   / CAST(100.0 AS DOUBLE) AS total_price
        FROM depths d JOIN part p ON d.key = p.p_partkey
        GROUP BY d.depth ORDER BY d.depth
        """
    )

"""Aggregation surface (SURVEY §2.2 D24-A32, plus R20's MAX).

Spark plans every groupBy as partial (map-side) + final aggregate
automatically — the property that makes these linear at 100 TB. The
only aggregate the reference itself performs is MAX(cid)
(/root/reference/charlotte/__init__.py:560), covered by d24/d25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round
from ..registry import query


@query(
    "d24_groupby_multi_agg",
    tags=("D24", "R20"),
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {sql_round("sum(o_totalprice)", 2)} AS sum_price,
           {sql_round("avg(o_totalprice)", 2)} AS avg_price,
           {sql_round("min(o_totalprice)", 2)} AS min_price,
           {sql_round("max(o_totalprice)", 2)} AS max_price,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def d24_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("o_totalprice"), 2).alias("sum_price"),
            pround(F.avg("o_totalprice"), 2).alias("avg_price"),
            pround(F.min("o_totalprice"), 2).alias("min_price"),
            pround(F.max("o_totalprice"), 2).alias("max_price"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "d25_global_agg",
    tags=("D25", "R20"),
    oracle=f"""
    SELECT count(*) AS n,
           {sql_round("sum(l_quantity)", 2)} AS sum_qty,
           {sql_round("avg(l_discount)", 4)} AS avg_disc,
           {sql_round("min(l_extendedprice)", 2)} AS min_price,
           {sql_round("max(l_extendedprice)", 2)} AS max_price,
           CAST(max(l_orderkey) AS BIGINT) AS max_cid
    FROM lineitem
    """,
)
def d25_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        pround(F.avg("l_discount"), 4).alias("avg_disc"),
        pround(F.min("l_extendedprice"), 2).alias("min_price"),
        pround(F.max("l_extendedprice"), 2).alias("max_price"),
        F.max("l_orderkey").alias("max_cid"),
    )


@query(
    "d26_count_distinct",
    tags=("D26",),
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d26_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d27_rollup",
    tags=("D27",),
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           count(*) AS n,
           {sql_round("sum(o_totalprice)", 2)} AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def d27_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with portable grouping id (grouping(a)*2 + grouping(b) —
    Spark's grouping_id() bitmask equals that here, but we build it
    explicitly so the formula is engine-independent)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total",
        )
        .orderBy("gid", "status", "priority")
    )


@query(
    "d27_cube",
    tags=("D27",),
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY gid, rf, ls
    """,
)
def d27_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "gid",
            "n",
        )
        .orderBy("gid", "rf", "ls")
    )


@query(
    "d27_grouping_sets",
    tags=("D27",),
    oracle=f"""
    SELECT coalesce(c_mktsegment, 'ALL') AS seg,
           coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nat,
           count(*) AS n,
           {sql_round("sum(c_acctbal)", 2)} AS bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    ORDER BY seg, nat
    """,
)
def d27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL (the DataFrame API has no direct form)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT coalesce(c_mktsegment, 'ALL') AS seg,
               coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nat,
               count(*) AS n,
               floor(CAST(sum(c_acctbal) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS bal
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        ORDER BY seg, nat
        """
    )


@query(
    "d28_filtered_agg",
    tags=("D28",),
    oracle=f"""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           {sql_round("sum(l_extendedprice) FILTER (WHERE l_quantity > 25)", 2)} AS big_qty_price,
           {sql_round("sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END)", 2)} AS open_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d28_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            pround(
                F.sum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 2
            ).alias("big_qty_price"),
            pround(
                F.sum(
                    F.when(F.col("l_linestatus") == "O", F.col("l_extendedprice")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("open_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d29_collect_list_set",
    tags=("D29",),
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS types_all,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_set
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def d29_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set, order-normalized via array_sort+join."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("types_all"),
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_set"),
        )
        .orderBy("user_id")
    )


@query(
    "d30_first_last_ordered",
    tags=("D30",),
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type, value, ts, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_f,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_l
        FROM events
    )
    SELECT f.user_id,
           f.event_type AS first_type, {sql_round("f.value", 2)} AS first_value,
           l.event_type AS last_type,  {sql_round("l.value", 2)} AS last_value
    FROM (SELECT * FROM ranked WHERE rn_f = 1) f
    JOIN (SELECT * FROM ranked WHERE rn_l = 1) l USING (user_id)
    ORDER BY f.user_id
    """,
)
def d30_first_last_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last with explicit total order (never bare first())."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w_f = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_l = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = e.select(
        "user_id",
        "event_type",
        "value",
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_l).alias("rn_l"),
    )
    first = ranked.filter(F.col("rn_f") == 1).select(
        "user_id",
        F.col("event_type").alias("first_type"),
        pround("value", 2).alias("first_value"),
    )
    last = ranked.filter(F.col("rn_l") == 1).select(
        F.col("user_id").alias("user_id_l"),
        F.col("event_type").alias("last_type"),
        pround("value", 2).alias("last_value"),
    )
    return (
        first.join(last, first.user_id == last.user_id_l)
        .select("user_id", "first_type", "first_value", "last_type", "last_value")
        .orderBy("user_id")
    )


@query(
    "a31_approx_count_distinct",
    tags=("A31",),
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
           1 AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a31_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct, hash-checked via its error bound: the sketch result
    must land within 3×rsd of the exact count (within_bound=1), and the
    exact count itself hash-matches — so the approximate operator is
    exercised for real while the compared output stays deterministic
    (SURVEY §2 A-row rule, encoded in-query).

    Pre-deduplicating (flag, partkey) with map-side combine replaces the
    Expand-based distinct-agg plan (which doubles the shuffled rows);
    the HLL sketch over the distinct set is register-identical to one
    over the raw rows, and the exact count becomes a plain count."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    return (
        pairs.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                (F.abs(F.col("approx_parts") - F.col("exact_parts"))
                 <= 0.06 * F.col("exact_parts")).cast("int")
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a32_approx_quantiles",
    tags=("A32",),
    oracle=f"""
    SELECT event_type,
           {sql_round("quantile_disc(value, 0.5)", 2)} AS exact_p50,
           1 AS p50_within_bound, 1 AS p95_within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def a32_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles, hash-checked via error
    bounds (|approx-exact| ≤ 10% of exact ⇒ flag=1) plus the exact
    discrete median, which both engines agree on (percentile_disc picks
    an element, no interpolation)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5).alias("a50"),
            F.percentile_approx("value", 0.95).alias("a95"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("ex"),
            pround(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"), 2).alias(
                "exact_p50"
            ),
        )
        .select(
            "event_type",
            "exact_p50",
            ((F.abs(F.col("a50") - F.col("ex")[0]) <= 0.10 * F.abs(F.col("ex")[0]))
             .cast("int")).alias("p50_within_bound"),
            ((F.abs(F.col("a95") - F.col("ex")[1]) <= 0.10 * F.abs(F.col("ex")[1]))
             .cast("int")).alias("p95_within_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "d32x_exact_percentile",
    tags=("A32",),
    oracle=f"""
    SELECT event_type,
           {sql_round("quantile_cont(value, 0.5)", 4)} AS median_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def d32x_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile — hash-checked (both engines use
    linear interpolation)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(pround(F.expr("percentile(value, 0.5)"), 4).alias("median_value"))
        .orderBy("event_type")
    )


@query(
    "a83_hll_sketch_union",
    tags=("A83", "A31"),
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
           1 AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a83_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct sketches (Apache DataSketches HLL): build one
    sketch per (returnflag, linestatus) subgroup, then UNION the binary
    sketches per returnflag and estimate. This two-level shape is the
    100 TB architecture for distinct counts — per-partition/per-shard
    sketches are tiny (KBs), union is associative, and no raw keys ever
    re-shuffle; the same sketches could be persisted and merged across
    days. Checked like a31: the estimate must land within 5% of the
    exact count (within_bound=1) while the exact count hash-matches."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.countDistinct("l_orderkey").alias("sub_exact"),
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    return (
        merged.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (
                (F.abs(F.col("est") - F.col("exact_orders")) / F.col("exact_orders"))
                < 0.05
            )
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


# events has 5 uniform event_types, so the heavy-hitter query derives a
# deliberately skewed key: every 3rd event maps to one of 2 hot keys
# (~16.7% each), the rest spread over 997 cold keys (~0.08% each) —
# identical construction in both engines.
_SQL_SKEWED_KEY = """
    SELECT CASE WHEN event_id % 3 = 0
                THEN 'hot_' || CAST(event_id % 2 AS VARCHAR)
                ELSE 'cold_' || CAST(event_id % 997 AS VARCHAR) END AS k
    FROM events
"""


@query(
    "a90_heavy_hitters",
    tags=("A90", "A31"),
    oracle=f"""
    WITH keyed AS ({_SQL_SKEWED_KEY})
    SELECT k, count(*) AS n
    FROM keyed
    GROUP BY k
    HAVING count(*) * 20 > (SELECT count(*) FROM keyed)
    ORDER BY k
    """,
)
def a90_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (frequent items > 5% support) with an
    exact verification pass. ``df.stat.freqItems`` is single-pass lossy
    counting (Karp/Shenker/Papadimitriou): each partition keeps at most
    1/support counters, merged on the driver — the sketch never shuffles
    raw keys and is guaranteed a SUPERSET of the true heavy hitters.
    The second pass counts only the <= 1/support candidates and drops
    false positives, so the result is exact (hash-checkable) while the
    candidate generation is the sketch. At 100 TB: pass 1 is a map-only
    scan + KB-sized driver merge; pass 2 aggregates a 20-key subset.
    Integer threshold (n*20 > total) avoids float boundary drift."""
    e = load_table(spark, sf_dir, "events")
    key = F.when(
        F.col("event_id") % 3 == 0,
        F.concat(F.lit("hot_"), (F.col("event_id") % 2).cast("string")),
    ).otherwise(F.concat(F.lit("cold_"), (F.col("event_id") % 997).cast("string")))
    d = e.select(key.alias("k"))
    candidates = [str(x) for x in d.stat.freqItems(["k"], 0.05).first()[0]]
    total = d.count()
    return (
        d.filter(F.col("k").isin(candidates))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 20 > F.lit(total))
        .orderBy("k")
    )

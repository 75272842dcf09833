"""Sort / limit / top-k / deterministic sampling (SURVEY §2.2 D38-D40).

Global sorts are range-partitioned shuffles in Spark (sampled
boundaries), so they scale; top-k compiles to TakeOrderedAndProject
(per-partition heap + driver merge — no full sort materialized).
Nulls ordering is pinned explicitly everywhere (Spark default is
nulls-first for ASC, DuckDB's is nulls-last — SURVEY §2 caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import portable_hash_long, pround, sql_hash_long, sql_round
from ..registry import query


@query(
    "d38_multikey_sort",
    tags=("D38",),
    oracle=f"""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE {sql_round("c_acctbal", 2)} END AS bal,
           c_mktsegment
    FROM customer
    ORDER BY bal DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
    """,
)
def d38_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with a nullable key and explicit null order.
    (The driver's compare is order-insensitive; the content — including
    the fabricated NULLs — is what's checked. The sort itself is
    content-visible in d39's limit.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(pround("c_acctbal", 2)).alias("bal"),
        "c_mktsegment",
    ).orderBy(
        F.col("bal").desc_nulls_last(),
        F.col("c_mktsegment").asc_nulls_first(),
        F.col("c_custkey").asc(),
    )


@query(
    "d39_topk_limit",
    tags=("D39",),
    oracle=f"""
    SELECT o_orderkey, {sql_round("o_totalprice", 2)} AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def d39_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted limit → TakeOrderedAndProject; total order via unique key
    tie-break makes the k-th boundary deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", pround("o_totalprice", 2).alias("price"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "d40_hash_sample",
    tags=("D40",),
    oracle=f"""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE {sql_hash_long("o_orderkey")} % 10 = 0
    ORDER BY o_orderkey
    """,
)
def d40_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via the portable md5-derived hash
    (never rand(), never engine-native hash() — SURVEY §2 caveats)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(portable_hash_long("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )

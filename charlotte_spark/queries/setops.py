"""Set operations (SURVEY §2.2 D41-D43).

UNION ALL is a zero-shuffle concatenation in Spark; UNION-distinct,
INTERSECT and EXCEPT all shuffle on the full row — at 100 TB prefer
pre-aggregated inputs (as these queries do) so the shuffled payload is
group keys, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "d41_union_all_distinct",
    tags=("D41", "R4"),
    oracle="""
    WITH u_all AS (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    ),
    u_dist AS (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    )
    SELECT (SELECT count(*) FROM u_all) AS n_all,
           (SELECT count(*) FROM u_dist) AS n_distinct
    """,
)
def d41_union_all_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL vs UNION-distinct — the R4 multi-directory union analog
    (/root/reference/charlotte/__init__.py:257-263)."""
    u_all = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    n_all = u_all.agg(F.count(F.lit(1)).alias("n_all"))
    n_dist = u_all.distinct().agg(F.count(F.lit(1)).alias("n_distinct"))
    return n_all.crossJoin(n_dist)


@query(
    "d42_intersect",
    tags=("D42",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def d42_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@query(
    "d42_intersect_all",
    tags=("D42",),
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def d42_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect (bag semantics), aggregated for a stable check."""
    return (
        _cust_nations(spark, sf_dir)
        .intersectAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


@query(
    "d43_except",
    tags=("D43",),
    oracle="""
    SELECT c_custkey % 40 AS k FROM customer
    EXCEPT
    SELECT s_suppkey % 25 FROM supplier
    ORDER BY k
    """,
)
def d43_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference with GUARANTEED overlap and remainder at every
    SF: left keys are 0..39, right keys 0..24, so 0..24 are dropped
    (the dedup+difference semantics exercised) and 25..39 survive.
    The previous nation-key form was vacuous at sf>=0.01 (suppliers
    cover every customer nation — 0 rows; r12 fix)."""
    c = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 40).alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % 25).alias("k")
    )
    return c.subtract(s).orderBy("k")


@query(
    "d43_except_all",
    tags=("D43",),
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def d43_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .exceptAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )

"""Window function surface (SURVEY §2.2 D33-D37).

D33's row_number is also the R19 cid-assignment primitive (the
reference's per-sensor alert sequence,
/root/reference/charlotte/__init__.py:554-570) — there it was safe only
because a single serialized writer existed; the window form is the
parallel equivalent. Every orderBy includes a unique tie-break key so
results are total-ordered (SURVEY §2 determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round
from ..registry import query


@query(
    "d33_ranking_functions",
    tags=("D33", "R19"),
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER w AS rn,
           rank()       OVER w2 AS rnk,
           dense_rank() OVER w2 AS drnk,
           ntile(4)     OVER w AS quartile
    FROM events
    WHERE user_id < 25
    WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
           w2 AS (PARTITION BY user_id ORDER BY event_type)
    ORDER BY event_id
    """,
)
def d33_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w2 = W.partitionBy("user_id").orderBy(F.col("event_type").asc())
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("event_id")


@query(
    "d34_lag_lead",
    tags=("D34",),
    oracle=f"""
    SELECT event_id, user_id,
           {sql_round("lag(value, 1)  OVER w", 2)} AS prev_value,
           {sql_round("lead(value, 1) OVER w", 2)} AS next_value,
           lag(event_type, 2, 'none') OVER w AS prev2_type
    FROM events
    WHERE user_id < 25
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
)
def d34_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        pround(F.lag("value", 1).over(w), 2).alias("prev_value"),
        pround(F.lead("value", 1).over(w), 2).alias("next_value"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    ).orderBy("event_id")


@query(
    "d35_running_aggregates",
    tags=("D35",),
    oracle=f"""
    SELECT event_id, user_id,
           {sql_round("sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
           {sql_round("avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 2)} AS moving_avg3
    FROM events
    WHERE user_id < 25
    ORDER BY event_id
    """,
)
def d35_running_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        pround(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
            "running_sum"
        ),
        F.count(F.lit(1))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_n"),
        pround(F.avg("value").over(w.rowsBetween(-2, W.currentRow)), 2).alias("moving_avg3"),
    ).orderBy("event_id")


@query(
    "d36_range_frame",
    tags=("D36",),
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
           ) AS n_similar_price,
           {sql_round("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)", 2)} AS sum_similar
    FROM orders
    ORDER BY o_orderkey
    """,
)
def d36_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (orders within $10k below current price)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
        pround(F.sum("o_totalprice").over(w), 2).alias("sum_similar"),
    ).orderBy("o_orderkey")


@query(
    "d37_topk_per_group",
    tags=("D37",),
    oracle=f"""
    SELECT * FROM (
        SELECT c_nationkey, c_custkey, {sql_round("c_acctbal", 2)} AS bal,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ) AS rk
        FROM customer
    ) WHERE rk <= 3
    ORDER BY c_nationkey, rk
    """,
)
def d37_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation (rank-filter pattern)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            pround("c_acctbal", 2).alias("bal"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
    )


# ---------------------------------------------------------------------------
# D135: distribution window functions (percent_rank / cume_dist / nth_value)
# ---------------------------------------------------------------------------


@query(
    "d135_distribution_windows",
    tags=("D135", "D33", "D34"),
    oracle=f"""
    SELECT event_id, event_type,
           {sql_round("percent_rank() OVER w_val", 6)} AS pct_rank,
           {sql_round("cume_dist() OVER w_val", 6)} AS cume,
           {sql_round(
               "nth_value(value, 3) OVER (PARTITION BY event_type ORDER BY ts, event_id "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", 4)} AS third_by_time
    FROM events
    WINDOW w_val AS (PARTITION BY event_type ORDER BY value, event_id)
    ORDER BY event_id
    """,
)
def d135_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window-function family rounding out D33's
    ranking set: percent_rank and cume_dist of each event's value
    within its type (the normalized positions analytics dashboards
    bin on), plus nth_value over the time ordering with an explicit
    UNBOUNDED frame (nth_value's default frame stops at CURRENT ROW,
    which silently yields NULL for rows before the nth — the classic
    window-frame trap, pinned here with the frame spelled out in both
    engines).

    Plan shape: both windows partition on the same low-cardinality
    event_type key, so Catalyst plans ONE exchange and two Window
    operators over the same partitioning — at 100 TB the event log
    shuffles once regardless of how many same-key window families
    stack. Rank orders carry event_id tie-breaks, so every normalized
    position is deterministic."""
    w_val = W.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    w_time = (
        W.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            pround(F.percent_rank().over(w_val), 6).alias("pct_rank"),
            pround(F.cume_dist().over(w_val), 6).alias("cume"),
            pround(F.nth_value("value", 3).over(w_time), 4).alias("third_by_time"),
        )
        .orderBy("event_id")
    )

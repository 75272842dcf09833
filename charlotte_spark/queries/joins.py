"""Join surface (SURVEY §2.2 D14-D23).

Scale notes per query are in each docstring; the common rules:
small dims (region/nation/supplier at any SF, the charlotte maps —
R13/R14 at /root/reference/charlotte/__init__.py:183-204) broadcast;
fact-fact joins shuffle on the join key and rely on AQE for skew; the
as-of join uses the union+window operator (one linear shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.portable import portable_hash_long, pround, sql_hash_long, sql_round
from ..operators.asof import asof_join
from ..registry import query
from ..session import local_df


@query(
    "d14_inner_equijoin",
    tags=("D14",),
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           {sql_round("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def d14_inner_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact shuffle join on l_orderkey; Catalyst picks SMJ/SHJ + AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "d15_broadcast_dim_join",
    tags=("D15", "R13", "R14"),
    oracle=f"""
    SELECT r_name, n_name,
           count(*) AS n_cust,
           {sql_round("sum(c_acctbal)", 2)} AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def d15_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two broadcast dims — the R13/R14 enrichment shape
    (signature/classification map lookups) at relational scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            pround(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "d16_left_outer_join",
    tags=("D16",),
    oracle=f"""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           {sql_round("coalesce(sum(o_totalprice), 0.0)", 2)} AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def d16_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer keeps order-less customers (null-matching rows in check)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            pround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "d16_full_outer_join",
    tags=("D16",),
    oracle="""
    WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.k, s.k) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    ORDER BY nationkey
    """,
)
def d16_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("ks"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.k == s.ks, "full")
        .select(
            F.coalesce(c.k, s.ks).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "d17_left_semi_join",
    tags=("D17",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    ORDER BY c_custkey
    """,
)
def d17_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "d18_left_anti_join",
    tags=("D18", "R16", "R17"),
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def d18_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — the dimension-upsert building block (charlotte R16/R17:
    insert-if-absent at /root/reference/charlotte/__init__.py:541-594).
    The anti side is predicate-restricted (customers with no URGENT
    order): a bare 'no orders at all' anti-join is 0-1 rows at every SF
    of this generator — a vacuous check (r12 fix) — while ~(4/5)^k of
    customers with k orders lack an urgent one, so the result is
    non-empty at every SF and the pushed filter shows up in the anti
    side's scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "d19_cross_join",
    tags=("D19",),
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def d19_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cartesian (5 × 25); anything bigger must be pruned first."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "d20_range_join",
    tags=("D20",),
    oracle=f"""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
               ('high', 150000.0, 100000000.0)
    )
    SELECT band, count(*) AS n_orders, {sql_round("sum(o_totalprice)", 2)} AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    ORDER BY band
    """,
)
def d20_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta join against a tiny band table → broadcast
    nested-loop, the only sane physical plan for band joins at scale."""
    o = load_table(spark, sf_dir, "orders")
    bands = local_df(
        spark,
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e8)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            pround(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("band")
    )


@query(
    "d21_asof_join",
    tags=("D21",),
    oracle="""
    WITH pairs AS (
        SELECT p.event_id,
               c.event_id AS click_id,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, pr.click_id
    FROM events p
    LEFT JOIN (SELECT event_id, click_id FROM pairs WHERE rn = 1) pr
      ON pr.event_id = p.event_id
    WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
)
def d21_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the user's latest prior
    click. Uses the union+window operator (operators/asof.py): one linear
    shuffle, no |purchases| x |clicks| intermediate. The oracle uses the
    portable row_number formulation (SURVEY D21)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), "user_id", "ts"
    )
    return (
        asof_join(
            purchases,
            clicks,
            on="user_id",
            time_probe="ts",
            time_quote="ts",
            attach={"click_id": "c_event_id"},
            tiebreak_quote="c_event_id",
        )
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    )


@query(
    "d22_interval_join",
    tags=("D22",),
    oracle="""
    SELECT e.event_id,
           count(p.event_id) AS n_purchases_1h
    FROM events e
    LEFT JOIN events p
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase'
     AND p.ts > e.ts
     AND p.ts <= e.ts + INTERVAL 1 HOUR
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
)
def d22_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/overlap join: purchases within 1h after each error, per
    user. Equi-key on user_id keeps it a hash join with a range residual
    (not a BNLJ), which is the scalable shape."""
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        errors.join(
            purchases,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("p_event_id").alias("n_purchases_1h"))
        .orderBy("event_id")
    )


@query(
    "d23_self_join",
    tags=("D23",),
    oracle="""
    SELECT a.event_id AS first_id, b.event_id AS next_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'signup' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    ORDER BY first_id, next_id
    """,
)
def d23_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliases: purchases within 30min after a signup."""
    e = load_table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") == "signup")
            & (F.col("b.event_type") == "purchase")
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 MINUTE")),
        )
        .select(
            F.col("a.event_id").alias("first_id"),
            F.col("b.event_id").alias("next_id"),
            F.col("a.user_id").alias("user_id"),
        )
        .orderBy("first_id", "next_id")
    )


@query(
    "d84_bucketed_colocated_join",
    tags=("D84", "D14"),
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n,
           {sql_round("sum(l.l_extendedprice)", 2)} AS total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def d84_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: both tables are written
    bucketed (8 buckets) and sorted on the join key, so the sort-merge
    join reads bucket i against bucket i with NO exchange and NO sort —
    the layout investment that turns every future orderkey join into a
    scan-side operation. At 100 TB this is how a fact table that joins
    repeatedly on the same key amortizes its shuffle: pay it once at
    write time (bucketBy), never at query time. The plan invariant
    (no Exchange under the join) is asserted in tests/test_plans.py."""
    import hashlib

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # table names carry the sf_dir fingerprint: one session may serve
    # several scale factors (tests at sf0.01, bench at sf0.1) and a
    # name-only cache would silently join stale data
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"b_orders_{sfx}", f"b_lineitem_{sfx}")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df, key in zip(names, (o, li), ("o_orderkey", "l_orderkey")):
        if not spark.catalog.tableExists(name):
            # a previous process may have left the data dir without the
            # (in-memory) catalog entry — clear it or saveAsTable errors
            # with LOCATION_ALREADY_EXISTS
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
    bo, bl = spark.table(names[0]), spark.table(names[1])
    # merge hint: at test scale AQE would broadcast the small side and
    # never touch the bucket layout; the point of this operator is the
    # shuffle-free sort-merge path both tables were laid out for
    return (
        bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "d87_salted_skew_join",
    tags=("D87", "D14", "D24"),
    oracle=f"""
    WITH weights(event_type, weight) AS (
        VALUES ('click', CAST(1.0 AS DOUBLE)), ('view', CAST(0.5 AS DOUBLE)),
               ('purchase', CAST(5.0 AS DOUBLE)), ('signup', CAST(3.0 AS DOUBLE)),
               ('error', CAST(0.0 AS DOUBLE))
    )
    SELECT e.event_type, count(*) AS n,
           {sql_round("sum(e.value * w.weight)", 2)} AS weighted
    FROM events e JOIN weights w USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def d87_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: the events⋈weights key has 5 values over 100k
    rows — a shuffle join would land each key on ONE reducer (worst
    task = 1/5 of the table). Salting replicates the build side x8
    (explode a salt sequence) and tags each probe row with
    event_id % 8, so the join key becomes (event_type, salt) and every
    hot key spreads over 8 partitions. The salt never reaches the
    result — it aggregates out — so the oracle is the plain join.

    At test scale AQE would simply broadcast the 5-row dim (and its
    skew-join splitting handles moderate skew automatically); the salt
    is the technique for the case neither handles — a build side too
    big to broadcast joined on a power-law key. The mechanics here are
    the real ones: deterministic salt, replicated build, exact result."""
    events = load_table(spark, sf_dir, "events")
    dim = local_df(
        spark,
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 3.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    n_salt = 8
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    fact = events.withColumn("salt", (F.col("event_id") % n_salt).cast("int"))
    return (
        fact.join(salted_dim, ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# D130: CIDR containment enrichment (security-lineage range-join form)
# ---------------------------------------------------------------------------

# (name, lo, hi) — numeric [lo, hi] ranges of non-uniform width with
# deliberate gaps, so containment is a real range predicate (an aligned
# uniform grid would reduce to an equi-join on a prefix) and unmatched
# addresses exercise the left-outer default.
_CIDR_BLOCKS = (
    ("corp-10/8", 167_772_160, 184_549_375),          # 10.0.0.0/8
    ("dmz-172.16/12", 2_886_729_728, 2_887_778_303),  # 172.16.0.0/12
    ("guest-192.168/16", 3_232_235_520, 3_232_301_055),  # 192.168.0.0/16
    ("cgnat-100.64/10", 1_681_915_904, 1_686_110_207),   # 100.64.0.0/10
    ("mcast-224/4", 3_758_096_384, 4_026_531_839),       # 224.0.0.0/4
)


@query(
    "d130_cidr_enrichment",
    tags=("D130", "D20", "D52"),
    oracle=f"""
    WITH evt AS (
        SELECT event_id, user_id,
               CAST('0x' || substring(md5('ip|' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS ip
        FROM events
    ),
    dim(block, lo, hi) AS (
        VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _CIDR_BLOCKS)}
    )
    SELECT coalesce(d.block, 'unassigned') AS block,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM evt e LEFT JOIN dim d ON e.ip BETWEEN d.lo AND d.hi
    GROUP BY coalesce(d.block, 'unassigned')
    ORDER BY block
    """,
)
def d130_cidr_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR-block enrichment — the security-analytics form of the range
    join (D20) and the numeric-IP machinery of D52: map each event's
    address (synthesized 32-bit value from the portable hash — the
    events table carries no IPs) to its containing network block via a
    BETWEEN containment join against a literal block dimension, with
    unmatched addresses kept as 'unassigned' (the reference's
    fabricate-default semantics, R13-R15).

    Scale shape: the dim side is O(blocks) and BROADCASTS, so
    containment is a BroadcastNestedLoopJoin with a bounded build side
    — per-row work is O(blocks) comparisons, the event log never
    shuffles. For dims beyond ~10^4 blocks the production form is an
    interval index (prefix bucketing on the high bits → equi-join +
    residual BETWEEN, D22's shape). The portable-hash IPs make the
    whole mapping hash-checkable."""
    from ..functions.portable import portable_hash_long

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", portable_hash_long("event_id", "ip|").alias("ip")
    )
    dim = local_df(
        spark,
        list(_CIDR_BLOCKS),
        "block string, lo long, hi long",
    )
    return (
        e.join(
            F.broadcast(dim),
            (F.col("ip") >= F.col("lo")) & (F.col("ip") <= F.col("hi")),
            "left",
        )
        .groupBy(F.coalesce("block", F.lit("unassigned")).alias("block"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("block")
    )


# ---------------------------------------------------------------------------
# D163: Bloom semi-join reduction (hand-built runtime filter)
# ---------------------------------------------------------------------------

_BJ_BITS = 1 << 17  # 128 Ki bits -> 2048 packed longs, KBs on the wire
_BJ_K = 4
_BJ_CUT = "2001-05-01"


def _bj_pos_sql(expr: str) -> list[str]:
    return [
        f"{sql_hash_long(expr, f'bj{i}|')} % {_BJ_BITS}" for i in range(_BJ_K)
    ]


@query(
    "d163_bloom_semijoin_reduction",
    tags=("D163", "A94", "D14"),
    oracle=f"""
    WITH sel AS (
        SELECT o_orderkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_BJ_CUT}'
    ),
    pos AS (
        SELECT DISTINCT pos FROM (
            {" UNION ALL ".join(f"SELECT {h} AS pos FROM sel" for h in _bj_pos_sql("k"))}
        )
    ),
    flags AS (
        SELECT CASE WHEN {" AND ".join(f"({h}) IN (SELECT pos FROM pos)" for h in _bj_pos_sql("l_orderkey"))}
                    THEN 1 ELSE 0 END AS bf,
               CASE WHEN l_orderkey IN (SELECT k FROM sel) THEN 1 ELSE 0 END AS ex
        FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe_total,
           CAST(sum(bf) AS BIGINT) AS n_bloom_pass,
           CAST(sum(ex) AS BIGINT) AS n_joined,
           CAST(sum(bf) - sum(ex) AS BIGINT) AS n_false_pass,
           {sql_round("1.0 - sum(bf) * 1.0 / count(*)", 6)} AS pruned_pct
    FROM flags
    """,
)
def d163_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-built runtime filter (Bloom semi-join reduction): the probe
    side of a selective fact-fact join is pre-filtered by a Bloom
    filter built from the SELECTED build keys, so only ~(selectivity +
    FP rate) of probe rows ever reach the join shuffle — the
    optimization Spark's own runtime bloom filter applies above its
    10 GB scan threshold, expressed portably so the arithmetic is
    hash-checkable and usable below the thresholds too. Scenario:
    lineitem joined to the last-3-months orders (~4% selectivity); the
    output pins total/pass/joined/false-pass counts and the pruned
    fraction, and the no-false-negative guarantee is hash-verified
    (n_joined is computed from bloom SURVIVORS only — a dropped true
    key would shrink it below the oracle's direct count).

    Plan shape: pass 1 folds the selected keys' K bit positions to a
    ≤m-row DISTINCT and collects the 2048-long bitmap (sketch-sized
    driver traffic, the A94/D86 budget class); pass 2 probes map-only
    against the array literal, and the exact-membership flag rides a
    broadcast of the predicate-bounded build keys — the build side is
    small BY CONSTRUCTION (that is the operator's premise; an
    unselective build belongs in a plain D14 join). Bitmap sizing rule:
    keep k*n/m under ~0.5 (here 4*5.8k/128Ki ~ 0.18 at sf0.1 -> FP rate
    <0.1%); a production build scales m with the selected-key count.
    At 100 TB the probe-side saving is the whole point: ~96% of the
    fact never shuffles."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sel = o.filter(
        F.col("o_orderdate") >= F.lit(_BJ_CUT).cast("timestamp")
    ).select(F.col("o_orderkey").alias("k"))

    pos_cols = [
        (portable_hash_long("k", f"bj{i}|") % _BJ_BITS) for i in range(_BJ_K)
    ]
    positions = sel.select(F.explode(F.array(*pos_cols)).alias("pos")).distinct()
    bits = [r[0] for r in positions.collect()]  # bounded: <= m positions
    words = [0] * (_BJ_BITS // 64)
    for pb in bits:
        words[pb // 64] |= 1 << (pb % 64)
    mask = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])

    # fan_out (r15, guide §2.5 input skew): lineitem at test SFs is ONE
    # parquet split, so the 4-hash md5 probe projection serialized on a
    # single task; round-robin the 1-column probe side first. At 100 TB
    # the scan has natural splits and the exchange is noise next to the
    # per-row hashing.
    g = fan_out(li.select("l_orderkey")).withColumn("__mask", mask)
    hit = F.lit(True)
    for i in range(_BJ_K):
        g = g.withColumn(
            f"__p{i}", portable_hash_long("l_orderkey", f"bj{i}|") % _BJ_BITS
        )
        hit = hit & (
            F.expr(
                f"shiftright(element_at(__mask, CAST(__p{i} div 64 AS INT) + 1), "
                f"CAST(__p{i} % 64 AS INT)) & 1"
            )
            == 1
        )
    flagged = (
        g.withColumn("bf", hit.cast("int"))
        .join(
            F.broadcast(sel.withColumn("ex", F.lit(1))),
            g.l_orderkey == F.col("k"),
            "left",
        )
        # exact membership counted ONLY for bloom survivors (bf * ex):
        # this is what makes the no-false-negative claim hash-VERIFIED —
        # a bitmap bug that drops a true key zeroes its ex here and
        # n_joined falls below the oracle's direct membership count
        .select("bf", (F.col("bf") * F.coalesce("ex", F.lit(0))).alias("ex"))
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe_total"),
        F.sum("bf").alias("n_bloom_pass"),
        F.sum("ex").alias("n_joined"),
        (F.sum("bf") - F.sum("ex")).alias("n_false_pass"),
        pround(1.0 - F.sum("bf") / F.count(F.lit(1)), 6).alias("pruned_pct"),
    )


# ---------------------------------------------------------------------------
# D179: longest-prefix-match enrichment (overlapping blocks, most
# specific wins — the GeoIP / routing-table semantics D130 doesn't have)
# ---------------------------------------------------------------------------

# (block, prefix_len, lo, hi) — DELIBERATELY nested: corp contains a dc
# range which contains a rack range; an address inside all three must
# label as the rack (longest prefix), which plain containment (D130)
# cannot express. Ranges are sized so every level matches events at
# every SF (1,000 events at sf0.001).
_LPM_BLOCKS = (
    ("corp/4", 4, 0x00000000, 0x3FFFFFFF),
    ("corp-dc/8", 8, 0x10000000, 0x17FFFFFF),
    ("corp-dc-rack/12", 12, 0x12000000, 0x15FFFFFF),
    ("partner/4", 4, 0x80000000, 0xBFFFFFFF),
    ("partner-vpn/8", 8, 0x90000000, 0x97FFFFFF),
)


@query(
    "d179_longest_prefix_match",
    tags=("D179", "D130", "D20"),
    oracle=f"""
    WITH evt AS (
        SELECT event_id, user_id,
               CAST('0x' || substring(md5('ip|' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS ip
        FROM events
    ),
    dim(block, plen, lo, hi) AS (
        VALUES {", ".join(f"('{n}', {p}, {lo}, {hi})" for n, p, lo, hi in _LPM_BLOCKS)}
    ),
    win AS (
        SELECT e.event_id, e.user_id,
               max(CASE WHEN d.block IS NULL THEN NULL
                        ELSE lpad(CAST(d.plen AS VARCHAR), 2, '0') || '|' || d.block
                   END) AS k
        FROM evt e LEFT JOIN dim d ON e.ip BETWEEN d.lo AND d.hi
        GROUP BY e.event_id, e.user_id
    )
    SELECT CASE WHEN k IS NULL THEN 'unassigned'
                ELSE split_part(k, '|', 2) END AS block,
           CAST(coalesce(max(CAST(substring(k, 1, 2) AS INT)), -1) AS INT)
               AS prefix_len,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM win
    GROUP BY CASE WHEN k IS NULL THEN 'unassigned' ELSE split_part(k, '|', 2) END
    ORDER BY block
    """,
)
def d179_longest_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match enrichment: the block dimension OVERLAPS by
    design (rack ⊂ dc ⊂ corp) and each address labels as its MOST
    SPECIFIC containing block — routing-table / GeoIP semantics, which
    D130's plain containment cannot express (a BETWEEN join would emit
    one row per enclosing block). The winner is max over the padded
    'prefix_len|block' key, so ties (impossible in a well-formed
    hierarchy, but defensive) break lexicographically in both engines.

    Plan shape: candidates come from the D130 broadcast containment
    join (bounded O(blocks) build side, event log never shuffles to
    match); the winner fold is one event-keyed groupBy over the
    candidate stream (<= nesting-depth rows per event), then the block
    rollup. At 100 TB with >10^4 blocks the production swap is D130's
    interval index (prefix bucketing -> equi-join) feeding the same
    winner fold."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", portable_hash_long("event_id", "ip|").alias("ip")
    )
    dim = local_df(
        spark,
        [(n, p, lo, hi) for n, p, lo, hi in _LPM_BLOCKS],
        "block string, plen int, lo long, hi long",
    )
    k = F.when(
        F.col("block").isNotNull(),
        F.concat(F.lpad(F.col("plen").cast("string"), 2, "0"), F.lit("|"), F.col("block")),
    )
    win = (
        e.join(
            F.broadcast(dim),
            (F.col("ip") >= F.col("lo")) & (F.col("ip") <= F.col("hi")),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.max(k).alias("k"))
    )
    return (
        win.groupBy(
            F.coalesce(F.substring_index("k", "|", -1), F.lit("unassigned")).alias(
                "block"
            )
        )
        .agg(
            F.coalesce(
                F.max(F.substring("k", 1, 2).cast("int")), F.lit(-1)
            ).cast("int").alias("prefix_len"),
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("block")
    )

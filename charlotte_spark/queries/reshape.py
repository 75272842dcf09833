"""Relational reshaping + statistical profile operators (SURVEY §2.2
D91/D93).

The reference has no reshaping surface at all — its closest analog is
the fixed per-protocol fan-out of one logical alert into multiple fact
tables (/root/reference/charlotte/__init__.py:473-526), which is a
hand-rolled pivot of the protocol axis. D91 declares the general
operator pair (pivot: long→wide, unpivot: wide→long); D93 declares the
column-profile statistics a curation pipeline runs before mixing
decisions (count/mean/stddev/variance/correlation per stratum).

Scale notes: ``groupBy().pivot(col, values)`` with an EXPLICIT value
list is one ordinary partial-agg shuffle — the values become projected
columns, no extra pass to discover them (never call pivot without the
list at scale: it runs a distinct scan first). ``unpivot`` is a
map-only Expand (rows × measures) with no shuffle. The moment
statistics in D93 are all single-pass mergeable aggregates (Welford /
co-moment merges), so they partial-aggregate map-side like sum/count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.digest import sql_two_level_digest, two_level_digest
from ..functions.portable import pround, sql_round
from ..registry import query

_STATUSES = ("F", "O", "P")


def _status_cases(agg: str) -> str:
    cols = []
    for s in _STATUSES:
        low = s.lower()
        if agg == "n":
            cols.append(
                f"CAST(sum(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {low}_n"
            )
        else:
            expr = sql_round(
                f"coalesce(sum(CASE WHEN o_orderstatus = '{s}' THEN o_totalprice END), 0.0)", 2
            )
            cols.append(f"{expr} AS {low}_total")
    return ",\n           ".join(cols)


@query(
    "d91_pivot",
    tags=("D91",),
    oracle=f"""
    SELECT o_orderpriority,
           {_status_cases("n")},
           {_status_cases("total")}
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def d91_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: order counts and totals per priority × status.

    The status value list is explicit, so the plan is a single
    hash-aggregate over ``o_orderpriority`` with the three statuses as
    projected CASE columns — no value-discovery pass, no extra shuffle
    (the shape the reference hand-rolls for its protocol fan-out)."""
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    out = wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{s}_n"), F.lit(0)).cast("long").alias(f"{s.lower()}_n")
            for s in _STATUSES
        ],
        *[
            F.coalesce(F.col(f"{s}_total"), F.lit(0.0)).alias(f"{s.lower()}_total")
            for s in _STATUSES
        ],
    )
    return out.orderBy("o_orderpriority")


@query(
    "d91_unpivot",
    tags=("D91",),
    oracle=f"""
    WITH agg AS (
        SELECT l_returnflag,
               {sql_round("sum(l_quantity)", 2)} AS sum_qty,
               {sql_round("sum(l_extendedprice)", 2)} AS sum_base,
               {sql_round("sum(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, amount FROM (
        SELECT l_returnflag, 'sum_qty'  AS measure, sum_qty  AS amount FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_base' AS measure, sum_base AS amount FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS amount FROM agg
    )
    ORDER BY l_returnflag, measure
    """,
)
def d91_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): three revenue measures per return flag
    stacked into (key, measure, amount) rows. ``unpivot`` lowers to a
    map-only Expand (3 output rows per input row), zero shuffle beyond
    the feeding aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        pround(F.sum("l_extendedprice"), 2).alias("sum_base"),
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc"
        ),
    )
    long = wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_base", "sum_disc"], "measure", "amount"
    )
    return long.orderBy("l_returnflag", "measure")


@query(
    "d93_summary_stats",
    tags=("D93", "D24"),
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round("avg(l_quantity)", 4)} AS avg_qty,
           {sql_round("stddev_samp(l_quantity)", 4)} AS std_qty,
           {sql_round("var_samp(l_quantity)", 4)} AS var_qty,
           {sql_round("corr(l_quantity, l_discount)", 4)} AS corr_qty_disc,
           {sql_round("covar_samp(l_quantity, l_discount)", 4)} AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d93_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum statistical profile: count, mean, sample
    stddev/variance, and quantity↔discount correlation/covariance.

    Every statistic here is a mergeable moment aggregate, so the plan
    is one partial-agg shuffle exactly like a sum — the profile of a
    100 TB table costs one pass. (Quantile profiles live in A32/D32x.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.avg("l_quantity"), 4).alias("avg_qty"),
            pround(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
            pround(F.var_samp("l_quantity"), 4).alias("var_qty"),
            pround(F.corr("l_quantity", "l_discount"), 4).alias("corr_qty_disc"),
            pround(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d98_scd2_history",
    tags=("D98", "R18", "D34"),
    oracle="""
    WITH obs AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ),
    chg AS (
        SELECT * FROM obs WHERE prev IS NULL OR prev <> o_orderstatus
    ),
    hist AS (
        SELECT o_custkey, o_orderstatus, o_orderdate,
               CAST(row_number() OVER w AS BIGINT) AS version,
               lead(o_orderdate) OVER w AS valid_to_ts
        FROM chg
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderstatus AS status, version,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(CASE WHEN valid_to_ts IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM hist ORDER BY o_custkey, version
    """,
)
def d98_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: per-customer order-status change
    tracking with validity intervals — the slowly-changing-dimension
    extension of the reference's SCD-1 name overwrite
    (/root/reference/charlotte/__init__.py:600-608 keeps only the
    latest sig_class name; type 2 keeps every version with
    [valid_from, valid_to) ranges and an is_current flag).

    Change capture is lag() ≠ current; interval construction is lead()
    over the change rows. Both windows share one partitioning
    (o_custkey), so the whole history build is a SINGLE shuffle — the
    standard one-pass SCD-2 derivation that replaces per-row merge
    statements at 100 TB."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    obs = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    chg = obs.withColumn("prev", F.lag("o_orderstatus").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus"))
    )
    hist = chg.withColumn("version", F.row_number().over(w).cast("long")).withColumn(
        "valid_to_ts", F.lead("o_orderdate").over(w)
    )
    return hist.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        "version",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("valid_to_ts").isNull().cast("long").alias("is_current"),
    ).orderBy("o_custkey", "version")


@query(
    "d112_histogram",
    tags=("D112", "D93"),
    oracle=f"""
    WITH b AS (
        SELECT CAST(least(floor((l_quantity - 1) / 5.0), 9) AS BIGINT) AS bucket
        FROM lineitem
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM b)
    SELECT bucket,
           CAST(bucket * 5 + 1 AS BIGINT) AS lo,
           CAST(bucket * 5 + 5 AS BIGINT) AS hi,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round("count(*) / t", 6)} AS share
    FROM b, tot
    GROUP BY bucket, t ORDER BY bucket
    """,
)
def d112_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram profile of l_quantity (10 buckets of 5) —
    the data-profiling primitive behind skew diagnosis and bin-based
    statistics. One partial-agg shuffle onto ≤10 keys; the bucket
    expression is a pure scan-stage projection, so a 100 TB histogram
    costs one pass with KB-sized shuffle traffic. (Quantile-based
    profiles are A32/D32x; this is the equi-WIDTH companion.)"""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.least(F.floor((F.col("l_quantity") - 1) / 5.0), F.lit(9))
        .cast("long")
        .alias("bucket")
    )
    tot = b.agg(F.count(F.lit(1)).alias("t"))
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.col("bucket") * 5 + 1).cast("long").alias("lo"),
            (F.col("bucket") * 5 + 5).cast("long").alias("hi"),
            "n",
            pround(F.col("n") / F.col("t"), 6).alias("share"),
        )
        .orderBy("bucket")
    )


@query(
    "d113_chi_square",
    tags=("D113", "D93"),
    oracle=f"""
    WITH cells AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p,
               CAST(count(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    rows_m AS (SELECT s, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY s),
    cols_m AS (SELECT p, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY p),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT c.o, (r.rt * 1.0 * m.ct) / t.n AS e
        FROM cells c JOIN rows_m r USING (s) JOIN cols_m m USING (p)
        CROSS JOIN tot t
    )
    SELECT {sql_round("sum((o - e) * (o - e) / e)", 4)} AS chi2,
           CAST((SELECT (count(*) - 1) FROM rows_m)
                * (SELECT (count(*) - 1) FROM cols_m) AS BIGINT) AS dof
    FROM terms
    """,
)
def d113_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence over the order status × priority
    contingency table — the categorical-association statistic a
    curation pipeline uses to detect drift between strata (e.g. source
    vs language mix shifts).

    The contingency table is ONE partial-agg shuffle (|S|×|P| cells);
    margins and expected counts derive from the cells (KB-sized), never
    re-scanning the fact table — at 100 TB the test costs one pass plus
    joins over ≤dozens of rows."""
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows_m = cells.groupBy("s").agg(F.sum("o").alias("rt"))
    cols_m = cells.groupBy("p").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    terms = (
        cells.join(rows_m, "s")
        .join(cols_m, "p")
        .crossJoin(F.broadcast(tot))
        .select(
            "o", ((F.col("rt") * 1.0 * F.col("ct")) / F.col("n")).alias("e")
        )
    )
    # dof stays inside the distributed plan (one 1-row broadcast) rather
    # than eager .count() jobs at construction time; within the single
    # plan the repeated `cells` subtrees share their scan+partial-agg
    # exchange via ReuseExchange, so the test stays one pass as documented.
    dof = cells.agg(
        ((F.count_distinct("s") - F.lit(1)) * (F.count_distinct("p") - F.lit(1)))
        .cast("long")
        .alias("dof")
    )
    return terms.agg(
        pround(F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")), 4).alias(
            "chi2"
        ),
    ).crossJoin(F.broadcast(dof))


@query(
    "d114_grouped_regression",
    tags=("D114", "D93"),
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
           {sql_round("regr_intercept(l_extendedprice, l_quantity)", 4)} AS intercept,
           {sql_round("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d114_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum ordinary least squares: price-on-quantity slope,
    intercept, and R² per return flag — the grouped-regression
    analytics shape (trend per segment) as a single aggregate pass.

    regr_slope/regr_intercept/regr_r2 are co-moment aggregates (the
    same merge algebra as D93's corr/covar), so the whole fit is ONE
    partial-agg shuffle — no per-group solver, no iteration; a 100 TB
    per-segment trend fit costs exactly one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            pround(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept"
            ),
            pround(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# D121: CDC snapshot diff (full-row-digest change classification)
# ---------------------------------------------------------------------------


@query(
    "d121_snapshot_diff",
    tags=("D121", "D98", "D14"),
    oracle=f"""
    WITH snap_a AS (
        SELECT o_orderkey AS k,
               md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
                   || CAST(o_orderdate AS VARCHAR) || '|' || o_orderpriority) AS digest
        FROM orders WHERE o_orderkey % 13 <> 0
    ),
    snap_b AS (
        SELECT o_orderkey AS k,
               md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
                   || CAST(o_orderdate AS VARCHAR) || '|' || o_orderpriority
                   || CASE WHEN o_orderkey % 7 = 0 THEN 'x' ELSE '' END) AS digest
        FROM orders WHERE o_orderkey % 11 <> 0
    ),
    classified AS (
        SELECT coalesce(a.k, b.k) AS k,
               CASE WHEN a.k IS NULL THEN 'insert'
                    WHEN b.k IS NULL THEN 'delete'
                    WHEN a.digest <> b.digest THEN 'update'
                    ELSE 'unchanged' END AS op
        FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
    )
    SELECT n_inserted, n_deleted, n_updated, n_unchanged, upd_keys_md5
    FROM ({sql_two_level_digest(
        "classified",
        [],
        "CASE WHEN op = 'update' THEN CAST(k AS VARCHAR) END",
        count_alias="_n_rows",
        digest_alias="upd_keys_md5",
        sum_exprs={
            "n_inserted": "CASE WHEN op = 'insert' THEN 1 ELSE 0 END",
            "n_deleted": "CASE WHEN op = 'delete' THEN 1 ELSE 0 END",
            "n_updated": "CASE WHEN op = 'update' THEN 1 ELSE 0 END",
            "n_unchanged": "CASE WHEN op = 'unchanged' THEN 1 ELSE 0 END",
        },
    )})
    """,
)
def d121_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: two synthesized snapshots of ``orders``
    (A drops every 13th key; B drops every 11th and mutates the order
    priority of every 7th) are reconciled into insert/delete/update/unchanged
    classes by FULL OUTER join on the key with full-row md5 digests —
    the change-data-capture primitive that feeds the D98 SCD-2 builder,
    done the only way that scales: digest compare, never column-by-
    column predicates over wide rows. The updated-key set is verified
    by an order-insensitive digest (md5 over the sorted key list), so
    classification — not just the counts — is hash-checked.

    Plan shape: digests are scan-stage projections (map-only); the diff
    is ONE key-keyed shuffle join of the two snapshots; the rollup is a
    1-row aggregate. At 100 TB both snapshots would be bucketed by key
    on write (D84's layout), making the diff join shuffle-free."""
    digest_cols = [
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("string"),
    ]

    def snapshot(mutate: bool) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        priority = (
            F.when(
                F.col("o_orderkey") % 7 == 0, F.concat("o_orderpriority", F.lit("x"))
            ).otherwise(F.col("o_orderpriority"))
            if mutate
            else F.col("o_orderpriority")
        )
        drop_mod = 11 if mutate else 13
        return o.filter(F.col("o_orderkey") % drop_mod != 0).select(
            F.col("o_orderkey").alias("k"),
            F.md5(F.concat_ws("|", *digest_cols, priority)).alias("digest"),
        )

    a = snapshot(mutate=False).select(F.col("k").alias("ak"), F.col("digest").alias("ad"))
    b = snapshot(mutate=True).select(F.col("k").alias("bk"), F.col("digest").alias("bd"))
    op = (
        F.when(F.col("ak").isNull(), "insert")
        .when(F.col("bk").isNull(), "delete")
        .when(F.col("ad") != F.col("bd"), "update")
        .otherwise("unchanged")
    )
    classified = a.join(b, F.col("ak") == F.col("bk"), "full_outer").select(
        F.coalesce("ak", "bk").alias("k"),
        op.alias("op"),
    )
    # Two-level digest (functions/digest.py): the update-key roster is
    # ~1/7 of the table — corpus-scale, never one reducer's buffer.
    # Non-update rows carry a NULL payload: counted, not digested.
    cls = classified.select(
        F.when(F.col("op") == "update", F.col("k").cast("string")).alias("uk"),
        (F.col("op") == "insert").cast("long").alias("i"),
        (F.col("op") == "delete").cast("long").alias("d"),
        (F.col("op") == "update").cast("long").alias("u"),
        (F.col("op") == "unchanged").cast("long").alias("s"),
    )
    return two_level_digest(
        cls,
        [],
        F.col("uk"),
        count_alias="_n_rows",
        digest_alias="upd_keys_md5",
        sum_cols={"n_inserted": "i", "n_deleted": "d", "n_updated": "u", "n_unchanged": "s"},
    ).select("n_inserted", "n_deleted", "n_updated", "n_unchanged", "upd_keys_md5")


# ---------------------------------------------------------------------------
# D132: join-key skew profile (the diagnostic behind D87's salting)
# ---------------------------------------------------------------------------


@query(
    "d132_skew_profile",
    tags=("D132", "D87", "A32"),
    oracle=f"""
    WITH per_key AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_cnt,
           {sql_round("avg(c)", 6)} AS avg_cnt,
           {sql_round("median(c)", 6)} AS p50_cnt,
           {sql_round("quantile_cont(c, 0.99)", 6)} AS p99_cnt,
           {sql_round("max(c) / avg(c)", 6)} AS skew_ratio,
           CAST(min(CASE WHEN c = (SELECT max(c) FROM per_key)
                         THEN o_custkey END) AS BIGINT) AS hottest_key
    FROM per_key
    """,
)
def d132_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders.o_custkey — the diagnostic a
    100 TB operator runs BEFORE picking a join strategy: per-key
    frequencies reduced to max/avg/median/p99 and the max-to-mean skew
    ratio, plus the hottest key itself. This statistic is what decides
    between a plain shuffle join, AQE skew splitting, and explicit
    salting (D87 implements the remedy; this measures the disease).

    Plan shape: one partial-agg shuffle onto the key builds per-key
    counts; the profile is a single 1-row aggregate over the O(keys)
    count table (exact percentiles are sort-based and deterministic).
    At 100 TB the count table is the only intermediate and it is
    O(distinct keys), never O(rows)."""
    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_cnt"),
        pround(F.avg("c"), 6).alias("avg_cnt"),
        pround(F.percentile("c", F.lit(0.5)), 6).alias("p50_cnt"),
        pround(F.percentile("c", F.lit(0.99)), 6).alias("p99_cnt"),
        pround(F.max("c") / F.avg("c"), 6).alias("skew_ratio"),
        F.min_by("o_custkey", F.struct(-F.col("c"), F.col("o_custkey")))
        .cast("long")
        .alias("hottest_key"),
    )


# ---------------------------------------------------------------------------
# D133: equi-depth quantile statistics (the ANALYZE/CBO histogram shape)
# ---------------------------------------------------------------------------


@query(
    "d133_equidepth_stats",
    tags=("D133", "D112", "A32"),
    oracle=f"""
    WITH q AS (
        SELECT quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5,
                                            0.6, 0.7, 0.8, 0.9]) AS qs,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
    )
    SELECT t.i / 10.0 AS pct,
           {sql_round("q.qs[t.i]", 6)} AS boundary,
           q.n AS n_rows
    FROM q, range(1, 10) t(i)
    ORDER BY pct
    """,
)
def d133_equidepth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) decile boundaries of orders.o_totalprice
    — the histogram a cost-based optimizer's ANALYZE builds (D112 is
    the fixed-WIDTH profile; this is the fixed-DEPTH one that stays
    informative under heavy tails). Exact interpolated quantiles, so
    the boundaries hash-check across engines.

    Plan shape: ONE aggregate computes the whole decile vector
    (Spark's percentile with an array argument — a single sort-based
    agg, not nine), then a 9-row posexplode of the result. At 100 TB
    the exact form becomes approx_percentile with the identical
    plumbing (A32's accuracy-bounded path)."""
    q = load_table(spark, sf_dir, "orders").agg(
        F.percentile(
            "o_totalprice",
            F.array(*[F.lit(p / 10.0) for p in range(1, 10)]),
        ).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        q.select(F.posexplode("qs").alias("i", "boundary"), "n")
        .select(
            ((F.col("i") + 1) / 10.0).alias("pct"),
            pround("boundary", 6).alias("boundary"),
            F.col("n").alias("n_rows"),
        )
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# D136: batch MERGE (upsert) — correctness proven by round-trip
# ---------------------------------------------------------------------------


@query(
    "d136_merge_upsert",
    tags=("D136", "D121", "D98"),
    oracle=sql_two_level_digest(
        """(
        SELECT o_orderkey AS k,
               md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
                   || CAST(o_orderdate AS VARCHAR) || '|' || o_orderpriority
                   || CASE WHEN o_orderkey % 7 = 0 THEN 'x' ELSE '' END) AS digest
        FROM orders WHERE o_orderkey % 11 <> 0
    )""",
        [],
        "CAST(k AS VARCHAR) || '=' || digest",
        count_alias="n_rows",
        digest_alias="table_md5",
    ),
)
def d136_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (upsert + delete) with round-trip-proven semantics:
    derive D121's SPARSE change feed (only the inserts, updates and
    deletes classified between snapshots A and B — unchanged rows are
    NOT in the feed), apply it to snapshot A, and the result must equal
    snapshot B row-for-row, which the oracle checks by computing B's
    count and keyed digest DIRECTLY, never seeing the merge. Because
    the feed is sparse, the overwhelming majority of output rows can
    only come from the TARGET surviving an unmatched-by-source branch —
    an implementation that ignores the target fails the digest. This is
    the WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED
    INSERT statement lakehouse tables run constantly, expressed as the
    join Spark lowers it to.

    Plan shape: one full-outer join derives the feed (digests computed
    scan-stage, as D121), one full-outer join applies it, row-wise CASE
    picks the surviving version, and the verification digest is a
    single ordered fold. At 100 TB both sides are bucketed by key
    (D84's layout) and the merge join is shuffle-free; the row-level
    semantics are byte-identical to Delta/Iceberg MERGE on the same
    classes."""
    digest_cols = [
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("string"),
    ]

    def snapshot(mutate: bool) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        priority = (
            F.when(
                F.col("o_orderkey") % 7 == 0, F.concat("o_orderpriority", F.lit("x"))
            ).otherwise(F.col("o_orderpriority"))
            if mutate
            else F.col("o_orderpriority")
        )
        drop_mod = 11 if mutate else 13
        return o.filter(F.col("o_orderkey") % drop_mod != 0).select(
            F.col("o_orderkey").alias("k"),
            F.md5(F.concat_ws("|", *digest_cols, priority)).alias("digest"),
        )

    a = snapshot(mutate=False).select(
        F.col("k").alias("ak"), F.col("digest").alias("ad")
    )
    b = snapshot(mutate=True).select(
        F.col("k").alias("bk"), F.col("digest").alias("bd")
    )
    # D121's sparse change feed: inserts (B-only), deletes (A-only),
    # updates (in both, digest changed). Unchanged rows never enter it.
    feed = (
        a.join(b, F.col("ak") == F.col("bk"), "full_outer")
        .filter(
            F.col("ak").isNull()
            | F.col("bk").isNull()
            | (F.col("ad") != F.col("bd"))
        )
        .select(
            F.coalesce("bk", "ak").alias("ck"),
            F.when(F.col("bk").isNull(), F.lit("D"))
            .when(F.col("ak").isNull(), F.lit("I"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("bd").alias("cd"),
        )
    )
    # MERGE: matched U -> update, matched D -> delete, unmatched feed
    # row (I) -> insert, target row with no feed row -> survives as-is.
    target = snapshot(mutate=False).select(
        F.col("k").alias("tk"), F.col("digest").alias("td")
    )
    merged = (
        target.join(feed, F.col("tk") == F.col("ck"), "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("tk", "ck").alias("k"),
            F.coalesce("cd", "td").alias("digest"),
        )
    )
    # Two-level digest (functions/digest.py): the merged table is
    # corpus-scale — the verification fold must never buffer it on one
    # reducer. The key=digest payload binds each row to its key, so
    # multiset (order-free) semantics lose nothing vs the old k-order.
    return two_level_digest(
        merged,
        [],
        F.concat(F.col("k").cast("string"), F.lit("="), F.col("digest")),
        count_alias="n_rows",
        digest_alias="table_md5",
    )


# ---------------------------------------------------------------------------
# D153: point-in-time (time-travel) query over SCD2 history
# ---------------------------------------------------------------------------

_PIT_TS = "1998-01-01 00:00:00"


@query(
    "d153_time_travel",
    tags=("D153", "D98", "D21"),
    oracle=f"""
    WITH obs AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ),
    chg AS (
        SELECT * FROM obs WHERE prev IS NULL OR prev <> o_orderstatus
    ),
    pit AS (
        SELECT o_custkey, o_orderstatus,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM chg WHERE o_orderdate <= TIMESTAMP '{_PIT_TS}'
    )
    SELECT n_customers, state_md5
    FROM ({sql_two_level_digest(
        "(SELECT o_custkey, o_orderstatus FROM pit WHERE rn = 1)",
        [],
        "CAST(o_custkey AS VARCHAR) || '=' || o_orderstatus",
        count_alias="n_customers",
        digest_alias="state_md5",
    )})
    """,
)
def d153_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) query: reconstruct the per-customer
    status table AS OF 1998-01-01 from the D98 SCD2 history by interval
    containment (valid_from <= T < valid_to) and digest it — the 'what
    did the dimension say when the model trained' query that makes ML
    features reproducible. Correctness is round-trip-proven (the D136
    pattern): the oracle never sees the intervals — it recomputes the
    same state DIRECTLY as each customer's latest change row at or
    before T, so interval construction and interval lookup verify each
    other.

    Plan shape: the history build is D98's single o_custkey window
    pass; the as-of filter is a pure projection over it (no join — the
    snapshot IS a filter when you store intervals), and the digest is
    one ordered fold. At 100 TB this is why SCD2 beats snapshot
    copies: any T is a filter on one table, not a restore."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    obs = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    chg = obs.withColumn("prev", F.lag("o_orderstatus").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus"))
    )
    hist = chg.withColumn("valid_to_ts", F.lead("o_orderdate").over(w))
    t = F.lit(_PIT_TS).cast("timestamp")
    state = hist.filter(
        (F.col("o_orderdate") <= t)
        & (F.col("valid_to_ts").isNull() | (F.col("valid_to_ts") > t))
    )
    # Two-level digest (functions/digest.py): the as-of state is one
    # row per customer — corpus-scale, never one reducer's buffer.
    return two_level_digest(
        state,
        [],
        F.concat(F.col("o_custkey").cast("string"), F.lit("="), F.col("o_orderstatus")),
        count_alias="n_customers",
        digest_alias="state_md5",
    )


# ---------------------------------------------------------------------------
# D161: incremental rollup maintenance (append-only materialized view)
# ---------------------------------------------------------------------------

_IVM_CUT = "1997-06-01"


@query(
    "d161_incremental_rollup",
    tags=("D161", "D136", "D24"),
    oracle=f"""
    WITH full_roll AS (
        SELECT o_orderstatus AS s, o_custkey % 100 AS b, count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY s, b
    )
    SELECT s,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_rows,
           {sql_round("sum(cents) / 100.0", 2)} AS total,
           md5(string_agg(CAST(b AS VARCHAR) || '=' || CAST(n AS VARCHAR)
                          || ':' || CAST(cents AS VARCHAR),
                          ',' ORDER BY b)) AS partials_md5
    FROM full_roll GROUP BY s ORDER BY s
    """,
)
def d161_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance, append-only case: the
    base rollup (orders before {cut}) is a persisted aggregate; the
    delta (orders at/after {cut}) arrives later and is folded in by
    MERGING PARTIAL AGGREGATES on the group key — count and sum are
    associative, so base + delta partials combine without ever
    re-scanning base facts. The oracle computes the rollup over the
    FULL table directly and never sees the merge (the D136 round-trip
    proof), so a wrong merge, a dropped bucket, or double-counting all
    hash-mismatch. This is the refresh path every lakehouse
    materialized view / streaming rollup takes (Spark's own streaming
    aggregation state IS this merge).

    Plan shape: two partial-agg groupBys (base, delta — in production
    the base one is a table read, not a scan) and one keyed merge
    groupBy over |keys| rows. The per-bucket partials fold into a
    per-status digest so the driver hash pins every bucket. At 100 TB
    the delta scan is the only fact-sized input per refresh — the
    whole point of IVM."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit(_IVM_CUT).cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        # per-row cents conversion makes partials EXACT integers —
        # order-independent sums, digest-stable across engines (double
        # sums differ by ulps between aggregation orders)
        return df.groupBy(
            F.col("o_orderstatus").alias("s"),
            (F.col("o_custkey") % 100).alias("b"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )

    base = rollup(o.filter(F.col("o_orderdate") < cut))
    delta = rollup(o.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("s", "b")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    pairs = F.transform(
        F.array_sort(F.collect_list(F.struct("b", "n", "cents"))),
        lambda r: F.concat(
            r["b"].cast("string"),
            F.lit("="),
            r["n"].cast("string"),
            F.lit(":"),
            r["cents"].cast("string"),
        ),
    )
    return (
        merged.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n").alias("n_rows"),
            pround(F.sum("cents") / 100.0, 2).alias("total"),
            F.md5(F.concat_ws(",", pairs)).alias("partials_md5"),
        )
        .orderBy("s")
    )


d161_incremental_rollup.__doc__ = d161_incremental_rollup.__doc__.format(cut=_IVM_CUT)


# ---------------------------------------------------------------------------
# D174: mergeable moment partials (incremental statistics maintenance)
# ---------------------------------------------------------------------------


@query(
    "d174_mergeable_moments",
    tags=("D174", "D161", "D93"),
    oracle=f"""
    WITH m AS (
        SELECT o_orderstatus AS s,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc,
               sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
                   * CAST(round(o_totalprice * 100) AS BIGINT)) AS sq
        FROM orders GROUP BY s
    )
    SELECT s,
           CAST(n AS BIGINT) AS n_rows,
           {sql_round("CAST(sc AS DOUBLE) / n / 100.0", 4)} AS mean_price,
           {sql_round(
               "sqrt((CAST(sq AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n) / n) / 100.0",
               4)} AS stddev_price,
           md5(CAST(n AS VARCHAR) || ':' || CAST(sc AS VARCHAR)
               || ':' || CAST(sq AS VARCHAR)) AS partials_md5
    FROM m ORDER BY s
    """,
)
def d174_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental statistics maintenance: per-group moment PARTIALS
    (count, Σx, Σx²) computed separately over the base (orders before
    {cut}) and the delta (at/after), then MERGED by addition — the
    Chan-et-al parallel-moments identity that lets a profiling service
    refresh mean/stddev without re-scanning history (D161's IVM story
    lifted from sums to second moments, feeding D93's profile). The
    partials are EXACT integers — prices convert to cents per row, and
    Σx² accumulates in 128-bit (decimal(38,0) / HUGEINT; cents² at
    corpus row counts overflows int64) — so the merged partials are
    bit-identical in any aggregation order and the partials_md5 digest
    pins every component. The oracle computes the same moments over
    the FULL table and never sees the merge (the D136/D161 proof):
    double-counting, a dropped side, or 64-bit Σx² overflow all
    hash-mismatch. mean/stddev derive from the exact integers in
    IEEE doubles, identical in both engines.

    Plan shape: two partial-agg scans (base is a stored aggregate in
    production — only the delta is fact-sized per refresh) + one merge
    groupBy over O(groups) partial rows."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit(_IVM_CUT).cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderstatus").alias("s")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sc"),
            F.sum(cents.cast("decimal(19,0)") * cents).alias("sq"),
        )

    base = partials(o.filter(F.col("o_orderdate") < cut))
    delta = partials(o.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("s")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sc").alias("sc"),
            F.sum("sq").alias("sq"),
        )
    )
    scd = F.col("sc").cast("double")
    sqd = F.col("sq").cast("double")
    n = F.col("n")
    return merged.select(
        "s",
        F.col("n").alias("n_rows"),
        pround(scd / n / 100.0, 4).alias("mean_price"),
        pround(F.sqrt((sqd - scd * F.col("sc") / n) / n) / 100.0, 4).alias(
            "stddev_price"
        ),
        F.md5(
            F.concat_ws(
                ":",
                F.col("n").cast("string"),
                F.col("sc").cast("string"),
                F.col("sq").cast("decimal(38,0)").cast("string"),
            )
        ).alias("partials_md5"),
    ).orderBy("s")


d174_mergeable_moments.__doc__ = d174_mergeable_moments.__doc__.format(cut=_IVM_CUT)


# ---------------------------------------------------------------------------
# D218: shuffle-salting planner (actionable per-key salt factors)
# ---------------------------------------------------------------------------

_D218_TARGET_TASKS = 128  # balance target: no (key, salt) bucket above total/128


@query(
    "d218_salt_planner",
    tags=("D218", "D87", "D132"),
    oracle=f"""
    WITH g AS (
        SELECT l_suppkey AS key, count(*) AS n
        FROM lineitem GROUP BY l_suppkey
    ),
    t AS (
        SELECT key, n, sum(n) OVER () AS total,
               greatest(1.0, ceil(sum(n) OVER () / {float(_D218_TARGET_TASKS)}))
                   AS cap
        FROM g
    )
    SELECT CAST(key AS BIGINT) AS key, CAST(n AS BIGINT) AS n,
           {sql_round("n * 1.0 / total", 6)} AS share,
           CAST(ceil(n / cap) AS INT) AS salt_factor,
           CAST(ceil(n / ceil(n / cap)) AS BIGINT) AS max_per_bucket
    FROM t ORDER BY n DESC, key
    """,
)
def d218_salt_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-salting PLANNER: D132 profiles key skew and D87 executes
    a salted join — this row closes the loop with the artifact an
    operator actually feeds a pipeline config: per join key, the salt
    factor that caps every (key, salt) shuffle bucket at
    total/{_D218_TARGET_TASKS} rows, plus the projected post-salt
    bucket size. salt_factor = ceil(n / cap) means a uniform key stays
    at 1 (no replication cost) while a hot key is split just enough to
    restore balance — the replication-factor-vs-balance tradeoff made
    explicit and queryable.

    Plan shape: ONE groupBy(key) shuffle to O(keys) rows, then the
    total rides a whole-partition window frame over the GROUPED frame
    (O(keys) rows — bounded by the supplier dimension, never the fact
    table) and everything else is scalar arithmetic on the key row.
    At 100 TB the fact scan + map-side-combined count dominate; the
    planner output is KB-scale and broadcastable straight back into a
    D87-style salted join."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # bounded: whole-partition frame over the O(keys) grouped frame
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = g.select(
        "key",
        "n",
        F.sum("n").over(w).alias("total"),
        F.greatest(
            F.lit(1.0),
            F.ceil(F.sum("n").over(w) / F.lit(float(_D218_TARGET_TASKS))).cast(
                "double"
            ),
        ).alias("cap"),
    )
    salt = F.ceil(F.col("n") / F.col("cap"))
    return t.select(
        F.col("key").cast("long").alias("key"),
        F.col("n").cast("long").alias("n"),
        pround(F.col("n") / F.col("total"), 6).alias("share"),
        salt.cast("int").alias("salt_factor"),
        F.ceil(F.col("n") / salt).cast("long").alias("max_per_bucket"),
    ).orderBy(F.col("n").desc(), "key")

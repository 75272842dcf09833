"""Event-sequence analytics over the events table (SURVEY §2.2
D103/D104/D111).

The funnel and cohort-retention shapes every product/telemetry
warehouse runs — and, for this engine's security lineage, the same
computation as attack-chain staging (recon → exploit → exfil within a
bound) and sensor-population retention. The reference's closest analog
is its per-sensor event sequencing (R19); these operators declare the
general multi-stage form.

Scale notes: both lower to ONE groupBy shuffle on user_id (funnel:
conditional min-timestamps per stage, then stage predicates composed
row-wise; retention: first-activity cohort joined back by key). No
self-joins over the event log, no window over the full stream — the
event table is touched once per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round
from ..registry import query

_FUNNEL_DAYS = 7


@query(
    "d103_conversion_funnel",
    tags=("D103", "D28"),
    oracle=f"""
    WITH stages AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
        FROM events GROUP BY user_id
    ),
    flags AS (
        SELECT user_id,
               CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS s1,
               CASE WHEN t1 IS NOT NULL AND t2 > t1
                     AND t2 <= t1 + INTERVAL {_FUNNEL_DAYS} DAY THEN 1 ELSE 0 END AS s2,
               CASE WHEN t1 IS NOT NULL AND t2 > t1
                     AND t2 <= t1 + INTERVAL {_FUNNEL_DAYS} DAY
                     AND t3 > t2
                     AND t3 <= t1 + INTERVAL {_FUNNEL_DAYS} DAY THEN 1 ELSE 0 END AS s3
        FROM stages
    )
    SELECT CAST(sum(s1) AS BIGINT) AS n_signup,
           CAST(sum(s2) AS BIGINT) AS n_click,
           CAST(sum(s3) AS BIGINT) AS n_purchase,
           {sql_round("sum(s3) * 1.0 / nullif(sum(s1), 0)", 6)} AS conversion
    FROM flags
    """,
)
def d103_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase within a
    7-day window of the first signup. Stage k counts users whose
    EARLIEST stage-k event strictly follows their stage-(k−1) entry
    and lands inside the window — the standard first-touch funnel.

    One conditional-min aggregate per user (map-side partial), then
    pure row-wise stage predicates: the event log is scanned once and
    shuffled once, never self-joined — at 100 TB the funnel costs the
    same as a count per user."""
    e = load_table(spark, sf_dir, "events")
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t2"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t3"),
    )
    lim = F.col("t1") + F.expr(f"INTERVAL {_FUNNEL_DAYS} DAYS")
    s1 = F.col("t1").isNotNull()
    s2 = s1 & (F.col("t2") > F.col("t1")) & (F.col("t2") <= lim)
    s3 = s2 & (F.col("t3") > F.col("t2")) & (F.col("t3") <= lim)
    flags = stages.select(
        s1.cast("int").alias("s1"), s2.cast("int").alias("s2"), s3.cast("int").alias("s3")
    )
    return flags.agg(
        F.sum("s1").alias("n_signup"),
        F.sum("s2").alias("n_click"),
        F.sum("s3").alias("n_purchase"),
        pround(F.sum("s3") / F.nullif(F.sum("s1"), F.lit(0)), 6).alias("conversion"),
    )


@query(
    "d104_cohort_retention",
    tags=("D104", "D45"),
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    cohorts AS (
        SELECT user_id,
               date_trunc('week', first_ts) AS cohort_week
        FROM firsts
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               c.cohort_week,
               CAST(floor(date_diff('day', c.cohort_week, date_trunc('week', e.ts)) / 7.0) AS BIGINT) AS week_k
        FROM events e JOIN cohorts c USING (user_id)
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_k,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    GROUP BY cohort_week, week_k
    ORDER BY cohort_week, week_k
    """,
)
def d104_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-activity
    week; n_active counts distinct cohort members active k weeks later.

    Two aggregates on the SAME user_id key (first-activity, then
    distinct user-week) with the cohort map joined back by that key —
    the cohort table is O(users) and the event log shuffles once; at
    100 TB the cohort join is the already-partitioned side, no log
    self-join."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohorts = firsts.select(
        "user_id", F.date_trunc("week", "first_ts").alias("cohort_week")
    )
    activity = (
        e.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7.0
            )
            .cast("long")
            .alias("week_k"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"), "week_k"
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_k")
    )


@query(
    "d111_session_paths",
    tags=("D111", "D55", "D29"),
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 300000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    ),
    paths AS (
        SELECT user_id, session_id,
               array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 8), '>') AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM paths GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
)
def d111_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining (journey analysis): per 5-minute-gap session,
    the ordered sequence of event types (truncated to 8 steps), ranked
    by frequency — the sequence-mining shape behind funnel discovery
    and, in the reference's domain, attack-chain pattern surfacing.

    Sessionization is the d55 gaps-and-islands window (one user_id
    shuffle); path construction is collect_list + array_sort per
    session key (the same shuffle's aggregation side); the top-10 is
    TakeOrdered over the already-aggregated path counts."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # microsecond-exact gap test (ts.cast('long') truncates to seconds
    # and would disagree with the oracle's epoch_us diff on sub-second
    # boundaries)
    # NTZ → TZ cast is the identity under the pinned UTC session TZ;
    # unix_micros only accepts TIMESTAMP
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_s = (us - F.lag(us).over(w) > 300_000_000) | F.lag("ts").over(w).isNull()
    sess = e.withColumn("session_id", F.sum(new_s.cast("int")).over(run))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                8,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "d115_ohlc_downsample",
    tags=("D115", "D53", "D30"),
    oracle=f"""
    WITH keyed AS (
        SELECT *, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
                  lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
        FROM events
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_hour,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round("arg_min(value, k)", 4)} AS open,
           {sql_round("max(value)", 4)} AS high,
           {sql_round("min(value)", 4)} AS low,
           {sql_round("arg_max(value, k)", 4)} AS close
    FROM keyed
    GROUP BY 1 ORDER BY bar_hour
    """,
)
def d115_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to hourly OHLC bars (open = value at
    the earliest (ts, event_id) in the bar, close at the latest) — the
    resampling primitive behind metrics dashboards and market data.

    open/close are min_by/max_by over a zero-padded (epoch_us,
    event_id) string key — UNIQUE, so the bars are deterministic even
    under timestamp ties (DuckDB's arg_min can't take composite keys;
    lexicographic order of the padded string equals numeric order) —
    and the whole downsample is ONE partial-agg shuffle on the bar key:
    no window over the raw stream, no self-join; 100 TB of ticks reduce
    map-side to |bars| rows."""
    e = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bar_hour"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.min_by("value", key), 4).alias("open"),
            pround(F.max("value"), 4).alias("high"),
            pround(F.min("value"), 4).alias("low"),
            pround(F.max_by("value", key), 4).alias("close"),
        )
        .orderBy("bar_hour")
    )


# ---------------------------------------------------------------------------
# D119: exponentially-weighted moving average (truncated, per user)
# ---------------------------------------------------------------------------

_EWMA_DECAY = 0.8  # (1 - alpha) for alpha = 0.2
_EWMA_SPAN = 50  # truncation: only the latest 50 events carry weight


@query(
    "d119_ewma_smoothing",
    tags=("D119", "D34", "D36"),
    oracle=f"""
    WITH r AS (
        SELECT user_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id,
           CAST(any_value(n) AS BIGINT) AS n_events,
           {sql_round(f"sum(value * power({_EWMA_DECAY}, rn - 1)) / sum(power({_EWMA_DECAY}, rn - 1))", 6)} AS ewma
    FROM r WHERE rn <= {_EWMA_SPAN}
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def d119_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the event
    value at the stream head (alpha = 0.2, normalized weights), the
    standard time-decayed feature for behavioral/telemetry models.
    Weights are truncated to the latest 50 events: the dropped tail
    carries < 0.8^50 ≈ 1.4e-5 of the mass, and truncation keeps the
    weight exponent bounded — the untruncated prefix-sum trick needs
    0.8^(-n), which overflows for long histories.

    Plan shape: ONE window shuffle on user_id assigns recency ranks,
    then a partial-agg groupBy on the same key computes the weighted
    sums — Catalyst reuses the window's hash partitioning, so the
    event log moves once. No collect_list: the weighted fold is two
    scalar sums, not an array build."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
    ).filter(F.col("rn") <= _EWMA_SPAN)
    wt = F.pow(F.lit(_EWMA_DECAY), F.col("rn") - 1)
    return (
        r.groupBy("user_id")
        .agg(
            F.any_value("n").cast("long").alias("n_events"),
            pround(F.sum(F.col("value") * wt) / F.sum(wt), 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# D120: robust anomaly detection (median/MAD z-scores per group)
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # MAD -> sigma consistency constant for normal data
_MAD_CUT = 3.5  # Iglewicz-Hoaglin modified z-score threshold


@query(
    "d120_robust_anomalies",
    tags=("D120", "A32", "D24"),
    oracle=f"""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS d, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(d) AS mad FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           {sql_round("any_value(dev.med)", 6)} AS med,
           {sql_round("any_value(mad.mad)", 6)} AS mad,
           CAST(sum(CASE WHEN dev.d > {_MAD_CUT} * {_MAD_K} * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    ORDER BY dev.event_type
    """,
)
def d120_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: modified z-score
    |x − median| / (1.4826 · MAD) > 3.5 (Iglewicz & Hoaglin) — the
    median/MAD pair is immune to the very outliers it flags, unlike
    mean/stddev z-scores. Exact medians via sort-based percentile make
    the whole statistic order-insensitive, so it hash-checks with no
    float-summation caveats.

    Plan shape: grouped exact percentiles need the values per key —
    three passes over the event log (median, MAD, flag count), each a
    partial-agg or broadcast-join stage keyed on the LOW-cardinality
    event_type. At 100 TB the two median passes would swap to
    approx_percentile sketches (A32's path) with identical plumbing;
    the exact form is the oracle-checkable baseline."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("d"), "med"
    )
    mad = dev.groupBy("event_type").agg(F.percentile("d", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.any_value("med"), 6).alias("med"),
            pround(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                (F.col("d") > _MAD_CUT * _MAD_K * F.col("mad")).cast("int")
            ).cast("long").alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# D154: session bounce rate + dwell time by entry type
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 300_000_000  # same 5-minute inactivity gap as D111


@query(
    "d154_bounce_dwell",
    tags=("D154", "D111", "D35"),
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS e,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER uw
                         > {_SESSION_GAP_US}
                         OR lag(epoch_us(ts)) OVER uw IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS sid
        FROM marked
    ),
    sess AS (
        SELECT user_id, sid,
               count(*) AS n_events,
               (max(e) - min(e)) / 1000000.0 AS dwell_sec,
               max(CASE WHEN is_new = 1 THEN event_type END) AS entry_type
        FROM numbered GROUP BY user_id, sid
    )
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           {sql_round("sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / count(*)", 6)}
               AS bounce_rate,
           {sql_round("avg(dwell_sec)", 2)} AS avg_dwell_sec
    FROM sess GROUP BY entry_type ORDER BY entry_type
    """,
)
def d154_bounce_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate and dwell time by entry event type: sessions
    are 5-minute-inactivity-gap windows (D111's definition), a bounce
    is a single-event session, and dwell is last-minus-first event time
    — the engagement readout next to D111's path analysis and D104's
    retention.

    Plan shape: gap-marking and session numbering are two stacked
    windows on ONE user_id partitioning (lag, then running sum — no
    second exchange); per-session rollup groups on (user_id, sid),
    which is a REFINEMENT of the window partitioning, so the rows don't
    move again; the entry type is min_by over the session (no
    sort-within-group). The final per-type rollup is O(sessions). One
    scan, one event-scale shuffle, end to end.

    Determinism note: every ordered window carries the (e, event_id)
    total order — same-microsecond events of one user are tie-broken by
    event_id on BOTH engines — and the entry type is the event whose
    is_new flag is 1 (exactly one per session by construction), so no
    min_by tie axis exists at all."""
    e = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "event_id",
        us.alias("e"),
        (
            ((us - F.lag(us).over(uw)) > _SESSION_GAP_US)
            | F.lag("ts").over(uw).isNull()
        )
        .cast("int")
        .alias("is_new"),
    )
    numbered = marked.select(
        "*",
        F.sum("is_new")
        .over(
            W.partitionBy("user_id")
            .orderBy("e", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("sid"),
    )
    sess = numbered.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max("e") - F.min("e")) / 1_000_000.0).alias("dwell_sec"),
        F.max(F.when(F.col("is_new") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        sess.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounces.cast("long").alias("n_bounces"),
            pround(bounces * 1.0 / F.count(F.lit(1)), 6).alias("bounce_rate"),
            pround(F.avg("dwell_sec"), 2).alias("avg_dwell_sec"),
        )
        .orderBy("entry_type")
    )


# ---------------------------------------------------------------------------
# D155: growth accounting — DAU, new users, cumulative reach
# ---------------------------------------------------------------------------


@query(
    "d155_growth_accounting",
    tags=("D155", "D104", "D35"),
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    r AS (
        SELECT day, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM ud
    ),
    daily AS (
        SELECT day,
               count(*) AS dau,
               sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS new_users
        FROM r GROUP BY day
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_reach
    FROM daily ORDER BY day
    """,
)
def d155_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: daily active users, new users (first-ever
    appearance), and cumulative reach (distinct users seen to date) per
    day — the DAU/new/reach triplet on every growth dashboard, and the
    companion to D104's cohort retention matrix.

    Plan shape — the FIRST-SEEN trick: cumulative distinct users is NOT
    a distinct over an expanding window (quadratic re-scans); a user's
    first day is row_number()=1 over their per-user day sequence, so
    cumulative reach is just the running SUM of first-seen counts.
    Single lineage: one (user, day) distinct, one user_id window, one
    day rollup, one O(days) running sum. The final ordered window runs
    over |days| rows — trivially single-partition at any scale."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day"),
    ).distinct()
    r = ud.select(
        "day",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("day"))
        .alias("rn"),
    )
    daily = r.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("new_users"),
    )
    return daily.select(
        F.col("day").cast("long").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users")
        # bounded: |days| rows (already day-rolled-up)
        .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("cum_reach"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# D205: liveness / coverage-gap audit (when did a reporter go quiet?)
# ---------------------------------------------------------------------------

_D205_GAP_S = 600  # silence longer than this counts as downtime


@query(
    "d205_liveness_gaps",
    tags=("D205", "D34", "D137"),
    oracle=f"""
    WITH e AS (
        -- integer millis floored to whole seconds: Spark unix_timestamp
        -- floors while DuckDB epoch() keeps the fraction, so both sides
        -- must derive seconds from epoch-millis identically
        SELECT user_id, epoch_ms(ts) // 1000 AS sec FROM events
    ),
    g AS (
        SELECT user_id, sec,
               sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) AS gap
        FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(sec) - min(sec) AS BIGINT) AS span_s,
           CAST(sum(CASE WHEN gap > {_D205_GAP_S} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gaps,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_s,
           CAST(sum(CASE WHEN gap > {_D205_GAP_S}
                         THEN gap - {_D205_GAP_S} ELSE 0 END) AS BIGINT)
               AS downtime_s,
           {sql_round(
               f"1.0 - sum(CASE WHEN gap > {_D205_GAP_S} THEN gap - {_D205_GAP_S} "
               f"ELSE 0 END) * 1.0 / greatest(max(sec) - min(sec), 1)", 4)}
               AS coverage_pct
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def d205_liveness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liveness / coverage-gap audit — the operational question behind
    the reference's whole architecture (a snort sensor that stops
    writing spools looks EXACTLY like a quiet network,
    /root/reference/README.md:15-18): per reporting entity, find the
    silences longer than a threshold in its event stream and account
    them — gap count, worst gap, total downtime beyond the threshold,
    and the coverage fraction of its active span. d137 interpolates a
    REGULAR grid; this audits the irregular reality that tells an
    on-call whether missing data means 'nothing happened' or 'nothing
    was recorded'.

    Scale shape: ONE lag window partitioned by the high-cardinality
    reporter key (each partition is a single entity's stream — scales
    out with the fleet), and the rollup reuses the window's
    partitioning: one data shuffle plus the presentation sort. All gap
    arithmetic is integer epoch seconds; coverage divides as DOUBLE
    under the portable round."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        # ts is NTZ; session tz is pinned UTC, so the cast is identity
        F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / 1000)
        .cast("long")
        .alias("sec"),
    )
    w = W.partitionBy("user_id").orderBy("sec")
    g = e.withColumn("gap", F.col("sec") - F.lag("sec").over(w))
    over = F.col("gap") > _D205_GAP_S
    downtime = F.sum(F.when(over, F.col("gap") - _D205_GAP_S).otherwise(0))
    span = F.max("sec") - F.min("sec")
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            span.cast("long").alias("span_s"),
            F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("n_gaps"),
            F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap_s"),
            downtime.cast("long").alias("downtime_s"),
            pround(
                1.0 - downtime * 1.0 / F.greatest(span, F.lit(1)), 4
            ).alias("coverage_pct"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# D223: time-decayed heavy hitters (the recency-weighted leaderboard)
# ---------------------------------------------------------------------------

_D223_HALFLIFE_US = 7 * 86_400_000_000  # 7-day half-life
_D223_TOPK = 20


@query(
    "d223_decayed_heavy_hitters",
    tags=("D223", "A90", "D119"),
    oracle=f"""
    WITH t AS (SELECT max(epoch_us(ts)) AS t_ref FROM events),
    scored AS (
        SELECT user_id,
               count(*) AS n_events,
               {sql_round(
                   "sum(pow(2.0, -CAST(t.t_ref - epoch_us(ts) AS DOUBLE)"
                   f" / {float(_D223_HALFLIFE_US)}))", 4)} AS decayed
        FROM events CROSS JOIN t
        GROUP BY user_id
    ),
    ranked AS (
        SELECT user_id, n_events, decayed,
               row_number() OVER (ORDER BY decayed DESC, user_id) AS rnk_decayed,
               row_number() OVER (ORDER BY n_events DESC, user_id) AS rnk_raw
        FROM scored
    )
    SELECT CAST(rnk_decayed AS INT) AS rnk, user_id,
           CAST(n_events AS BIGINT) AS n_events, decayed,
           CAST(rnk_raw AS INT) AS rnk_raw,
           CAST(CASE WHEN rnk_decayed <> rnk_raw THEN 1 ELSE 0 END AS INT)
               AS rank_moved
    FROM ranked WHERE rnk_decayed <= {_D223_TOPK}
    ORDER BY rnk
    """,
)
def d223_decayed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted heavy hitters — the abuse/ops leaderboard that
    A90's frequency-only heavy hitters cannot express: each event
    contributes 2^(-(age)/halflife) at the corpus reference time (7-day
    half-life), so a key flooding NOW outranks a key with a bigger but
    stale total. Reports the decayed top-{_D223_TOPK} with each key's
    raw-count rank and a rank_moved flag — the rows where recency
    weighting actually changes the decision. Scores are rounded to 4dp
    BEFORE ranking so cross-engine float-sum ordering cannot flip ties
    (user_id ascending breaks them identically on both sides).

    Plan shape: the reference time is a 1-row aggregate broadcast back
    (scalar build side); the decayed sum is one map-side-combined
    groupBy(user_id) — exponential decay against a FIXED reference is
    a plain per-row weight, so no sequential state is needed (unlike
    the step-by-step EWMA in D119); the decayed top-K is a distributed
    TakeOrdered and the survivors' raw ranks come from one broadcast
    count-join over the grouped frame, so no stage ever funnels all
    user keys through one task (the rank window itself runs over the
    K-row limit result — the D117 bounded class). At 100 TB: one
    events scan + one keyed shuffle + one O(K·keys) map-side-combined
    comparison pass; the leaderboard is KB-scale. A production deployment
    maintains the same statistic incrementally (decayed sums are
    mergeable: rescale both sides to the newer reference), which is
    the D161/D174 mergeable-rollup shape."""
    e = load_table(spark, sf_dir, "events")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    t_ref = e.agg(F.max(tus).alias("t_ref"))
    scored = (
        e.select(F.col("user_id"), tus.alias("tus"))
        .join(F.broadcast(t_ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(
                F.sum(
                    F.pow(
                        F.lit(2.0),
                        -(F.col("t_ref") - F.col("tus")).cast("double")
                        / F.lit(float(_D223_HALFLIFE_US)),
                    )
                ),
                4,
            ).alias("decayed"),
        )
    )
    # Neither global rank may serialize ALL user keys through one
    # reducer (ADVICE r13 — the d219 hazard). The decayed top-K is a
    # distributed TakeOrdered (orderBy+limit, per-partition top-K then
    # a K-row driver merge — never a full sort); the SURVIVORS' raw
    # ranks come from one count-join: rnk_raw(d) = 1 + |{k :
    # (n_k, k) orders before (n_d, d)}|, computed by joining the
    # O(keys) grouped frame against the broadcast K-row leaderboard
    # and map-side-combining the counts — O(K·keys) cheap comparisons,
    # no range exchange, no persist, exactly row_number's semantics.
    # (The first rework used two ordered_prefix passes; their two
    # range-partition materializations cost 3x the whole query at
    # sf0.1 — BENCH_AB_r14.json — and bought nothing this shape needs:
    # only K survivors ever need a rank.)
    # One events scan: the O(keys) grouped frame is checkpointed and
    # BOTH ranking branches (top-K and the count-join's probe side)
    # read the cut — without it each branch re-runs the corpus scan.
    from ..session import reliable_checkpoint

    scored = reliable_checkpoint(scored)
    top = scored.orderBy(F.col("decayed").desc(), F.col("user_id")).limit(
        _D223_TOPK
    )
    w_top = W.orderBy(  # bounded: K rows by the preceding limit
        F.col("decayed").desc(), F.col("user_id")
    )
    top = top.withColumn("rnk", F.row_number().over(w_top))
    others = scored.select(
        F.col("user_id").alias("o_id"), F.col("n_events").alias("o_n")
    )
    ahead = (
        others.join(
            F.broadcast(top.select("user_id", "n_events")),
            (F.col("o_n") > F.col("n_events"))
            | ((F.col("o_n") == F.col("n_events")) & (F.col("o_id") < F.col("user_id"))),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n_ahead"))
    )
    return (
        top.join(ahead, "user_id", "left")
        .withColumn(
            "rnk_raw", (F.coalesce(F.col("_n_ahead"), F.lit(0)) + 1).cast("int")
        )
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            "decayed",
            "rnk_raw",
            (F.col("rnk") != F.col("rnk_raw")).cast("int").alias("rank_moved"),
        )
        .orderBy("rnk")
    )

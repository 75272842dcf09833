"""Structured Streaming operator surface (SURVEY §2.2 D53-D60).

Each query replays ``events`` as a chunked file stream (harness),
runs the streaming DAG to completion, and returns the final sink —
checked against DuckDB's *batch* answer over the same rows (the
standard stream-equals-batch correctness harness). Watermark semantics
(D56) and the stateful sequencer (D58) also have dedicated tests in
tests/test_streaming.py; D58/D60 live in the charlotte pipeline module.

Scale notes: these plans are the production plans — file source with
admission control (maxFilesPerTrigger ≡ R5 backpressure), watermarked
state eviction so state size is bounded by (watermark window ×
key cardinality), not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import pround, sql_round
from ..registry import query
from ..session import local_df
from ..streaming.harness import DEFAULT_SENTINEL_TS, events_stream, run_to_memory


def _replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared events replay: ONE chunk-dir materialization (shuffled
    order + far-future sentinel) serves every streaming registry query —
    queries that don't need the sentinel filter it out (event_id = -1),
    and shuffled chunk order is invisible to a single-trigger replay."""
    return events_stream(
        spark, sf_dir, n_chunks=8, shuffle_chunks=True, sentinel_ts=DEFAULT_SENTINEL_TS
    )


@query(
    "d53_tumbling_window",
    tags=("D53",),
    oracle=f"""
    SELECT strftime(to_timestamp((epoch_us(ts) // 1000000) // 600 * 600), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           {sql_round("sum(value)", 2)} AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def d53_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows over the replayed stream."""
    s = _replay(spark, sf_dir).filter(F.col("event_id") >= 0)
    agg = s.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), pround(F.sum("value"), 2).alias("total")
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "total",
    ).orderBy("win_start", "event_type")


@query(
    "d54_sliding_window",
    tags=("D54",),
    oracle=f"""
    WITH slides AS (
        SELECT e.*,
               to_timestamp((epoch_us(ts) // 1000000) // 300 * 300 - s.k * 300) AS win_start
        FROM events e,
             (SELECT unnest([0, 1]) AS k) s
        WHERE (epoch_us(ts) // 1000000) >= epoch(to_timestamp((epoch_us(ts) // 1000000) // 300 * 300 - s.k * 300))
          AND (epoch_us(ts) // 1000000) < epoch(to_timestamp((epoch_us(ts) // 1000000) // 300 * 300 - s.k * 300)) + 600
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n,
           {sql_round("sum(value)", 2)} AS total
    FROM slides
    GROUP BY 1
    ORDER BY win_start
    """,
)
def d54_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in 2)."""
    s = _replay(spark, sf_dir).filter(F.col("event_id") >= 0)
    agg = s.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), pround(F.sum("value"), 2).alias("total")
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n", "total"
    ).orderBy("win_start")


@query(
    "d55_session_window",
    tags=("D55",),
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 300000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def d55_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute-gap session windows per user; the DuckDB oracle is the
    gaps-and-islands formulation of the same semantics (SURVEY §7 hard
    part 5). Second-truncated session_start keys the comparison.

    Append mode + watermark, not complete: complete re-emits every
    closed session to the sink on every micro-batch (~100k rows × 8
    batches here — and unbounded state forever at 100 TB), while append
    emits each session exactly once when the watermark passes it and
    evicts its state. The far-future sentinel row advances the
    watermark past the final sessions so the replay flushes fully."""
    s = _replay(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "40 days")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_to_memory(agg, "append")
    return (
        out.filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "d56_watermark_late_drop",
    tags=("D56",),
    oracle=f"""
    SELECT strftime(to_timestamp((epoch_us(ts) // 1000000) // 600 * 600), '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY win_start
    """,
)
def d56_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling windows fed with shuffled chunk order.

    The 40-day watermark exceeds the replay's chunk-level disorder
    (~26 days), so no data is dropped, and the far-future sentinel row
    advances the watermark past every real window so append mode
    flushes them all — result equals the batch answer. Genuine
    late-drop + bounded-state behavior with a tight watermark is
    asserted in tests/test_streaming.py."""
    s = _replay(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "40 days")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(agg, "append")
    return (
        out.select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n")
        .filter(F.col("win_start") < "2024-05-01")
        .orderBy("win_start")
    )


@query(
    "d57_streaming_dedup",
    tags=("D57",),
    oracle="""
    SELECT count(*) AS n_unique,
           count(DISTINCT event_id) AS n_distinct_ids
    FROM events
    """,
)
def d57_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates over a stream that replays every chunk's
    rows (plus the overlap duplicates the chunking introduces when the
    same files are re-listed) — final count equals distinct count."""
    s = _replay(spark, sf_dir).filter(F.col("event_id") >= 0)
    # duplicate the stream rows by unioning the stream with itself: every
    # event_id arrives at least twice
    dup = s.unionByName(s)
    dedup = dup.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    out = run_to_memory(dedup, "append")
    return out.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
    )


@query(
    "d59_stream_static_join",
    tags=("D59", "R13", "R14", "R15"),
    oracle=f"""
    WITH dim(event_type, risk_weight) AS (
        VALUES ('error', CAST(5.0 AS DOUBLE)), ('purchase', CAST(1.0 AS DOUBLE)),
               ('signup', CAST(2.0 AS DOUBLE))
    )
    SELECT e.event_type,
           coalesce(d.risk_weight, CAST(10.0 AS DOUBLE)) AS risk_weight,
           count(*) AS n,
           {sql_round("sum(e.value * coalesce(d.risk_weight, 10.0))", 2)} AS weighted
    FROM events e LEFT JOIN dim d USING (event_type)
    GROUP BY e.event_type, d.risk_weight
    ORDER BY e.event_type
    """,
)
def d59_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static broadcast join with default fabrication on miss —
    the R13/R14/R15 map-enrichment shape (weight 10.0 ≡ charlotte's
    priority-10 default row, /root/reference/charlotte/__init__.py:189)."""
    dim = local_df(
        spark,
        [("error", 5.0), ("purchase", 1.0), ("signup", 2.0)],
        "event_type string, risk_weight double",
    )
    s = _replay(spark, sf_dir).filter(F.col("event_id") >= 0)
    joined = s.join(F.broadcast(dim), "event_type", "left").withColumn(
        "rw", F.coalesce("risk_weight", F.lit(10.0))
    )
    agg = joined.groupBy("event_type", "risk_weight").agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum(F.col("value") * F.col("rw")), 2).alias("weighted"),
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        "event_type",
        F.coalesce("risk_weight", F.lit(10.0)).alias("risk_weight"),
        "n",
        "weighted",
    ).orderBy("event_type")


@query(
    "d92_stream_stream_join",
    tags=("D92", "D22"),
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id AS user_id,
           CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_sec
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    ORDER BY purchase_id, click_id
    """,
)
def d92_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–stream inner join with an event-time range condition:
    each purchase matched to the same user's clicks in the preceding
    10 minutes (attribution join). Both sides are watermarked, so the
    join state each side buffers is bounded by (watermark + range) ×
    arrival rate — the state-cleanup contract that makes stream-stream
    joins viable at 100 TB; without the time bound the buffers grow
    with stream length. The far-future sentinel flows through BOTH
    side's filters so each watermark advances and state drains; its
    self-pair (user_id −1) is dropped after the sink.

    Oracle: the batch interval join over the same rows — inner-join
    results are arrival-order invariant once both streams flush, so
    stream-equals-batch holds exactly."""
    s = _replay(spark, sf_dir)
    purchases = (
        s.filter((F.col("event_type") == "purchase") | (F.col("event_id") < 0))
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "40 days")
    )
    clicks = (
        s.filter((F.col("event_type") == "click") | (F.col("event_id") < 0))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "40 days")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    # 8 state partitions, not the harness default 16: a stream-stream
    # join keeps FOUR state stores per partition (left/right ×
    # key/index), so commit fan-out per batch is 4× a windowed agg's —
    # halving the partition count halves the replay's fixed cost while
    # the keyed state (≤ user cardinality) stays far from any skew.
    out = run_to_memory(joined, "append", state_partitions=8)
    return (
        out.filter((F.col("purchase_id") >= 0) & (F.col("click_id") >= 0))
        .select(
            "purchase_id",
            "click_id",
            F.col("p_user").alias("user_id"),
            F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias(
                "lag_sec"
            ),
        )
        .orderBy("purchase_id", "click_id")
    )


@query(
    "d82_custom_stateful_sessions",
    tags=("D82", "D55", "D58"),
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 300000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def d82_custom_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user sessionization (5-minute gap) with an EVENT-TIME TIMEOUT
    flushing open sessions once the watermark passes their close — the
    arbitrary-state API the built-in session_window (D55) cannot
    express variants of (per-key gap rules, session caps, custom
    payloads). Oracle: the batch gaps-and-islands answer over the same
    rows — stream-equals-batch for a hand-rolled stateful operator.

    State per user is ONE open-session triple (start, last, count) —
    bounded by key cardinality, not stream length; closed sessions are
    emitted (append) and evicted. Per-batch work is vectorized numpy
    (diff > gap → boundary indices), no per-row Python loop."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    GAP_US = 300_000_000  # 5 minutes

    def _fmt(us: int) -> str:
        return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")

    def sessionize(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            start, last, cnt = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [_fmt(start)], "n_events": [cnt]}
            )
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        ts = np.sort(
            np.concatenate(
                [p["ts"].to_numpy().astype("datetime64[us]").astype("int64") for p in parts]
            )
        )
        closed: list[tuple[int, int]] = []  # (start, n)
        if state.exists:
            start, last, cnt = state.get
            if ts[0] - last <= GAP_US:
                pass  # continues the open session
            else:
                closed.append((start, cnt))
                start, cnt = ts[0], 0
        else:
            start, cnt = int(ts[0]), 0
        # boundary where the gap exceeds GAP_US; segments between
        bounds = np.where(np.diff(ts) > GAP_US)[0] + 1
        segs = np.split(ts, bounds)
        # first segment extends the open session
        cnt += len(segs[0])
        last = int(segs[0][-1])
        for seg in segs[1:]:
            closed.append((start, cnt))
            start, cnt, last = int(seg[0]), len(seg), int(seg[-1])
        state.update((int(start), int(last), int(cnt)))
        # flush the open session when the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1000 + GAP_US // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [_fmt(s) for s, _ in closed],
                    "n_events": [n for _, n in closed],
                }
            )

    s = _replay(spark, sf_dir)
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", StringType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("last", LongType()),
            StructField("n", LongType()),
        ]
    )
    # NOTE: no pre-groupBy filter on event_id — Catalyst pushes such a
    # filter below the watermark node into the parquet source, so the
    # sentinel row would be dropped before it can advance the watermark
    # and no timeout would ever fire. The sentinel's own group
    # (user_id = -1) is excluded from the result after the sink instead.
    sessions = (
        s.withWatermark("ts", "40 days")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    out = run_to_memory(sessions, "append")
    return out.filter(F.col("user_id") >= 0).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# D126: sessionization on the transformWithState API (Spark 4)
# ---------------------------------------------------------------------------

_TWS_GAP_US = 300_000_000  # 5 minutes, same contract as d82

def _segment_sessions(ts, state):
    """Shared numpy segmentation for the stateful sessionizers: fold a
    sorted int64-μs timestamp array into (closed_sessions, open_state)
    given the optional carried (start, last, n) open-session state."""
    import numpy as np

    closed: list[tuple[int, int]] = []
    if state is not None:
        start, last, cnt = state
        if ts[0] - last > _TWS_GAP_US:
            closed.append((start, cnt))
            start, cnt = int(ts[0]), 0
    else:
        start, cnt = int(ts[0]), 0
    bounds = np.where(np.diff(ts) > _TWS_GAP_US)[0] + 1
    segs = np.split(ts, bounds)
    cnt += len(segs[0])
    last = int(segs[0][-1])
    for seg in segs[1:]:
        closed.append((start, cnt))
        start, cnt, last = int(seg[0]), len(seg), int(seg[-1])
    return closed, (int(start), int(last), int(cnt))


def _tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf wire format for its
    state-server protocol; absent in this container (no pip installs)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def make_session_processor():
    """Factory for the transformWithState sessionizer (module-level so
    its batch/timer logic is unit-testable without a streaming query;
    the TWS wire protocol itself needs protobuf — see _tws_available)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor

    def _fmt(us: int) -> str:
        return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")

    class SessionProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.state = handle.getValueState("open", "start LONG, last LONG, n LONG")

        def handleInputRows(self, key, rows, timer_values):
            parts = [p for p in rows if len(p)]
            if not parts:
                return
            ts = np.sort(
                np.concatenate(
                    [
                        p["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                        for p in parts
                    ]
                )
            )
            prev = self.state.get() if self.state.exists() else None
            closed, new_state = _segment_sessions(ts, prev)
            self.state.update(new_state)
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(new_state[1] // 1000 + _TWS_GAP_US // 1000 + 1)
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(closed),
                        "session_start": [_fmt(st) for st, _ in closed],
                        "n_events": [n for _, n in closed],
                    }
                )

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            if self.state.exists():
                start, last, cnt = self.state.get()
                self.state.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_start": [_fmt(start)],
                        "n_events": [cnt],
                    }
                )

        def close(self):
            pass

    return SessionProcessor()


@query(
    "d126_transform_with_state",
    tags=("D126", "D82", "D58"),
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 300000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def d126_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-minute-gap sessionization on Spark 4's
    ``transformWithStateInPandas`` — the successor API to D82's
    applyInPandasWithState: named state variables (ValueState here;
    ListState/MapState for richer operators), explicit event-time
    TIMERS instead of a single timeout slot, and the RocksDB state
    store. Same session contract and the same batch gaps-and-islands
    oracle as d82, so the two APIs are checked against each other
    through the shared answer.

    Capability detection: the TWS state-server protocol speaks
    protobuf, which this container lacks (no installs) — when
    ``google.protobuf`` is importable the TWS path runs (RocksDB
    provider set at query start); otherwise the operator falls back to
    the applyInPandasWithState formulation with a logged notice, the
    d82-proven path with identical semantics. Both paths share the
    numpy session segmentation (``_segment_sessions``) — no per-row
    Python in either."""
    import logging

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    def _fmt(us: int) -> str:
        return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", StringType()),
            StructField("n_events", LongType()),
        ]
    )
    s = _replay(spark, sf_dir)

    if _tws_available():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        sessions = (
            s.withWatermark("ts", "40 days")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=make_session_processor(),
                outputStructType=out_schema,
                outputMode="Append",
                timeMode="EventTime",
            )
        )
    else:
        logging.getLogger(__name__).info(
            "google.protobuf not importable: d126 falling back to "
            "applyInPandasWithState (same session semantics)"
        )
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        state_schema = StructType(
            [
                StructField("start", LongType()),
                StructField("last", LongType()),
                StructField("n", LongType()),
            ]
        )

        def sessionize(key, pdfs, state: GroupState):
            user_id = key[0]
            if state.hasTimedOut:
                start, last, cnt = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [_fmt(start)],
                        "n_events": [cnt],
                    }
                )
                return
            parts = [pdf for pdf in pdfs if len(pdf)]
            if not parts:
                return
            ts = np.sort(
                np.concatenate(
                    [
                        p["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                        for p in parts
                    ]
                )
            )
            prev = state.get if state.exists else None
            closed, new_state = _segment_sessions(ts, prev)
            state.update(new_state)
            state.setTimeoutTimestamp(new_state[1] // 1000 + _TWS_GAP_US // 1000 + 1)
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(closed),
                        "session_start": [_fmt(st) for st, _ in closed],
                        "n_events": [n for _, n in closed],
                    }
                )

        sessions = (
            s.withWatermark("ts", "40 days")
            .groupBy("user_id")
            .applyInPandasWithState(
                sessionize, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )

    out = run_to_memory(sessions, "append")
    return out.filter(F.col("user_id") >= 0).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# D162: streaming distribution-drift monitor (windowed PSI vs baseline)
# ---------------------------------------------------------------------------

_PSI_EPS = 1e-6
_PSI_ALERT = 0.2


@query(
    "d162_streaming_psi_drift",
    tags=("D162", "D53", "D139"),
    oracle=f"""
    WITH bucketed AS (
        SELECT date_trunc('day', ts) AS win,
               day(ts) <= 15 AS is_base,
               CAST(floor(value) AS BIGINT) % 10 AS b
        FROM events
    ),
    base AS (
        SELECT b, count(*) * 1.0 / (SELECT count(*) FROM bucketed WHERE is_base) AS q
        FROM bucketed WHERE is_base GROUP BY b
    ),
    cur AS (
        SELECT win, b, count(*) AS n
        FROM bucketed WHERE NOT is_base GROUP BY win, b
    ),
    tot AS (SELECT win, sum(n) AS t FROM cur GROUP BY win),
    cells AS (
        SELECT t.win,
               coalesce(c.n, 0) * 1.0 / t.t + {_PSI_EPS} AS p,
               base.q + {_PSI_EPS} AS q
        FROM tot t CROSS JOIN base
        LEFT JOIN cur c ON c.win = t.win AND c.b = base.b
    )
    SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start,
           {sql_round("sum((p - q) * ln(p / q))", 6)} AS psi,
           CAST(CASE WHEN sum((p - q) * ln(p / q)) > {_PSI_ALERT}
                THEN 1 ELSE 0 END AS INT) AS drift
    FROM cells GROUP BY win ORDER BY win_start
    """,
)
def d162_streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift monitor: Population Stability Index
    per 1-day tumbling window against a frozen baseline (the first
    half-month's value-bucket proportions) — the live counterpart of
    D139's batch KS test, and the alert every feature-serving /
    training-data pipeline hangs on its dashboards. PSI =
    Σ (p−q)·ln(p/q) over 10 value buckets with ε-smoothing so empty
    buckets stay finite; windows with PSI > 0.2 flag drift.

    Plan shape: the stateful part is ONE streaming tumbling-window
    bucket count (state = windows × 10 buckets, bounded); the baseline
    is a static-side aggregate that joins the windowed counts as a
    10-row broadcast; the PSI fold is a per-window rollup of 10 cells.
    At 100 TB/day the streaming agg partial-aggregates map-side and
    the post-window tables are O(windows × buckets) — microscopic."""
    s = _replay(spark, sf_dir).filter(
        (F.col("event_id") >= 0) & (F.dayofmonth("ts") > 15)
    )
    bucket = (F.floor("value").cast("long") % 10).alias("b")
    agg = s.groupBy(F.window("ts", "1 day").alias("w"), bucket).agg(
        F.count(F.lit(1)).alias("n")
    )
    cur = run_to_memory(agg, "complete").select(
        F.col("w.start").alias("win"), "b", "n"
    )
    # baseline: static batch over the same source table (days 1-15) —
    # ONE scan; the denominator comes from the 10-row aggregate itself
    # (whole-partition window over bucket rows, bounded by construction)
    from pyspark.sql import Window as W

    from ..catalog import load_table

    e = load_table(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 15)
    counts = e.groupBy((F.floor("value").cast("long") % 10).alias("b")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    wt = W.partitionBy().rowsBetween(  # bounded: 10 bucket rows
        W.unboundedPreceding, W.unboundedFollowing
    )
    base = counts.select("b", (F.col("nb") / F.sum("nb").over(wt)).alias("q"))
    tot = cur.groupBy("win").agg(F.sum("n").alias("t"))
    cells = (
        tot.crossJoin(F.broadcast(base))
        .join(cur, ["win", "b"], "left")
        .select(
            "win",
            (F.coalesce(F.col("n"), F.lit(0)) / F.col("t") + F.lit(_PSI_EPS)).alias("p"),
            (F.col("q") + F.lit(_PSI_EPS)).alias("qq"),
        )
    )
    psi = F.sum((F.col("p") - F.col("qq")) * F.log(F.col("p") / F.col("qq")))
    return (
        cells.groupBy("win")
        .agg(
            pround(psi, 6).alias("psi"),
            (psi > _PSI_ALERT).cast("int").alias("drift"),
        )
        .select(
            F.date_format("win", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "psi",
            "drift",
        )
        .orderBy("win_start")
    )


# ---------------------------------------------------------------------------
# A172: streaming windowed distinct-user sketch (HLL in the live path)
# ---------------------------------------------------------------------------

# Same tolerance as A83: lgConfigK=12 gives ~1.6% relative standard
# error; the in-query flag asserts the estimate landed within 5% of
# exact — the oracle pins the flag as the LITERAL 1 (the d58 pattern),
# so a sketch drifting out of bound fails the driver hash.
_HLL_WINDOW_TOL_BP = 500


@query(
    "a172_streaming_hll_window",
    tags=("D172", "A83", "D53"),
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           CAST(1 AS INT) AS within_bound
    FROM events
    GROUP BY date_trunc('day', ts) ORDER BY win_start
    """,
)
def a172_streaming_hll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed distinct-user counting via a mergeable HLL
    sketch — the live-dashboard counterpart of A83: exact streaming
    COUNT(DISTINCT) is disallowed (unbounded per-window state), so the
    production shape is a per-window hll_sketch_agg whose state is a
    fixed 2^lgK-register sketch per window, mergeable across
    micro-batches and across days. The declared result carries the
    EXACT per-window distinct (recomputed batch-side off the same
    table, hash-checkable) plus the in-query flag that the streaming
    sketch estimate landed within 5% of it; the oracle pins the flag
    as the literal 1, so estimator drift fails the driver hash
    (the d58/A83 invariant-pin discipline).

    Plan shape: ONE streaming tumbling-window aggregate with
    partial-agg sketch merge map-side; state = O(windows) sketches of
    fixed size regardless of cardinality — the property that makes
    this the 100 TB/day shape. The exact side is one batch
    distinct-per-window scan; estimates join it as an O(windows)-row
    broadcast."""
    s = _replay(spark, sf_dir).filter(F.col("event_id") >= 0)
    agg = s.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = run_to_memory(agg, "complete").select(
        F.col("w.start").alias("win"),
        F.hll_sketch_estimate("sk").alias("est"),
    )
    from ..catalog import load_table

    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("win"))
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    return (
        exact.join(F.broadcast(est), "win")
        .select(
            F.date_format("win", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_users_exact",
            (
                F.abs(F.col("est") - F.col("n_users_exact")) * 10000
                <= F.col("n_users_exact") * _HLL_WINDOW_TOL_BP
            )
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("win_start")
    )


# ---------------------------------------------------------------------------
# D221: streaming token-bucket rate limiter (admission control)
# ---------------------------------------------------------------------------

_TB_CAP = 2                      # bucket capacity (tokens)
# one whole token per six elapsed hours — sized to the events table's
# inter-arrival distribution (median per-user gap ~7h) so BOTH decision
# classes are non-vacuous at every SF (sf0.01: ~7.5k admitted / ~2.4k
# throttled)
_TB_REFILL_US = 21_600_000_000


@query(
    "d221_token_bucket_throttle",
    tags=("D221", "D82", "D58"),
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    sim AS (
        SELECT user_id, rn, tus,
               {_TB_CAP - 1} AS tokens, 1 AS admitted
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn, o.tus,
               CASE WHEN least({_TB_CAP}, s.tokens + (o.tus - s.tus) // {_TB_REFILL_US}) > 0
                    THEN least({_TB_CAP}, s.tokens + (o.tus - s.tus) // {_TB_REFILL_US}) - 1
                    ELSE least({_TB_CAP}, s.tokens + (o.tus - s.tus) // {_TB_REFILL_US}) END,
               CASE WHEN least({_TB_CAP}, s.tokens + (o.tus - s.tus) // {_TB_REFILL_US}) > 0
                    THEN 1 ELSE 0 END
        FROM sim s JOIN ordered o
          ON o.user_id = s.user_id AND o.rn = s.rn + 1
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(admitted) AS BIGINT) AS n_admitted,
           CAST(count(*) - sum(admitted) AS BIGINT) AS n_throttled,
           CAST(arg_max(tokens, rn) AS BIGINT) AS tokens_left
    FROM sim GROUP BY user_id ORDER BY user_id
    """,
)
def d221_token_bucket_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key token-bucket rate limiter — the admission
    control an ingestion pipeline puts in front of a hot key: each
    user's bucket holds {_TB_CAP} tokens, refills one WHOLE token per six
    elapsed hours between arrivals (integer arithmetic — exactly
    portable, no float recurrence; sized to the table's ~7h median
    per-user gap so both classes are exercised), an arrival with a positive balance
    is admitted and pays one token, an arrival on empty is throttled.
    Built on applyInPandasWithState (the D82 arbitrary-state API):
    state per user is one (t_prev, tokens, n_events, n_admitted)
    tuple — O(active keys), never O(stream); the per-user summary row
    flushes on EVENT-TIME TIMEOUT once the watermark passes the last
    arrival (the d82 sentinel discipline), so the output is exactly
    one row per user.

    The token recurrence is non-associative (the cap clamp), so the
    per-group batch runs a scalar loop over its Arrow-delivered
    arrivals — the honest cost of an online limiter (~1e6 decisions/s
    per core; admission control is never the scan bottleneck). Within
    a batch arrivals are processed in event-time order; across batches
    state carries (t_prev, tokens) forward, which IS the operational
    semantics of an online limiter (it sees arrival order). The
    single-trigger replay makes arrival order == event-time order, so
    the batch oracle — a per-user recursive-CTE simulation of the
    identical integer recurrence — reproduces the stream bit-for-bit
    (stream-equals-batch, the d82 proof shape)."""
    out = run_to_memory(_token_bucket_pipeline(_replay(spark, sf_dir)), "append")
    return out.filter(F.col("user_id") >= 0).orderBy("user_id")



def _token_bucket_pipeline(stream):
    """Build the d221 limiter over any events stream (factored so the
    multi-batch state-carry test drives the SAME operator)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    def throttle(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            _tp, tok, n, adm = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "n_admitted": [adm],
                    "n_throttled": [n - adm],
                    "tokens_left": [tok],
                }
            )
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        ts = np.sort(
            np.concatenate(
                [
                    p["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                    for p in parts
                ]
            )
        )
        if state.exists:
            tp, tok, n, adm = state.get
        else:
            tp, tok, n, adm = int(ts[0]), _TB_CAP, 0, 0
        for t in ts.tolist():
            tok = min(_TB_CAP, tok + (t - tp) // _TB_REFILL_US)
            if tok > 0:
                tok -= 1
                adm += 1
            n += 1
            tp = t
        state.update((int(tp), int(tok), int(n), int(adm)))
        state.setTimeoutTimestamp(int(ts[-1]) // 1000 + 60_001)

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("n_admitted", LongType()),
            StructField("n_throttled", LongType()),
            StructField("tokens_left", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("t_prev", LongType()),
            StructField("tokens", LongType()),
            StructField("n", LongType()),
            StructField("adm", LongType()),
        ]
    )
    # same discipline as d82: no pre-groupBy filter (it would push below
    # the watermark node and drop the sentinel before it advances the
    # watermark); the sentinel's own group is excluded after the sink
    return (
        stream.withWatermark("ts", "40 days")
        .groupBy("user_id")
        .applyInPandasWithState(
            throttle, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

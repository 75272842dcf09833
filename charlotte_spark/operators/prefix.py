"""Distributed prefix aggregation: ordered running sums and row
numbers WITHOUT a single-partition (or single-reducer-per-group) window.

``W.orderBy(...)`` with no partitionBy collapses the whole input onto
one task — fine for bounded inputs (per-partition totals, ntile over 64
buckets), a scale-killer over an unbounded row stream. The same hazard
hides in LOW-CARDINALITY grouped windows: ``partitionBy(lang)`` over a
5-language corpus serializes each language through one reducer chain at
any corpus size — ``group_cols`` generalizes the two-phase swap to that
case (range-partition on (group, order); per-group offsets over the
bounded per-bucket partials). This module is the swap the
D35/D139/D142/D156 (and grouped: D186) docstrings promise:

1. ``repartitionByRange(n_parts, *order_cols)`` gives a total order
   ACROSS partitions (partition i's keys all sort before partition
   i+1's) while keeping the sort itself fully parallel;
2. per-partition totals (``n_parts`` rows, bounded by configuration,
   never by data) get cumulative offsets on a tiny single-partition
   window;
3. the offsets broadcast-join back and within-partition running
   aggregates shift by them — identical arithmetic to the naive global
   window, so query hashes are unchanged.

Cost: one range exchange + one hash exchange on the bucket id (both
distributed and balanced — range buckets are equi-depth by sampling),
versus the naive plan's single-partition sort of the full input.

The range-partitioned frame is MATERIALIZED (eager ``persist``) before
anything consumes it. This is correctness-critical, not an
optimization: the ``_pid`` assignment feeds BOTH the per-bucket totals
and the final join, and an unmaterialized ``repartitionByRange``
lineage evaluates once per consumer — each evaluation re-samples the
RangePartitioner boundaries and ``spark_partition_id()`` carries no
determinism guarantee, so a row's ``_pid`` can differ between the two
branches, corrupting the offsets (observed: global row numbers > n,
a phantom 65th ntile bucket in D142 at sf0.01, and a double scan of
the input in D139). An eager ``persist(DISK_ONLY)`` pins one set of
``_pid`` assignments and bounds the input scan to exactly one pass;
both consumers then share the SINGLE persisted lineage, so even a
recompute after block loss replays the same ShuffleDependency (the
RangePartitioner boundaries are fixed inside it) and yields the same
``_pid`` — unlike the forked-lineage bug, where each action planned
its own exchange. DISK_ONLY rather than a reliable checkpoint because
(a) the fork-consistency property is lineage-sharing, not lineage
truncation, and (b) measured at sf0.1 the checkpoint's extra
cache-then-rewrite job costs ~50% more wall time per call
(d139: 1.12 s -> 0.74 s median-of-5); DISK_ONLY also never competes
with execution memory.

Cache lifetime (ADVICE r08 #1): Spark's CacheManager holds every
persisted plan until explicit unpersist/clearCache/session end — the
ContextCleaner does NOT release cached blocks when the frame goes
unreferenced, so without cleanup each call leaks disk blocks for the
whole session. Cleanup contract: each ``_materialize`` unpersists the
PREVIOUS calls' caches once its own cache is fully built (a chained
call — d142 prefixes twice — reads the previous cache while counting
the new one, so eviction must follow materialization). At most one
call's blocks are ever live. Consequence for callers: consume (run an
action on) an ``ordered_prefix`` result BEFORE the next
``ordered_prefix`` call in the session — evicting an unconsumed
result's cache would re-fork its lineage on collection (the
wrong-answer bug above). Every registry/bench/driver/pytest flow is
sequential and satisfies this; ``release_prefix_caches()`` frees the
final call's blocks for harnesses that want a clean session.

The order columns must form a TOTAL order (include a unique tie-break
key): range partitioning keeps equal keys together, but a caller that
wants deterministic row numbers needs uniqueness anyway. Columns named
in ``running`` must be non-null: the within-bucket running sum is
null-coalesced to 0 before the offset shift, which matches the naive
global window everywhere except the (unused) all-null-prefix case.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["PrefixStage", "ordered_prefix", "ordered_prefix_chain", "release_prefix_caches"]

# Live persisted frames from prior ordered_prefix calls; evicted once a
# newer call's cache is materialized (see module docstring).
_LIVE_CACHES: list[DataFrame] = []

# Hard bound on tracked entries (VERDICT r11 #2 / prefix.py item): the
# sameResult-exception path RETAINS an entry instead of evicting it, so
# a session that keeps raising (e.g. a long-lived harness cycling Spark
# sessions) could otherwise accumulate tracked DISK_ONLY caches without
# limit until release_prefix_caches(). Oldest retained entries are
# force-evicted past this bound — with the same sameResult guard, so a
# retained entry that turns out to BE the newest plan's CacheManager
# entry is dropped from tracking without unpersisting it.
_MAX_LIVE = 8


def release_prefix_caches() -> None:
    """Unpersist every live prefix cache (harness/session teardown)."""
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            pass  # owning session already stopped — blocks died with it


def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly persist so every consumer shares ONE evaluated lineage
    (see module docstring — fork consistency, not lineage truncation).
    Evicts the previous calls' caches AFTER this one is built: the
    count() below may read them (chained prefixes); nothing does
    afterwards. A repeated call over the SAME input plan shares one
    CacheManager entry (cache keys are analyzed-plan equality), so such
    frames are dropped from tracking WITHOUT unpersisting — unpersisting
    would remove the entry the new call just reused."""
    cached = df.persist(StorageLevel.DISK_ONLY)
    cached.count()
    new_plan = cached._jdf.queryExecution().analyzed()
    for old in list(_LIVE_CACHES):
        _LIVE_CACHES.remove(old)
        try:
            if not old._jdf.queryExecution().analyzed().sameResult(new_plan):
                old.unpersist()
        except Exception:
            # Stale/stopped session or incomparable plan: keep the entry
            # rather than risk evicting the one just persisted — but keep
            # TRACKING it too, so release_prefix_caches() can still free
            # its DISK_ONLY blocks if the session turns out to be alive.
            _LIVE_CACHES.append(old)
    _LIVE_CACHES.append(cached)
    # Bound the retained-on-exception backlog (newest entry — the one
    # just persisted — is never touched; _MAX_LIVE >= 2 guarantees it).
    while len(_LIVE_CACHES) > _MAX_LIVE:
        old = _LIVE_CACHES.pop(0)
        try:
            if not old._jdf.queryExecution().analyzed().sameResult(new_plan):
                old.unpersist()
        except Exception:
            pass  # still incomparable — drop tracking; session teardown
            # (or the owning session's death) frees the blocks
    return cached


def ordered_prefix(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    group_cols: Sequence[str] = (),
    running: Mapping[str, str] | None = None,
    row_number: str | None = None,
    totals: Mapping[str, str] | None = None,
    count_total: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Append ordered prefix columns to ``df`` — globally, or per group.

    running:     {out_name: col} — running sum of ``col`` over the
                 total order (frame: unbounded preceding .. current row)
    row_number:  out_name — 1-based row number over the order
    totals:      {out_name: col} — total of ``col`` (whole input/group)
    count_total: out_name — row count (whole input/group)
    group_cols:  when non-empty, every prefix/total is computed WITHIN
                 each group, ordered by ``order_cols`` — value-identical
                 to ``Window.partitionBy(*group_cols).orderBy(...)`` but
                 without its scale hazard: a per-group window serializes
                 each group through ONE reducer chain (5 languages = 5
                 tasks at any corpus size), while here the data range-
                 partitions on (group, order) into n_parts buckets — a
                 hot group spans many partitions — and only the O(groups
                 x n_parts) per-bucket partials flow through a window.

    Two-phase plan, one materialization: range-partition and pin _pid;
    per-(group,)bucket partials; bounded offset window over the partials
    (per group <= n_parts rows); rejoin offsets. The offset frame
    broadcast is hinted only in the GLOBAL case (n_parts rows, bounded
    by construction); grouped offsets are O(groups) — SF-proportional —
    and stay unhinted so AQE picks the strategy (the d936768 rule).

    ``n_parts`` defaults to the cluster's ``defaultParallelism``
    (floor 32): a fixed 32 would cap the prefix pass at 32 tasks on a
    1000-core cluster (VERDICT r10 #4). It stays a knob because the
    offset window is O(groups x n_parts) rows — a caller with millions
    of groups may want it small. Values are n_parts-invariant (pinned
    by the naive-window equality property tests), so the default only
    moves the physical plan, never a hash.
    """
    return ordered_prefix_chain(
        df,
        order_cols,
        group_cols=group_cols,
        stages=[
            PrefixStage(
                running=running,
                row_number=row_number,
                totals=totals,
                count_total=count_total,
            )
        ],
        n_parts=n_parts,
    )


@dataclass(frozen=True)
class PrefixStage:
    """One stage of an ``ordered_prefix_chain``.

    derive:  row-local column derivations applied BEFORE this stage's
             prefix pass; may read any earlier stage's outputs (that is
             the point — a packing cursor derived from a budget
             cursor). Must be row-local (no windows/joins/aggregates):
             the frame it receives is consumed by TWO branches (the
             per-bucket partials and the final rejoin) whose shared
             ancestor is the one materialized range partition, so any
             non-deterministic or re-shuffling derivation would fork.
    running / row_number / totals / count_total: as ``ordered_prefix``.
    """

    derive: Callable[[DataFrame], DataFrame] | None = None
    running: Mapping[str, str] | None = None
    row_number: str | None = None
    totals: Mapping[str, str] | None = None
    count_total: str | None = None


def ordered_prefix_chain(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    group_cols: Sequence[str] = (),
    stages: Sequence[PrefixStage],
    n_parts: int | None = None,
) -> DataFrame:
    """CHAINED prefix stages over ONE range-partition materialization.

    Two ``ordered_prefix`` calls in sequence (d183's mixture cursor →
    pack cursor, the d142 pattern) each pay the full fixed cost: a
    range exchange over the corpus plus an eager DISK_ONLY materialize
    (the fork-consistency pin). But when every later stage orders and
    groups by the SAME keys and derives its running input row-locally
    from earlier outputs, one ``_pid`` assignment serves them all
    (VERDICT r11 #3): stage k's per-bucket partials, offset window and
    rejoin run over the stage-(k-1) output frame, whose every lineage
    path bottoms out in the single persisted ``part`` — deterministic
    ``_pid``, no fork, no second corpus exchange. The follow-on stages
    also reuse the first stage's physical layout: their partials
    groupBy, offset rejoin and within-bucket window all key on
    ``(group_cols, _pid)``, the exact clustering the stage-1 running
    window already exchanged into, so Catalyst elides the extra
    exchanges (pinned by test_plans::test_fused_prefix_chain_*).

    Values are identical to chained ``ordered_prefix`` calls (pinned by
    the naive-window equality property tests), so swapping a chain in
    never moves a query hash.
    """
    if not stages:
        raise ValueError("ordered_prefix_chain needs at least one stage")
    if n_parts is None:
        n_parts = max(32, df.sparkSession.sparkContext.defaultParallelism)
    group_cols = list(group_cols)

    # Materialize ONCE so every consumer below sees identical _pid
    # assignments (see module docstring — forked repartitionByRange
    # lineage is a wrong-answer bug, not just a double scan).
    cur = _materialize(
        df.repartitionByRange(n_parts, *group_cols, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    for idx, stage in enumerate(stages):
        if stage.derive is not None:
            cur = stage.derive(cur)
        cur = _stage_pass(cur, order_cols, group_cols, stage, tag=str(idx))
    return cur.drop("_pid")


def _stage_pass(
    cur: DataFrame,
    order_cols: Sequence[str],
    group_cols: list[str],
    stage: PrefixStage,
    *,
    tag: str,
) -> DataFrame:
    """One prefix pass over a frame that already carries ``_pid``.

    Helper columns are tag-suffixed so chained stages summing the same
    source column never collide."""
    running = dict(stage.running or {})
    totals = dict(stage.totals or {})
    sum_cols = sorted({*running.values(), *totals.values()})
    need_count = stage.row_number is not None or stage.count_total is not None

    # Offset input: one row per non-empty (group, range-bucket) pair —
    # <= groups x n_parts rows (range partitioning on (group, order)
    # keeps each group's order contiguous across bucket boundaries).
    aggs = [F.sum(c).alias(f"_t{tag}_{c}") for c in sum_cols]
    if need_count:
        aggs.append(F.count(F.lit(1)).alias(f"_t{tag}_rows"))
    ptot = cur.groupBy(*group_cols, "_pid").agg(*aggs)

    w_base = W.partitionBy(*group_cols) if group_cols else W
    w_off = w_base.orderBy("_pid").rowsBetween(  # bounded: n_parts rows/group
        W.unboundedPreceding, -1
    )
    w_all = w_base.orderBy("_pid").rowsBetween(  # bounded: n_parts rows/group
        W.unboundedPreceding, W.unboundedFollowing
    )
    sel = [F.col(c) for c in group_cols] + [F.col("_pid")]
    for c in sum_cols:
        sel.append(
            F.coalesce(F.sum(f"_t{tag}_{c}").over(w_off), F.lit(0)).alias(
                f"_o{tag}_{c}"
            )
        )
        sel.append(F.sum(f"_t{tag}_{c}").over(w_all).alias(f"_g{tag}_{c}"))
    if need_count:
        sel.append(
            F.coalesce(F.sum(f"_t{tag}_rows").over(w_off), F.lit(0)).alias(
                f"_o{tag}_rows"
            )
        )
        sel.append(F.sum(f"_t{tag}_rows").over(w_all).alias(f"_g{tag}_rows"))
    off = ptot.select(*sel)

    w_run = (
        W.partitionBy(*group_cols, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    join_keys = group_cols + ["_pid"]
    out = cur.join(off if group_cols else F.broadcast(off), join_keys)
    for name, c in running.items():
        out = out.withColumn(
            name,
            F.coalesce(F.sum(c).over(w_run), F.lit(0)) + F.col(f"_o{tag}_{c}"),
        )
    if stage.row_number is not None:
        out = out.withColumn(
            stage.row_number, F.row_number().over(w_run) + F.col(f"_o{tag}_rows")
        )
    for name, c in totals.items():
        out = out.withColumn(name, F.col(f"_g{tag}_{c}"))
    if stage.count_total is not None:
        out = out.withColumn(stage.count_total, F.col(f"_g{tag}_rows"))

    drop = []
    for c in sum_cols:
        drop += [f"_o{tag}_{c}", f"_g{tag}_{c}"]
    if need_count:
        drop += [f"_o{tag}_rows", f"_g{tag}_rows"]
    return out.drop(*drop)

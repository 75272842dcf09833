"""Two-level (bucketed) content digests — the D157 fold, shared.

A per-group content digest built as ``md5(string_agg(payload))`` holds
every payload of the group in ONE aggregation buffer. Group *count* is
usually bounded (langs, sensor protos), but group *size* is
corpus-scale — at 100 TB a per-lang digest buffers ~one md5 per
document of that language on a single reducer (VERDICT r08 "What's
wrong" #1). The fix, factored here from d157_url_curation
(queries/webcuration.py): fold at TWO levels —

- level 1 groups by (group, md5-bucket-of-payload): each buffer holds
  only ~1/B of a group's payloads, and B scales with the corpus;
- level 2 groups by (group) over <= B bounded sub-digest rows, sorting
  the sub-digests so the result is order-independent.

Bucket membership is a pure function of the payload (portable md5
hash), so the same two-level SQL runs in DuckDB and produces the same
hash — :func:`sql_two_level_digest` is the oracle-side twin.

Digest semantics: the multiset of payloads per group (duplicates
counted, order-free). Callers that need key→content binding bake the
key into the payload (e.g. ``md5(doc_id || '|' || text)``).

NULL symmetry: NULL payloads hash to a NULL bucket and are counted but
never digested (both engines skip NULLs in the fold); a bucket or
group with zero non-null payloads yields a NULL sub-digest/digest in
BOTH engines (the explicit ``when(size=0)`` guard below mirrors
DuckDB's ``md5(string_agg(...)) -> NULL`` on empty input). The level-2
row COUNT and carried sums are coalesced to 0, so a global
(``group_cols=[]``) digest of an EMPTY input returns ``(0, NULL, 0...)``
rather than all-NULL — consumers treat the count as an integer
(ADVICE r09 #3).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .portable import portable_hash_long, sql_hash_long

# Default bucket fan-out: bounds any single aggregation buffer to
# ~1/32 of the hottest group. Raise per-site for hotter groups — the
# level-2 input is <= n_buckets rows per group either way.
DIGEST_BUCKETS = 32
_SEED = "dg|"


def _non_empty_md5(arr) -> F.Column:
    return F.when(F.size(arr) > 0, F.md5(F.concat_ws(",", arr)))


def two_level_digest(
    df: DataFrame,
    group_cols: Sequence[str],
    payload: F.Column,
    *,
    n_buckets: int = DIGEST_BUCKETS,
    count_alias: str = "n_rows",
    digest_alias: str = "digest",
    sum_cols: Mapping[str, str] | None = None,
) -> DataFrame:
    """Fold ``df`` to one row per ``group_cols`` with a row count, the
    two-level multiset digest of ``payload``, and exact sums of
    ``sum_cols`` (``{out_alias: input_col}``) carried through both
    levels. Output ordered by ``group_cols`` (single row when empty).

    Plan shape: one keyed shuffle on (group, bucket), then one tiny
    shuffle on group over <= n_buckets rows per group — both levels
    partial-aggregate map-side."""
    sums = dict(sum_cols or {})
    lvl1_aggs = [
        F.count(F.lit(1)).alias("_n_b"),
        F.array_sort(F.collect_list(payload)).alias("_arr"),
    ] + [F.sum(src).alias(f"_s_{alias}") for alias, src in sums.items()]
    lvl1 = (
        df.withColumn("_bkt", portable_hash_long(payload, _SEED) % n_buckets)
        .groupBy(*group_cols, "_bkt")
        .agg(*lvl1_aggs)
        .select(
            *group_cols,
            F.col("_n_b"),
            _non_empty_md5(F.col("_arr")).alias("_sub"),
            *[F.col(f"_s_{alias}") for alias in sums],
        )
    )
    # coalesce(..., 0): with group_cols=[] and an EMPTY input, level 2
    # aggregates zero level-1 rows and a bare sum() returns NULL — the
    # count of an empty multiset is 0, not NULL (and the carried sums
    # here are always counts in practice). Mirrored in the SQL twin so
    # hashes stay engine-identical.
    lvl2_aggs = [
        F.coalesce(F.sum("_n_b"), F.lit(0)).alias(count_alias),
        F.array_sort(F.collect_list("_sub")).alias("_subs"),
    ] + [
        F.coalesce(F.sum(f"_s_{alias}"), F.lit(0)).alias(alias)
        for alias in sums
    ]
    out = (
        lvl1.groupBy(*group_cols)
        .agg(*lvl2_aggs)
        .select(
            *group_cols,
            F.col(count_alias),
            _non_empty_md5(F.col("_subs")).alias(digest_alias),
            *[F.col(a) for a in sums],
        )
    )
    return out.orderBy(*group_cols) if group_cols else out


def sql_two_level_digest(
    source: str,
    group_cols: Sequence[str],
    payload_expr: str,
    *,
    n_buckets: int = DIGEST_BUCKETS,
    count_alias: str = "n_rows",
    digest_alias: str = "digest",
    sum_exprs: Mapping[str, str] | None = None,
) -> str:
    """DuckDB twin of :func:`two_level_digest`. ``source`` is a table
    name or parenthesized subquery; ``payload_expr``/``sum_exprs`` are
    SQL expressions over it."""
    sums = dict(sum_exprs or {})
    gcols = ", ".join(group_cols)
    g_pre = f"{gcols}, " if group_cols else ""
    lvl2_sums = "".join(
        f", CAST(coalesce(sum(_s_{a}), 0) AS BIGINT) AS {a}" for a in sums
    )
    group1 = f"GROUP BY {g_pre}_bkt" if group_cols else "GROUP BY _bkt"
    group2 = f"GROUP BY {gcols} ORDER BY {gcols}" if group_cols else ""
    return f"""
    WITH _pay AS (
        SELECT {g_pre}{payload_expr} AS _p{"".join(f", {e} AS _in_{a}" for a, e in sums.items())}
        FROM {source}
    ),
    _lvl1 AS (
        SELECT {g_pre}{sql_hash_long("_p", _SEED)} % {n_buckets} AS _bkt,
               count(*) AS _n_b,
               md5(string_agg(_p, ',' ORDER BY _p)) AS _sub
               {"".join(f", sum(_in_{a}) AS _s_{a}" for a in sums)}
        FROM _pay {group1}
    )
    SELECT {g_pre}CAST(coalesce(sum(_n_b), 0) AS BIGINT) AS {count_alias},
           md5(string_agg(_sub, ',' ORDER BY _sub)) AS {digest_alias}
           {lvl2_sums}
    FROM _lvl1 {group2}
    """
